package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing: payload attachment, batched stub decode (schema,
  * determinism, partition-parallel shape), frame sampling geometry. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"
  var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs() =
    Multimodal.withPayload(Tables(spark, sfDir, "documents").filter(col("doc_id") < 50))

  test("decodeBatched: fixed-dim features, deterministic, schema as declared") {
    val out = Multimodal.decodeBatched(docs(), dim = 8)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "features"))
    val a = out.orderBy("doc_id").collect()
    val b = Multimodal.decodeBatched(docs(), dim = 8).orderBy("doc_id").collect()
    assert(a.length == 50)
    a.zip(b).foreach { case (x, y) => assert(x == y) } // deterministic
    a.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length == 8)
      assert(f.forall(_ >= 0.0))
    }
  }

  test("decodeBatched features vary with content (stub is not constant)") {
    val feats = Multimodal.decodeBatched(docs(), dim = 8)
      .collect().map(_.getSeq[Double](1))
    assert(feats.distinct.length > 1)
  }

  test("frameSample: n frames of the requested size from within the payload") {
    val out = Multimodal.frameSample(docs(), n = 4, frameBytes = 16)
      .select(col("doc_id"), col("frames"), octet_length(col("payload")).as("len"))
      .collect()
    out.foreach { r =>
      val frames = r.getSeq[Array[Byte]](1)
      assert(frames.length == 4)
      if (r.getInt(2) >= 64) frames.foreach(f => assert(f.length == 16))
    }
  }

  test("q146/q147/q148: the payload NEVER crosses an exchange (executed plan)") {
    // the pillar's scale property (r12 verdict #1): fingerprints and
    // metadata shuffle, the opaque binary stays on its executor — at
    // 100 TB of media the difference between shuffling hashes and
    // shuffling the corpus. Walk every exchange in the EXECUTED plan and
    // assert no shuffled attribute is binary-typed.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.BinaryType
    for (name <- Seq("q146_payload_dedup", "q147_frame_fingerprints", "q148_modality_mix",
        "q149_decode_features")) {
      val qe = SparkEntry.baseQueries(name)(spark, sfDir).queryExecution
      qe.toRdd.foreach(_ => ())
      val exchanges = ScanAudit.walk(qe.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, s"$name: expected at least one exchange (agg/sort)")
      exchanges.foreach { e =>
        val binCols = e.output.filter(_.dataType == BinaryType).map(_.name)
        assert(binCols.isEmpty,
          s"$name: binary payload columns $binCols crossed an exchange:\n$e")
      }
    }
  }
}
