package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The ≥10× synthetic scale drill, exercised at spec scale (sf0.001 × 4):
  * materialization invariants (row counts, preserved dup structure) and the
  * no-hidden-quadratic contract on the expensive-query set. Bench runs the
  * full 10× version at sf0.1 and records the ratios in bench_detail.json. */
class ScaleDrillSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"
  val factor = 4
  var spark: SparkSession = _
  var outDir: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    outDir = java.nio.file.Files.createTempDirectory("graftdrill").toString
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("materialize: linear row counts, scale-invariant dup structure, distinct vectors") {
    ScaleDrill.materialize(spark, sfDir, outDir, factor)
    for (t <- Seq("documents", "embeddings", "orders", "lineitem", "events")) {
      val base = Tables(spark, sfDir, t).count()
      val big = spark.read.parquet(s"$outDir/$t.parquet").count()
      assert(big == base * factor, s"$t: $base × $factor != $big")
    }
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count(), "doc ids must stay unique")
    // dup structure is scale-INVARIANT: exact-dup group sizes replicate,
    // they don't merge across copies (the copy token breaks cross-copy text)
    val baseGroups = Tables(spark, sfDir, "documents").filter(col("text").isNotNull)
      .groupBy(md5(col("text"))).count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bigGroups = docs.filter(col("text").isNotNull)
      .groupBy(md5(col("text"))).count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bigGroups == baseGroups.map { case (sz, n) => sz -> n * factor },
      s"dup-group histogram distorted: base=$baseGroups scaled=$bigGroups")
    // embeddings: no two copies cosine-identical (perturbed per copy/dim)
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    assert(emb.select("embedding").distinct().count() == emb.count(),
      "replicated vectors must be perturbed, not byte-identical")
  }

  test("expensive-query runtimes stay ~linear under the scale-up (no hidden quadratic)") {
    val rows = ScaleDrill.run(spark, sfDir, outDir, factor)
    assert(rows.map(_._1).toSet ==
      (ScaleDrill.drillQueries :+ "curation_flow").toSet)
    rows.foreach { case (name, base, big) =>
      val ratio = big / math.max(base, 1e-9)
      info(f"$name: base=$base%.2f s  x$factor=$big%.2f s  ratio=$ratio%.2f")
      // this in-suite assert only catches the QUADRATIC signature (~factor²
      // = 16 here): wall-clock ratios between two timed runs on a noisy
      // shared machine swing with contention even interleaved best-of-two
      // (r5 advice — a tight bound here is a flaky suite). The tight gate
      // (ratio > factor = recorded failure) lives in the bench lane, where
      // the noise policy and the recorded artifact are.
      assert(ratio < factor.toDouble * factor,
        s"$name shows a quadratic signature: $base s -> $big s (ratio $ratio at factor $factor)")
    }
  }
}
