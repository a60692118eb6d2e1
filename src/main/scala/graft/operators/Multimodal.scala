package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with a typed metadata struct, per the training-data-pipeline brief.
  *
  * The decode step is a STUB — real codecs (image/audio libs) are absent in
  * this container, so `decodeFeatures` is a deterministic fake standing in
  * for "decode → feature-extract". Everything around it — schema, batch
  * shape, partition-parallel execution, binary slicing — is real Spark
  * plumbing and is what matters at 100 TB: payloads never leave their
  * executor partition, only small feature vectors / metadata shuffle.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata struct to a DataFrame
    * (here synthesized from text bytes; in production this is the raw media
    * column read straight from parquet/lance). */
  def withPayload(d: DataFrame, textCol: String = "text"): DataFrame =
    d.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        lit(1).as("channels")))

  /** STUB decode → fixed-dim feature vector. Deterministic fake: feature j
    * is a hash of the j-th 16-byte chunk of the payload, scaled to [0,1).
    * Swap for a real codec via mapPartitions/Pandas-UDF in production —
    * the signature (binary in, array<double> out, per-row, no shuffle) is
    * the production shape. */
  def decodeFeatures(d: DataFrame, payloadCol: String = "payload", dim: Int = 8): DataFrame = {
    val feats = (0 until dim).map { j =>
      pmod(xxhash64(substring(col(payloadCol), j * 16 + 1, 16), lit(j)), lit(1000))
        .cast("double") / 1000.0
    }
    d.withColumn("features", array(feats: _*))
  }

  /** Batched decode over partitions — the Scala analog of the mapInPandas
    * batch-decode shape: rows stream per partition, the (stub) codec is
    * initialized ONCE per partition (real codecs are expensive to init),
    * and each row's payload decodes to a fixed-dim feature vector. The
    * payload never leaves its executor; only (id, features) flow on.
    *
    * The codec here is a deterministic stub (byte-sum rolling hash per
    * dim-stripe) standing in for an image/audio decoder — the container
    * ships no media libs (build brief: stub the decode, keep the plumbing
    * real). Swap `decodeOne` for a JNI/lib call; nothing else changes. */
  def decodeBatched(d: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "payload", dim: Int = 8): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val idIdx = d.schema.fieldIndex(idCol)
    val pIdx = d.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      d.schema(idCol),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    d.mapPartitions { rows =>
      // per-partition "codec" init happens here (once), not per row; a
      // plain def (not a structural type, whose calls go through
      // reflection) keeps the per-row call a direct invocation
      def decodeOne(bytes: Array[Byte]): Array[Double] = {
        val acc = new Array[Double](dim)
        var i = 0
        while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xff) / 255.0; i += 1 }
        acc
      }
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        Row(row.get(idIdx), decodeOne(bytes))
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: n evenly-spaced fixed-size byte slices of the payload
    * (the video-frame-sample access pattern; binary substring is codegen'd
    * and never copies the full payload off-executor). */
  def frameSample(d: DataFrame, payloadCol: String = "payload",
                  n: Int = 4, frameBytes: Int = 32): DataFrame = {
    val total = octet_length(col(payloadCol))
    // substring with a computed start needs Column-typed substr
    val frameArr = transform(
      sequence(lit(0), lit(n - 1)),
      i => col(payloadCol).substr(
        (i * greatest((total - frameBytes) / math.max(n - 1, 1), lit(1))) + 1,
        lit(frameBytes)))
    d.withColumn("frames", frameArr)
  }

  /** Q38 — multimodal plumbing parity check: payload byte length per doc
    * (binary cast + octet_length exist in both engines → full oracle). */
  def q38MultimodalBytes(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables(s, dir, "documents").filter(col("doc_id") < 100))
      .select(col("doc_id"), col("media_meta.n_bytes").as("n_bytes"))
      .orderBy("doc_id")
}
