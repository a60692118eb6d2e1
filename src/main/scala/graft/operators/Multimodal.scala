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
    * and never copies the full payload off-executor). Stride arithmetic is
    * ALL-INTEGER (`div`, clamped to ≥1) so the sampled offsets replay
    * exactly in the DuckDB oracle — the old `/` spelling produced a double
    * stride whose positions no integer SQL could reproduce. */
  def frameSample(d: DataFrame, payloadCol: String = "payload",
                  n: Int = 4, frameBytes: Int = 32): DataFrame = {
    val stride = greatest(
      expr(s"(octet_length($payloadCol) - $frameBytes) div ${math.max(n - 1, 1)}"),
      lit(1))
    // substring with a computed start needs Column-typed substr
    val frameArr = transform(
      sequence(lit(0), lit(n - 1)),
      i => col(payloadCol).substr(i * stride + 1, lit(frameBytes)))
    d.withColumn("frames", frameArr)
  }

  /** Q38 — multimodal plumbing parity check: payload byte length per doc
    * (binary cast + octet_length exist in both engines → full oracle). */
  def q38MultimodalBytes(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables(s, dir, "documents"))
      .select(col("doc_id"), col("media_meta.n_bytes").as("n_bytes"))
      .orderBy("doc_id")

  /** Q146 — binary-payload exact dedup with keeper selection: md5 over the
    * payload BYTES (not the text column — the q28 contract re-expressed on
    * the opaque-binary plumbing), grouped per (source, fingerprint), keeper
    * = min doc_id, then per-source accounting of unique payloads / dropped
    * copies / retained bytes. The DuckDB oracle replays md5 over the same
    * bytes because the documents fixture is pure ASCII (octet_length ==
    * length at every SF — verified r13; a regen that adds multi-byte text
    * flips q38 first).
    *
    * Scale (the pillar's core property, plan-pinned in MultimodalSpec):
    * the 16-byte fingerprint and the byte COUNT are computed map-side and
    * ONLY THEY cross the exchange — the payload itself never shuffles. At
    * 100 TB of media that is the difference between shuffling 100 TB and
    * shuffling ~|docs|·24 bytes. */
  def q146PayloadDedup(s: SparkSession, dir: String): DataFrame = {
    val p = withPayload(Tables(s, dir, "documents").filter(col("text").isNotNull))
    val fp = p.select(col("source"), col("doc_id"),
      md5(col("payload")).as("fp"), col("media_meta.n_bytes").as("nb"))
    val g = fp.groupBy("source", "fp")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"), min("nb").as("nb"))
    g.groupBy("source")
      .agg(count(lit(1)).as("n_unique"),
        sum("copies").cast("long").as("n_total"),
        (sum("copies") - count(lit(1))).cast("long").as("n_dupes"),
        sum("nb").cast("long").as("bytes_unique"),
        sum("keeper").cast("long").as("keeper_sum"))
      .orderBy("source")
  }

  /** Q147 — frame-sample fingerprinting: [[frameSample]]'s 4 evenly-spaced
    * 32-byte slices per payload, each fingerprinted with md5 — the
    * video-keyframe dedup access pattern (sample frames, hash frames,
    * never move the video). Offsets are all-integer so the oracle replays
    * them; ASCII fixture ⇒ DuckDB's varchar substring/md5 sees the same
    * bytes as Spark's binary substr.
    *
    * Scale: slicing and hashing are codegen'd map-side projections; the
    * only shuffled rows are (doc_id, frame_idx, md5-hex, len) — the
    * payload stays columnar in the scan and is pruned before the sort
    * exchange (plan-pinned). */
  def q147FrameFingerprints(s: SparkSession, dir: String): DataFrame = {
    val p = withPayload(Tables(s, dir, "documents").filter(col("text").isNotNull))
    frameSample(p, n = 4, frameBytes = 32)
      .select(col("doc_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame")).as("frame_md5"),
        octet_length(col("frame")).cast("long").as("frame_len"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Q149 — the BATCHED DECODE PATH as a gated lane: [[decodeBatched]]'s
    * mapPartitions stub (per-partition codec init, binary in → fixed-dim
    * features out) is the production shape for real media codecs, and
    * through r12 it was only spec-tested. Its byte-sum stub is a
    * deterministic left fold per dim-stripe — replayable: DuckDB folds the
    * same byte sequence with an ordered list_reduce (ASCII fixture ⇒
    * unicode(char) IS the byte), the Spark SQL twin with an ordered
    * `aggregate` HOF, all three bit-identical before the ROUND(·,4).
    *
    * Scale: the decode is map-side per partition (codec init amortized
    * over the partition, payload never shuffles); only (doc_id, dim,
    * rounded feature) rows reach the sort. */
  def q149DecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val p = withPayload(Tables(s, dir, "documents")
      .filter(col("text").isNotNull && length(col("text")) > 0))
    decodeBatched(p, dim = 8)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "v")))
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        round(col("v"), 4).as("v"))
      .orderBy("doc_id", "dim")
  }

  /** Q148 — modality-mix accounting: each doc carries a deterministic mime
    * tag (doc_id mod 4 over a 4-entry modality table — the fixture has no
    * real media types; the JOIN SHAPE is what this lane gates), and the
    * lane folds media_meta byte totals into the q130-family source-mixing
    * view: per (source, mime) doc/byte counts, the mime's byte share
    * within its source, and the source's byte-weighted mixing share of the
    * whole corpus — the table a training-mix planner reads to balance
    * modalities per source. Integer ppm spellings → hash-exact.
    *
    * Scale: one corpus pass folds to |sources|×|mimes| rows; both shares
    * are windows over that metadata-sized frame. */
  def q148ModalityMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mimes = array(lit("image/png"), lit("audio/wav"), lit("video/mp4"), lit("text/plain"))
    val p = withPayload(Tables(s, dir, "documents").filter(col("text").isNotNull))
      .withColumn("mime", element_at(mimes, (pmod(col("doc_id"), lit(4)) + 1).cast("int")))
    val g = p.groupBy("source", "mime")
      .agg(count(lit(1)).as("n_docs"), sum(col("media_meta.n_bytes")).as("bytes"))
    // corpus-total window keyed on a CONSTANT, not an empty partition spec:
    // same one-partition plan over the ~|sources|×|mimes| metadata frame,
    // but without the per-run "WindowExec: No Partition Defined" stderr
    // flood (r13 verdict #5 — the flood nearly displaced the bench summary
    // line). The key must be NON-FOLDABLE — a plain lit(0) is constant-
    // folded back to an empty spec; pmod(src_bytes, 1) is 0 on every row
    // but survives the optimizer (integer pmod by a literal is not a
    // foldable-elimination target). The ppm numerators run in
    // DECIMAL(38,0): BIGINT bytes*10⁶ silently wraps past ~9.2 TB of
    // payload per source (ANSI off), exactly the 100 TB regime this lane
    // advertises, while the DuckDB oracle computes HUGEINT (r13 ADVICE #1).
    g.withColumn("src_bytes", sum("bytes").over(Window.partitionBy("source")))
      .withColumn("all_bytes",
        sum("bytes").over(Window.partitionBy(pmod(col("src_bytes"), lit(1)))))
      .select(col("source"), col("mime"), col("n_docs"),
        col("bytes").cast("long").as("total_bytes"),
        expr("CAST(bytes AS DECIMAL(38,0)) * 1000000 div src_bytes").as("share_ppm"),
        expr("CAST(src_bytes AS DECIMAL(38,0)) * 1000000 div all_bytes").as("src_weight_ppm"))
      .orderBy("source", "mime")
  }

  /** Bucket cap for [[q150FrameNeardup]]'s (frame_idx, fingerprint) bands —
    * the q34 discipline: a degenerate fingerprint shared by B payloads
    * costs B²/2 candidate pairs; the cap bounds any one bucket's
    * contribution and is interpolated into both SQL twins. */
  val FrameBucketCap = 100

  /** Q150 — frame-fingerprint near-dup CLUSTERS: the multimodal pillar
    * composed with the dedup stack (r13 verdict #6). Four HEAD-anchored
    * 32-byte frames per payload (fixed offsets k·32 — the thumbnail /
    * first-seconds keyframe access pattern; payloads under the 128-byte
    * sampled span are out of contract, like a video shorter than its
    * sample window) become q34-style bands — band key = (frame_idx,
    * frame_md5), bucket-capped — candidate pairs must then share ≥2 of the
    * 4 frames to confirm, and confirmed pairs collapse to keeper clusters
    * by min-label. Head-anchoring is deliberate twice over: (a) the
    * fixture's near-dup families share PREFIXES, not lengths, so q147's
    * length-dependent even-spacing would land family members' frames 1–3
    * at different offsets and confirm nothing; (b) equal-head-bytes is an
    * EQUIVALENCE relation, so confirmed families are cliques and ONE
    * min-label round is the exact component labeling (chain-shaped
    * families need q79's pointer jumping — documented contract).
    *
    * Scale: the payload never shuffles — 4 slices are hashed map-side and
    * only (doc_id, frame_idx, 16-byte md5) rows band; buckets are capped so
    * the self-join is never all-pairs; clustering runs on confirmed PAIRS
    * (≈ |dup families|), not the corpus. */
  def q150FrameNeardup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = withPayload(Tables(s, dir, "documents")
      .filter(col("text").isNotNull && octet_length(col("text").cast("binary")) >= 128))
    val fr = p.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(3)),
          k => col("payload").substr(k * 32 + 1, lit(32)))).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx"), md5(col("frame")).as("fp"))
    val capped = fr
      .withColumn("bn", count(lit(1)).over(Window.partitionBy("frame_idx", "fp")))
      .filter(col("bn") <= lit(FrameBucketCap))
      .select("doc_id", "frame_idx", "fp")
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.frame_idx") === col("b.frame_idx") && col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
    val labeled = pairs.select(col("id1").as("doc_id"), col("id2").as("nb"))
      .unionAll(pairs.select(col("id2").as("doc_id"), col("id1").as("nb")))
      .groupBy("doc_id").agg(min("nb").as("mn"))
      .select(col("doc_id"), least(col("doc_id"), col("mn")).as("cluster"))
    labeled.groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n_members"),
        sum("doc_id").cast("long").as("id_sum"))
      .orderBy("cluster")
  }

  /** Q151 — batched decode composed with the IVF assignment kernel (r13
    * verdict #6): [[decodeBatched]]'s per-partition-codec features feed the
    * SAME fused argmax-cosine Expression the ANN stack assigns with
    * ([[graft.functions.BestCentroid]] — strict `>` over a cent_id-sorted
    * broadcast table, lowest id wins exact ties). Centroids are the decoded
    * features of a FIXED-BUDGET stride sample — sampled-seed "training"
    * exactly like Similarity.ivfCentroids' stride seeding — and CRUCIALLY
    * filtered BEFORE the decode (mapPartitions blocks filter pushdown, so
    * a post-decode filter would decode the whole corpus to keep 1% of it).
    *
    * r15 (r14 verdict #3 — the `doc_id < 400` cap made this a fixed-size
    * demo): the lane now decodes and assigns the ENTIRE non-empty corpus,
    * and the centroid stride is derived from the corpus itself —
    * `max(1, (max_id+1) div 64)` — so the centroid COUNT stays ≈64 at
    * every SF instead of growing as |corpus|/100. That keeps assignment
    * cost N×C LINEAR in the corpus (fixed C is the real IVF shape: k is a
    * model hyperparameter, not a data fraction); a stride-100 sample at
    * 100 TB would make C grow with N and the N×C kernel quadratic. The
    * stride derivation is one column-pruned doc_id-only agg scan (1-row
    * result, broadcast-cross-joined into the centroid filter — the same
    * construction-free scalar-subquery shape q123 pins), documented as
    * q151's third documents read in scan_budgets.json.
    *
    * Oracle: the stub codec's folds are bit-replayable (q149), the kernel
    * accumulates dot/norms in index order, and SQL `a + b + c` parses
    * left-associative — so DuckDB re-derives the stride, features,
    * centroids, and every cosine bit-identically and the argmax replays
    * with zero tolerance (the q48 discipline on decoded media features).
    *
    * Scale: decode is map-side per partition; only (doc_id, 8 doubles)
    * rows exist past it; the centroid table broadcasts as ONE collected
    * row; assignment is a single narrow codegen pass — no N×C join rows.
    * Drill-gated since r15 as a text-volume lane (decode cost is
    * byte-proportional, so the 10× documents copy's >10× byte volume is
    * the honest denominator). */
  def q151DecodeIvf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .filter(col("text").isNotNull && length(col("text")) > 0)
    val f = decodeBatched(withPayload(docs), dim = 8)
    val stride = docs.agg(
      expr("greatest((max(doc_id) + 1) div 64, 1)").as("stride"))
    val cents = decodeBatched(
        withPayload(docs.crossJoin(broadcast(stride))
          .filter(pmod(col("doc_id"), col("stride")) === 0).drop("stride")), dim = 8)
      .select(col("doc_id").as("cent_id"), col("features").as("centv"))
    val centArr = cents.agg(
      array_sort(collect_list(struct(col("cent_id"), col("centv")))).as("cents"))
    f.crossJoin(broadcast(centArr))
      .select(col("doc_id"),
        graft.functions.VectorOps.bestCentroid(col("features"), col("cents")).as("cluster"))
      .orderBy("doc_id")
  }
}
