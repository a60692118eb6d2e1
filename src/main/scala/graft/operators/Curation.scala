package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the canonical flow a pipeline user
  * runs, composed entirely from this library's oracle-gated operators —
  * the proof that the pieces CHAIN, not just pass their individual gates.
  *
  *   non-empty → quality gate (alpha ratio) → exact dedup (16-byte
  *   fingerprints, min-id keeper) → benchmark decontamination (5-shingle
  *   broadcast semi-join) → per-source quota cap (md5-rank survivors) →
  *   deterministic global shuffle position
  *
  * Every stage is embarrassingly parallel or partial-aggregated (the
  * per-operator scaladocs carry the 100 TB arguments); the composition
  * adds nothing but the stages themselves. Per-stage row accounting is
  * returned so a pipeline run can assert and log its funnel — each
  * stage's count() is one extra action over a lazily re-derived plan,
  * the standard price of audit counts (persist the input once at scale
  * if the re-derivation matters).
  */
object Curation {
  final case class StageCount(stage: String, rows: Long)

  /** @param docs      corpus with (doc_id, source, text) columns
    * @param benchmark frame with (doc_id, text) — the eval sets whose
    *                  5-shingles must not leak into training data
    * @return (curated frame: all input columns + `pos`, the deterministic
    *         1..n training order; per-stage funnel counts) */
  def curate(docs: DataFrame, benchmark: DataFrame,
      minAlphaRatio: Double = 0.45, quotaPerSource: Int = 1000,
      seed: String = "curate"): (DataFrame, Seq[StageCount]) = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[StageCount]
    def stage(name: String, d: DataFrame): DataFrame = {
      acc += StageCount(name, d.count()); d
    }
    val nonEmpty = stage("non_empty",
      docs.filter(col("text").isNotNull && length(trim(col("text"))) > 0))
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      .cast("double") / length(col("text"))
    val quality = stage("quality_gate", nonEmpty.filter(alpha >= minAlphaRatio))
    val deduped = stage("exact_dedup", Dedup.dropExactDuplicates(quality))
    val clean = stage("decontaminated",
      deduped.join(Dedup.contaminatedIds(deduped, benchmark).select("doc_id"),
        Seq("doc_id"), "left_anti"))
    val capped = stage("quota_capped",
      TextAnalysis.quotaCap(clean, "source", "doc_id", seed, quotaPerSource))
    // The position stage derives its hash from a DISTINCT seed ("<seed>|pos").
    // quotaCap keeps the k smallest md5(seed|id) per source, so survivors of
    // capped sources are concentrated in the low quantile of THAT key; reusing
    // it for the global order would front-load large sources and the final
    // shuffle would not be independent of selection.
    val ordered = capped.join(
      TextAnalysis.deterministicShuffle(capped, "doc_id", seed + "|pos"),
      Seq("doc_id"))
    (ordered, acc.toList)
  }
}
