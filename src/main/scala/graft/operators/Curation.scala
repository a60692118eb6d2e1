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
  * adds nothing but the stages themselves.
  *
  * Funnel accounting rides `observe()` (CollectMetrics) nodes at each
  * stage boundary, all populated by ONE internal materialization — never
  * a count() per stage. The count-per-stage spelling re-derives the whole
  * upstream chain for every count (k stages → k(k+1)/2 cumulative stage
  * executions): the r5 scale drill measured it at 26.7 s for the sf0.1
  * corpus where the flow itself costs ~5 s — at 100 TB that multiplier is
  * the difference between one pass over the data and eleven. The quota
  * fan-in is persisted across the internal materialization (its subtree
  * appears in both branches of the position self-join, and an observed
  * metric must fire exactly once) and released before returning, so
  * callers inherit no pinned storage.
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
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(String, org.apache.spark.sql.Observation)]
    def stage(name: String, d: DataFrame): DataFrame = {
      val obs = org.apache.spark.sql.Observation() // unique auto-name
      acc += name -> obs
      d.observe(obs, count(lit(1)).as("rows"))
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
    // persist the fan-in: the position self-join below derives BOTH branches
    // from `capped`, and each observed metric must fire exactly once — the
    // cache fill executes the observed chain a single time, the second
    // branch reads blocks
    val capped = stage("quota_capped",
      TextAnalysis.quotaCap(clean, "source", "doc_id", seed, quotaPerSource))
      .persist()
    // The position stage derives its hash from a DISTINCT seed ("<seed>|pos").
    // quotaCap keeps the k smallest md5(seed|id) per source, so survivors of
    // capped sources are concentrated in the low quantile of THAT key; reusing
    // it for the global order would front-load large sources and the final
    // shuffle would not be independent of selection.
    val ordered = capped.join(
      TextAnalysis.deterministicShuffle(capped, "doc_id", seed + "|pos"),
      Seq("doc_id"))
    ordered.count() // the ONE action that populates every stage observation
    val funnel = acc.map { case (name, obs) =>
      StageCount(name, obs.get("rows").asInstanceOf[Long])
    }.toList
    capped.unpersist(blocking = false) // leak-free: callers re-derive lazily
    (ordered, funnel)
  }
}
