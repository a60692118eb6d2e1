package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines
  * (builder brief + SURVEY §2.3.11): token counting, quality scoring,
  * language ID, document fingerprinting. All are single-pass, codegen'd
  * column expressions over the `documents` table — embarrassingly parallel,
  * no shuffle except the final small aggregation, so they scale linearly
  * with input splits at 100 TB.
  *
  * Everything except the rolling-hash winnowing fingerprint is expressible
  * in both Spark and DuckDB SQL (simple RE2-compatible regexes only), so
  * these carry full hash-compare oracles.
  */
object TextAnalysis {
  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Whitespace token count (long, per doc). trim() first: Spark split()
    * keeps trailing empty tokens while DuckDB string_split_regex does too,
    * but leading/trailing whitespace would differ — trim removes the case. */
  def wsTokens(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val BpeRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_count(text, lit(BpeRegex)).cast("long")

  /** Q29 — token statistics per language. */
  def q29TokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), wsTokens(col("text")).as("ws"), bpeTokens(col("text")).as("bpe"))
      .groupBy("lang")
      .agg(
        sum("ws").as("total_ws"),
        sum("bpe").as("total_bpe"),
        max("ws").as("max_ws"),
        min("ws").as("min_ws"))
      .orderBy("lang")

  /** Q30 — quality scoring: alphabetic-character ratio, stopword ratio,
    * average length. The standard cheap quality filters for LLM corpora
    * (length / punctuation / stopword heuristics). */
  def q30TextQuality(s: SparkSession, dir: String): DataFrame = {
    val text = col("text")
    val alphaRatio =
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text)
    val stopRatio =
      regexp_count(text, lit("\\b(the|a|of|and|to)\\b")).cast("double") / wsTokens(text)
    docs(s, dir)
      .select(col("lang"), alphaRatio.as("ar"), stopRatio.as("sr"), length(text).cast("long").as("len"))
      .groupBy("lang")
      .agg(
        round(avg("ar"), 4).as("alpha_ratio"),
        round(avg("sr"), 4).as("stopword_ratio"),
        round(avg("len"), 2).as("avg_len"))
      .orderBy("lang")
  }

  /** Language-ID marker sets (word-boundary stopword hits). Only languages
    * with ASCII markers are predictable; ties resolve by the fixed priority
    * en > de > es > fr — both engines evaluate the identical CASE chain. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|of|and|to|in)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "es" -> "\\b(el|la|los|que|a)\\b",
    "fr" -> "\\b(le|les|et|des|du)\\b")

  /** Q31 — n-gram/stopword-heuristic language ID, aggregated to a predicted-
    * language histogram. */
  def q31LangId(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir).select(
      (col("doc_id") +: LangMarkers.map { case (l, p) =>
        regexp_count(col("text"), lit(p)).cast("long").as(s"s_$l")
      }): _*)
    val pred = scored.withColumn(
      "pred_lang",
      when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr"))
    pred.groupBy("pred_lang").agg(count(lit(1)).as("n")).orderBy("pred_lang")
  }

  /** Q32 — whole-document fingerprint: md5 of whitespace-normalized,
    * lowercased text. The exact-dedup key for near-identical layout noise. */
  def q32FingerprintMd5(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
      .orderBy("doc_id")

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): k-gram rolling
    * hashes, minimum per sliding window — the classic local fingerprint for
    * near-dup/plagiarism detection. Hash = xxhash64 over word k-grams
    * (engine-internal; no cross-engine oracle — FIXTURES §C quarantines
    * hash functions), so Q40 gets the rows-only check.
    *
    * Single pass, no shuffle until the final per-doc count: scales linearly.
    *
    * The gram array is materialized in its own projection: referencing a
    * transform-built array from inside another transform lambda makes
    * CollapseProject inline it, recomputing the whole O(n) gram array per
    * window position — O(n²)/document (measured 16 s vs 2 s at sf0.1). Two
    * projections with a multiply-referenced expensive alias stay separate. */
  def winnowFingerprints(d: DataFrame, k: Int = 4, window: Int = 4): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    // k-gram rolling hashes by index: h_i = xxhash64(words[i..i+k-1])
    val grams = transform(
      sequence(lit(0), greatest(size(words) - k, lit(0))),
      i => xxhash64(concat_ws(" ", slice(words, i + 1, lit(k)))))
    // winnow: minimum hash of each `window`-sized sliding window, dedup'd
    val g = col("grams")
    val mins = array_distinct(transform(
      sequence(lit(0), greatest(size(g) - window, lit(0))),
      i => array_min(slice(g, i + 1, lit(window)))))
    // k+window-1 words = k+window-1-(k-1) = window grams = one full window
    d.filter(size(words) >= k + window - 1)
      .select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"), mins.as("fingerprints"))
  }

  /** Q40 — winnowing fingerprint summary (rows-only check). */
  def q40WinnowFingerprint(s: SparkSession, dir: String): DataFrame =
    winnowFingerprints(docs(s, dir).filter(col("doc_id") < 100))
      .select(col("doc_id"), size(col("fingerprints")).cast("long").as("n_fp"))
      .orderBy("doc_id")
}
