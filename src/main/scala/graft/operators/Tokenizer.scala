package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer induction — distributed BPE training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * The missing pillar of the LLM-data surface: the engine could COUNT
  * tokens under a fixed regex (q29) but not LEARN a subword vocabulary
  * from the corpus. This is the production shape every real trainer
  * (subword-nmt, HuggingFace tokenizers, SentencePiece-BPE) uses:
  *
  *   1. ONE corpus pass builds the word-frequency table — the Zipf
  *      compression that makes tokenizer training tractable at 100 TB
  *      (distinct words ≪ corpus tokens; the merge loop never touches
  *      the corpus again).
  *   2. Each word becomes its character-symbol sequence + an end-of-word
  *      marker (`</w>` — the Sennrich formulation, so "est" as a suffix
  *      and "est" as a word-interior unit stay distinct).
  *   3. N merge rounds: count adjacent symbol pairs weighted by word
  *      frequency (map-side explode + one 2-string-key shuffle over the
  *      VOCAB table, never the corpus), pick the most frequent pair
  *      (count desc, then lexicographic — the deterministic tie-break
  *      both oracle engines replay), fuse every left-to-right
  *      non-overlapping occurrence, repeat.
  *
  * The fuse is a row-local string fold (`aggregate` HOF, string
  * accumulator): symbols re-joined on a unit-separator (U+001F), a merge
  * appends the right symbol WITHOUT the separator — exactly the
  * greedy-left BPE apply ("a a a" + merge (a,a) → ["aa","a"]), and the
  * separator guarantees exact-symbol matching (acc ends with SEP+left ⟺
  * the last SYMBOL is left, since symbols never contain SEP). DuckDB
  * replays the identical fold via list_reduce; the s168 twin spells the
  * loop as one linear window chain (see SqlFrontDoor).
  *
  * Per round the driver collects ONE best-pair row and ONE total-symbols
  * scalar (bounded metric collects, ≤ 2·NMerges rows total) — the same
  * driver-loop shape as real distributed BPE trainers, where the merge
  * decision is inherently sequential but each round is a full-parallel
  * pass over the vocabulary.
  *
  * All arithmetic is integer (counts); output is strings + longs — no
  * float drift anywhere in the lane.
  */
object Tokenizer {

  /** One shape object (the PqShape discipline — r18 verdict #7): merge
    * rounds, the word-length guard (HuggingFace WordPiece ships
    * max_input_chars_per_word for the same reason — one pathological
    * token must not dominate the fold), the symbol separator and the
    * end-of-word marker. */
  val NMerges = 12
  val MaxWordLen = 24
  val Sep = "\u001F"
  val Eow = "</w>"

  /** Word-frequency table with initial symbol decomposition:
    * (word, freq, syms) where syms = chars + Eow. Lowercased, letter-runs
    * only (the corpus pre-tokenizer; digits/punct are their own q29
    * classes and contribute nothing to subword learning on this fixture),
    * length-capped. */
  def wordSymbols(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
          array(lit(Eow))).as("syms"))

  /** Adjacent symbol pairs of one row's syms: array of (a, b) structs.
    * Guarded for fully-fused words (|syms| = 1): Spark's sequence(1, 0)
    * DESCENDS ([1, 0] — not empty), and element_at(syms, 0) throws, so a
    * word reduced to one symbol by earlier merges needs the explicit
    * empty-pairs branch (it still carries vocabulary mass, it just has
    * no adjacency left; DuckDB's half-open range(1, 1) = [] agrees). */
  private def pairsExpr: Column =
    expr("CASE WHEN size(syms) >= 2 THEN transform(sequence(1, size(syms) - 1), " +
      "j -> struct(element_at(syms, j) AS a, element_at(syms, CAST(j + 1 AS INT)) AS b)) " +
      "ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END")

  /** The greedy-left BPE fuse for merge pair (a, b): fold syms into a
    * SEP-joined string where a matched (last == a, current == b) appends
    * b with NO separator. Init = first symbol (syms always ≥ 2: one char
    * + Eow), exactly list_reduce's seeding, so oracle and lane share one
    * semantics. */
  private def fuseExpr(a: String, b: String): Column =
    aggregate(
      expr("slice(syms, 2, size(syms) - 1)"),
      element_at(col("syms"), 1),
      (acc, x) =>
        when(x === lit(b) && (acc === lit(a) || acc.endsWith(lit(Sep + a))),
          concat(acc, x))
          .otherwise(concat(acc, lit(Sep), x)))

  /** Train NMerges BPE merges over a text corpus. Returns the merge table
    * (rank, left, right, merged, pair_count, merges_applied,
    * symbols_after):
    *  - pair_count — the weighted adjacent-pair count that won the round
    *    (counts OVERLAPPING occurrences: "a a a" contributes 2 to (a,a));
    *  - merges_applied — fusions actually performed (non-overlapping:
    *    the same word contributes 1), measured as the drop in total
    *    symbol mass — the audit that the apply really ran;
    *  - symbols_after — Σ freq·|syms| after the round: the corpus token
    *    count under the vocabulary-so-far, i.e. the compression curve a
    *    tokenizer report plots. */
  def bpeTrain(s: SparkSession, docs: DataFrame): DataFrame = {
    val (merges, vocab) = trainWithVocab(s, docs)
    vocab.unpersist(blocking = false)
    merges
  }

  /** Training plus the FINAL vocabulary table (word, freq, syms) under
    * the learned merges — the apply stage's model artifact (returned
    * PERSISTED; the caller owns the unpersist). */
  def trainWithVocab(s: SparkSession, docs: DataFrame): (DataFrame, DataFrame) = {
    import s.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var cur = wordSymbols(docs).persist(lvl)
    // Per-round driver work is ONE collect: the best pair rides the pair
    // aggregation together with the round's TOTAL pair mass (a window over
    // the small pair table), and symbol mass derives from the identity
    //   Σ freq·|syms|  =  Σ pair-mass + Σ freq
    // (each word contributes |syms|-1 adjacent pairs), so the separate
    // mass aggregation per round disappears — 14 jobs instead of 25 for
    // NMerges = 12. The identity doubles as a per-round self-check: round
    // i's observed pair mass must equal the running mass minus W.
    val init = cur.agg(sum(col("freq") * size(col("syms"))).as("mass"),
      sum(col("freq")).as("w")).first()
    val initMass = init.getLong(0)
    val w = init.getLong(1)
    def pairStats(v: DataFrame): Array[org.apache.spark.sql.Row] = v
      .select(col("freq"), explode(pairsExpr).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))
      .withColumn("tot", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy(desc("cnt"), asc("a"), asc("b"))
      .limit(1).collect()
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long)] // rank,a,b,merged,cnt,massBefore
    // release discipline: a round's vocab may only unpersist AFTER its
    // child materialized (the pairStats collect of the FOLLOWING round) —
    // unpersisting before that recomputes the whole lineage back to the
    // corpus scan (caught by the r19 scan audit at documents=14)
    var parent: Option[DataFrame] = None
    for (rank <- 1 to NMerges) {
      val bestRows = pairStats(cur) // materializes cur → its parent is now free
      parent.foreach(_.unpersist(blocking = false))
      parent = Some(cur)
      // the lane contract requires a corpus that sustains NMerges rounds
      // (any real corpus does by decades; the oracle's UNION replay has no
      // spelling for a short merge table, so fail loudly, not shorter)
      require(bestRows.nonEmpty,
        s"BPE pair supply exhausted at round $rank of $NMerges")
      val best = bestRows(0)
      val (a, b, cnt, tot) = (best.getString(0), best.getString(1),
        best.getLong(2), best.getLong(3))
      // massBefore(rank) = observed pair mass + W, by the identity; round
      // 1 checks it against the independent init aggregation (later rounds
      // have no second measurement — that's the whole saving)
      val massBefore = tot + w
      if (rank == 1) require(massBefore == initMass,
        s"BPE mass identity broke: pairs $tot + words $w != initial mass $initMass")
      picked += ((rank.toLong, a, b, a + b, cnt, massBefore))
      val next = cur
        .select(col("word"), col("freq"),
          split(fuseExpr(a, b), java.util.regex.Pattern.quote(Sep)).as("syms"))
        .persist(lvl)
      cur = next
    }
    // masses AFTER each round: rounds 1..N-1 read the following round's
    // observed pair totals; round N pays one closing aggregation
    val observedTots = picked.map(_._6).drop(1) // massBefore(i+1) == massAfter(i)
    val lastTotRows = cur
      .select(col("freq"), explode(pairsExpr).as("p"))
      .agg(coalesce(sum("freq"), lit(0L))).collect()
    parent.foreach(_.unpersist(blocking = false)) // final vocab materialized above
    val lastMass = lastTotRows(0).getLong(0) + w
    val massAfter = observedTots.toSeq :+ lastMass
    val merges = picked.toSeq.zip(massAfter).map {
      case ((rank, a, b, m, cnt, massBefore), after) =>
        (rank, a, b, m, cnt, massBefore - after, after)
    }
    (merges.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count",
      "merges_applied", "symbols_after"), cur)
  }

  /** Q168 — BPE tokenizer training over the documents corpus. */
  def q168BpeTrain(s: SparkSession, dir: String): DataFrame =
    bpeTrain(s, graft.Tables(s, dir, "documents").select(col("text")))

  /** Persist a trained tokenizer as a table artifact — merges (the
    * portable model: rank-ordered pairs any BPE runtime can replay) and
    * the materialized word→symbols vocabulary (the fast path for
    * corpus-internal apply). Strings + longs round-trip parquet
    * bit-exactly, so artifact-served tokenization ≡ inline is an
    * identity, not an approximation — the q157 ANN-artifact discipline
    * applied to the tokenizer model. */
  def writeTokenizer(s: SparkSession, docs: DataFrame, path: String): Unit = {
    val (merges, vocab) = trainWithVocab(s, docs)
    merges.write.mode("overwrite").parquet(path + "/merges")
    vocab.write.mode("overwrite").parquet(path + "/vocab")
    vocab.unpersist(blocking = false)
  }

  /** Load a [[writeTokenizer]] artifact: (merges, vocab). */
  def loadTokenizer(s: SparkSession, path: String): (DataFrame, DataFrame) =
    (s.read.parquet(path + "/merges"), s.read.parquet(path + "/vocab"))

  /** Deterministic per-(process, SF) tokenizer artifact location — the
    * indexPathFor contract (rebuilt every run: the lane grades the round
    * trip; pid-scoped so concurrent harnesses never cross-serve). */
  private[graft] def tokenizerPathFor(dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_bpe_tok_p" + ProcessHandle.current().pid() + "_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")).toString

  /** Q172 — tokenizer-as-artifact round trip: train → WRITE the model →
    * LOAD it back → tokenize the corpus FROM THE LOADED ARTIFACT. Output
    * = exactly q170's (the save/load identity — same columns, same
    * integers), gated on the same computed oracle; the s172 twin replays
    * inline (SQL text cannot run the save side effect — the s157
    * precedent), so lane conformance IS the round-trip proof. This is
    * how a tokenizer actually ships to a 1000-executor job: trained
    * once, persisted, broadcast-loaded by every consumer. */
  def q172BpeArtifactTokenize(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(s, dir, "documents")
    val path = tokenizerPathFor(dir)
    writeTokenizer(s, docs.select(col("text")), path)
    val (_, vocab) = loadTokenizer(s, path)
    tokenizeWith(docs, vocab)
  }

  /** Q170 — tokenize the corpus under the learned vocabulary: the APPLY
    * half (train without apply can't budget a data mixture). Per doc:
    * n_words (whitespace tokens), n_conforming (words the pre-tokenizer
    * admits), bpe_tokens (Σ subword count under the final merge state).
    * ONE corpus re-pass + ONE word-keyed join against the vocab table;
    * membership IS the conformance test (the vocabulary was built from
    * this corpus, so a conforming word always hits and a non-conforming
    * word never can — no second regex pass). At 100 TB the vocab side is
    * the Zipf-bounded model artifact: broadcast it when it fits, else a
    * word-keyed shuffle join. */
  def q170BpeTokenize(s: SparkSession, dir: String): DataFrame =
    bpeTokenize(s, graft.Tables(s, dir, "documents"))

  /** The operator proper, over any (doc_id, text) frame — see [[q170BpeTokenize]]. */
  def bpeTokenize(s: SparkSession, docs: DataFrame): DataFrame = {
    val (_, vocab) = trainWithVocab(s, docs.select(col("text")))
    tokenizeWith(docs, vocab)
  }

  /** The apply tail shared by q170 (inline vocab) and q172 (loaded
    * artifact): one corpus pass left-joined to (word → |syms|). */
  def tokenizeWith(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .join(vocab.select(col("word"), size(col("syms")).cast("long").as("nsym")),
        Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("nsym").isNotNull, 1L).otherwise(0L)).as("n_conforming"),
        coalesce(sum("nsym"), lit(0L)).as("bpe_tokens"))
      .orderBy("doc_id")
}
