package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps

/** Deduplication operators for training-data pipelines: exact (hash-key),
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant avoids the quadratic all-pairs
  * comparison except inside LSH buckets (MinHash) or an explicit bounded
  * subset (the oracle-checked Jaccard/cosine demos). Signatures are computed
  * in one map-side pass with partial aggregation; the only shuffles are the
  * per-key groupBys on doc_id / band signature.
  */
object Dedup {
  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  // ---------------------------------------------------------------- exact

  /** 16-byte binary content fingerprint: unhex(md5(text)). Half the shuffle
    * key width of md5's 32-char hex string — at 100 TB the dedup exchanges
    * carry fingerprints, so key bytes ARE the shuffle. NULL text → NULL
    * fingerprint (both engines skip NULLs in COUNT DISTINCT). */
  def contentFp(text: Column): Column = unhex(md5(text))

  /** Q28 — exact dedup by content hash, counted per source. md5 is identical
    * in Spark and DuckDB so this carries a full oracle (distinct CARDINALITY
    * is emitted, not the key bytes, so the binary-vs-hex representation
    * stays engine-internal). */
  def q28DedupMd5(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("source")
      .agg(
        countDistinct(contentFp(col("text"))).as("n_unique"),
        count(lit(1)).as("n_total"))
      .orderBy("source")

  /** Library form: keep one row per exact-content key (lowest doc_id wins —
    * deterministic, unlike dropDuplicates' partition-order "first").
    *
    * Shuffle discipline for 100 TB: dropDuplicates("__fp") would shuffle
    * ENTIRE rows (the document text) to group by fingerprint. Here only
    * (16-byte binary md5, id) pairs shuffle to elect keepers; the full rows
    * then arrive via a semi-join on id — broadcast when the keeper set is
    * small enough, never carrying text through an exchange twice. */
  def dropExactDuplicates(d: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val withFp = d.withColumn("__fp", contentFp(col(textCol)))
    // keeper = (fingerprint, min id): matching on BOTH keeps exactly one row
    // per content even when one id carries several contents. Precondition:
    // idCol is unique per row (the tables' primary-key contract) — two fully
    // identical (id, text) rows would both match their keeper pair.
    val keepers = withFp.select(col("__fp"), col(idCol))
      .groupBy("__fp").agg(min(col(idCol)).as(idCol))
    withFp.join(keepers, Seq("__fp", idCol), "left_semi").drop("__fp")
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** The ONE tokenizer every word-level dedup op shares: whitespace split
    * of trimmed text. Callers that pre-materialize `wordsOf` once (the
    * curation ladder's persisted narrow projection, r16 verdict #5) feed
    * the `...FromWords` variants below and tokenize the corpus exactly
    * once instead of once per stage. */
  private[graft] def wordsOf(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word set per doc, exploded (doc_id, word). */
  private def wordSets(d: DataFrame): DataFrame =
    wordSetsFromWords(d.select(col("doc_id"), wordsOf(col("text")).as("words")))

  /** [[wordSets]] over a pre-tokenized (doc_id, words) frame. */
  private[graft] def wordSetsFromWords(dw: DataFrame): DataFrame =
    dw.select(col("doc_id"), explode(array_distinct(col("words"))).as("word"))

  /** All-pairs exact Jaccard from a distinct (doc_id, word) token table —
    * the verification kernel LSH candidates feed at scale. inter/union are
    * exact integer ratios → identical doubles in both engines. */
  private def jaccardFromTokens(tokens: DataFrame): DataFrame = {
    // no .cache(): a pinned exploded-token set would leak executor storage
    // for the session lifetime (Bench runs each query twice per process);
    // the token scan is cheap relative to the pair join it feeds
    val d = tokens
    val sizes = d.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = d.as("a")
      .join(d.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id1") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id2") === col("sb.doc_id"))
      .select(col("id1"), col("id2"),
        round(col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")), 4).as("jaccard"))
      .orderBy("id1", "id2")
  }

  /** Q33 — word-set Jaccard for all pairs in a bounded subset (doc_id < 40).
    *
    * Why the bound stays (r9 analysis, unlike q121's lifted cap): the
    * fixture corpus draws from a 31-word vocabulary, so document-frequency
    * pruning cannot separate candidates — at sf0.1 every word appears in up
    * to 3923 of 5000 docs, Σdf² ≈ 448M (≈ the complete pair graph), and a
    * df ≤ 100 index keeps ZERO pairs. When the similarity graph is dense,
    * exact set-Jaccard is all-pairs BY NATURE; no blocking key exists in
    * word space. The scale path is feature-space change, not a cap lift:
    * q50's MinHash runs on 3-word shingles whose vocabulary is large enough
    * to band, and q53's char n-grams likewise. The bound keeps the exact
    * oracle over a subset where all-pairs is honest. */
  def q33JaccardPairs(s: SparkSession, dir: String): DataFrame =
    jaccardFromTokens(wordSets(docs(s, dir).filter(col("doc_id") < 40)))

  /** Distinct character n-gram set per doc: (doc_id, word=gram). The text
    * column is carried into the projection BEFORE the position explode so
    * substring reads a bound attribute (same CollapseProject discipline as
    * minhashSignatures — no re-derivation per position). */
  private def charNgrams(d: DataFrame, n: Int = 3): DataFrame =
    d.filter(length(col("text")) >= n) // sequence(1, len-(n-1)) must ascend:
      // Spark sequence DESCENDS when start > stop, minting bogus grams for
      // short texts where the DuckDB oracle's end-exclusive range() is empty
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (n - 1))).as("i"))
      .select(col("doc_id"), expr(s"substring(text, i, $n)").as("word"))
      .distinct()

  /** Q34b/Q53 — character 3-gram Jaccard (the classic near-dup feature set,
    * robust to word-boundary noise) over a bounded subset; full oracle —
    * substr-by-position is portable SQL.
    *
    * Why the bound stays (the q33 contract): exact set-Jaccard scored via a
    * shared-token equi-join is all-pairs whenever the feature graph is
    * dense, and the fixture's 31-word vocabulary makes the char-3-gram
    * space dense the same way q33's word space is. This lane is the
    * bounded EXACT-ORACLE audit of the feature; the uncapped scale path is
    * q50's banded MinHash over 3-word shingles (large, bandable vocabulary)
    * — the same route q33's scaladoc names. */
  def q53CharNgramJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardFromTokens(charNgrams(docs(s, dir).filter(col("doc_id") < 20)))

  // --------------------------------------------------------- MinHash+LSH

  val MinHashK = 16      // signature length
  val BandRows = 4       // rows per band → 4 bands
  val ShingleWords = 3

  // ------------------------- replayable universal-hash family (r10 #3)
  //
  // Through r10 the minhash / simhash / winnowing lanes ran on Spark's
  // xxhash64 — engine-internal (DuckDB cannot replay XXH64's overflowing
  // 64-bit multiplies in SQL), so those lanes were gated by golden-VALUES
  // snapshots of the engine's own output. This family replaces xxhash64
  // with textbook Carter–Wegman universal hashing over p = 2³¹ − 1:
  //
  //   x(s)   = (javaStringHash(s) as unsigned 32-bit) mod p
  //   g_i(x) = (a_i · x + b_i) mod p,  a_i ∈ [1, p), b_i ∈ [0, p)
  //
  // Every step is BIGINT-safe in both engines (a·x < 2⁶²) and the string
  // fold is the q25-proven DuckDB replay (list_reduce of (31h + code) mod
  // 2³²), so the former golden lanes get INDEPENDENT computed oracles.
  // Statistically this is the original minwise construction (Broder 1997,
  // "On the resemblance and containment of documents"): pairwise-
  // independent g_i is exactly what the MinHash estimator needs, and the
  // per-pair spurious-collision probability ~|shingles|/p ≈ 10⁻⁵ at 10⁴
  // shingles/doc is far below the estimator's 1/√K sampling noise.
  //
  // The (a_i, b_i) constants are TABULATED once from a fixed SplitMix64
  // finalizer at class load; the DuckDB oracles interpolate the tabulated
  // VALUES (single source of truth — the two engines share literals, not
  // a reimplementation of the formula).
  val MinhashP = 2147483647L // p = 2³¹ − 1, Mersenne prime
  private val PackBase = 2147483648L // 2³¹ — lossless band-sig packing base

  private def mixConst(i: Long): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private[graft] def hashConstA(seed: Long): Long =
    Math.floorMod(mixConst(seed), MinhashP - 1) + 1
  private[graft] def hashConstB(seed: Long): Long =
    Math.floorMod(mixConst(seed + 1000003L), MinhashP)
  val minhashA: IndexedSeq[Long] = (0 until MinHashK).map(i => hashConstA(i.toLong))
  val minhashB: IndexedSeq[Long] = (0 until MinHashK).map(i => hashConstB(i.toLong))
  val simhashA: IndexedSeq[Long] = (0 until 64).map(i => hashConstA(100L + i))
  val simhashB: IndexedSeq[Long] = (0 until 64).map(i => hashConstB(100L + i))
  val WinnowA: Long = hashConstA(500L)
  val WinnowB: Long = hashConstB(500L)

  /** x(s): the base string hash of the family — javaStringHash folded to
    * [0, p). Unsigned reinterpretation (& 0xFFFFFFFF) makes the Spark value
    * equal the DuckDB fold's mod-2³² result without a sign branch. */
  def replayableStringHash(c: Column): Column = {
    import graft.functions.JavaStringHash.java_string_hash
    java_string_hash(c).cast("long").bitwiseAND(lit(0xFFFFFFFFL)) % MinhashP
  }

  /** g_i(x) column spelling — shared by minhash/simhash so the oracle
    * generator and the operators can never drift. */
  def universalMix(x: Column, a: Long, b: Long): Column =
    (lit(a) * x + lit(b)) % MinhashP

  /** Word k-shingles from an already-materialized words ARRAY column
    * (space-joined k-grams; k=2 gives bigrams — TextAnalysis reuses it so
    * there is exactly one n-gram builder).
    * Taking the array (not the raw text) matters: a split() expression
    * referenced from inside the transform lambda gets inlined by
    * CollapseProject and re-splits the whole document per shingle position —
    * O(n²)/document (same trap as TextAnalysis.winnowFingerprints). */
  def shingles(words: Column, k: Int = ShingleWords): Column =
    // r16: one compiled pass per document ([[graft.functions.ShingleStrings]])
    // instead of an interpreted transform lambda per shingle — same strings
    // (ShingleKernelSpec pins parity vs the HOF spelling below), every
    // consumer (decon, bigrams, contamination, curation) inherits the win
    graft.functions.ShingleStrings.shingleStrings(words, k)

  /** The pre-r16 HOF spelling of [[shingles]] — kept as the independent
    * reference implementation the kernel-parity spec compares against. */
  private[graft] def shinglesHof(words: Column, k: Int = ShingleWords): Column =
    transform(
      sequence(lit(0), size(words) - k),
      i => concat_ws(" ", slice(words, i + 1, lit(k))))

  /** MinHash signatures: one pass, MinHashK min-hash aggregates — partial
    * aggregation means only (doc_id, 16 longs) shuffle, never the shingles.
    * Hash family: the shingle STRING is base-hashed once ([[replayableStringHash]]),
    * then each of the K functions is a two-op universal mix (a_i·x + b_i) mod
    * p — hashing the variable-length string K times would cost K× the bytes
    * for the same family quality. Replayable end-to-end in DuckDB (the q34
    * computed oracle), unlike the pre-r11 xxhash64 family.
    *
    * @note the input's `doc_id` MUST be unique (r16 ADVICE #3): since the
    *       r16 fused kernel this is one-output-row-per-INPUT-row (the old
    *       groupBy(doc_id) shape merged duplicate ids). A caller passing a
    *       pre-dedup frame with repeated ids gets duplicate signature rows
    *       that inflate [[lshBands]] buckets and [[confirmedNearDups]]
    *       candidate pairs — dedup ids first (every in-tree caller reads
    *       the documents table, whose doc_id is unique). */
  def minhashSignatures(d: DataFrame): DataFrame = {
    // r16: the shingle-build + hash + 16-way min pipeline runs as ONE fused
    // native kernel per document ([[graft.functions.MinhashSig]]) — the
    // WinnowFingerprints lesson applied to the dedup family's hottest path.
    // The legacy spelling (kept below for the parity spec) built every
    // shingle string inside an interpreted transform lambda and exploded
    // ~52 rows/doc through partial MIN aggregates; the kernel emits the 16
    // mins directly, bit-identical (MinhashKernelSpec), zero exploded rows,
    // zero aggregation — per-doc map work, embarrassingly parallel.
    // Contract note: one output row per input row (callers read the
    // documents table, whose doc_id is unique — the old groupBy shape would
    // have merged duplicate ids, a case no caller has).
    minhashSignaturesFromWords(
      d.select(col("doc_id"), wordsOf(col("text")).as("words")))
  }

  /** [[minhashSignatures]] over a pre-tokenized (doc_id, words) frame —
    * same kernel, same filter, same one-row-per-input-row contract. */
  def minhashSignaturesFromWords(dw: DataFrame): DataFrame = {
    val sig = graft.functions.MinhashSig.minhashSig(col("words"), ShingleWords,
      (0 until MinHashK).map(minhashA), (0 until MinHashK).map(minhashB), MinhashP)
    dw.filter(size(col("words")) >= ShingleWords)
      // sig in its own projection: 16 element_at consumers would otherwise
      // make CollapseProject inline the kernel call 16× (the winnow trap)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id") +:
        (0 until MinHashK).map(i => element_at(col("sig"), i + 1).as(s"mh$i")): _*)
  }

  /** The pre-r16 explode+partial-agg spelling of [[minhashSignatures]] —
    * kept as the independent reference implementation the kernel-parity
    * spec compares against (the WinnowFingerprints discipline). */
  private[graft] def minhashSignaturesAgg(d: DataFrame): DataFrame = {
    val sh = d
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
      .filter(size(col("words")) >= ShingleWords)
      .select(col("doc_id"), explode(shingles(col("words"))).as("sh"))
      .select(col("doc_id"), replayableStringHash(col("sh")).as("h"))
    val aggs = (0 until MinHashK)
      .map(i => min(universalMix(col("h"), minhashA(i), minhashB(i))).as(s"mh$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Band signatures: pack each BandRows-run of the signature LOSSLESSLY
    * into two 62-bit longs (mh < 2³¹, so sig1 = mh₀·2³¹ + mh₁ etc.) —
    * exact bucket identity, zero band-hash collisions, and plain-arithmetic
    * replay in DuckDB (the pre-r11 xxhash64 band hash had neither). Docs
    * agreeing on any band land in the same LSH bucket. 16 bytes of bucket
    * key per band vs the old 8 — still only (doc_id, band, 2 longs) ever
    * shuffles.
    * @note inherits [[minhashSignatures]]' unique-`doc_id` contract: one
    *       signature row per id, else buckets double-count. */
  def lshBands(sigs: DataFrame): DataFrame = {
    val nBands = MinHashK / BandRows
    val bandStructs = (0 until nBands).map { b =>
      def mh(r: Int) = col(s"mh${b * BandRows + r}")
      struct(lit(b).as("band"),
        (mh(0) * PackBase + mh(1)).as("sig1"),
        (mh(2) * PackBase + mh(3)).as("sig2"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.sig1").as("sig1"), col("bs.sig2").as("sig2"))
  }

  /** The full near-dup pipeline: LSH candidate generation → exact Jaccard
    * verification on the candidates ONLY → threshold filter. This is the
    * composition a 100 TB dedup run executes: the quadratic verify kernel
    * (Q33) touches |candidates| pairs, not |corpus|² — LSH makes the exact
    * step affordable. Returns (id1, id2, jaccard) for confirmed pairs.
    * @note `doc_id` must be unique in `d` (the [[minhashSignatures]]
    *       one-row-per-input-row contract). */
  def confirmedNearDups(d: DataFrame, threshold: Double = 0.6): DataFrame =
    confirmedNearDupsFromWords(
      d.select(col("doc_id"), wordsOf(col("text")).as("words")), threshold)

  /** [[confirmedNearDups]] over a pre-tokenized (doc_id, words) frame —
    * the entry the curation ladder uses so its ONE persisted tokenization
    * feeds signature AND verify stages (r16 verdict #5). */
  def confirmedNearDupsFromWords(dw: DataFrame, threshold: Double = 0.6): DataFrame = {
    // cands and words each feed multiple joins: persist so the LSH pipeline
    // and the token explode run once per execution, not per consumer. The
    // persists are NOT released here (the result is a lazy plan) — callers
    // release after materializing via GraftSession.releasePersisted, which
    // Bench/Verify do between queries; relying on ContextCleaner GC left
    // these blocks pinned across the whole r02 bench (verdict finding 3).
    val cands = minhashCandidatePairsFromWords(dw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = wordSetsFromWords(dw).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = words.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(words.toDF("doc_id", "word").as("wa"), col("id1") === col("wa.doc_id"))
      .join(words.toDF("doc_id2", "word2").as("wb"),
        col("id2") === col("wb.doc_id2") && col("word") === col("word2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
    // threshold > 0: any surviving pair has inter >= 1, so `inter` (grouped
    // from the candidate-driven token join) already contains every survivor —
    // skip the left-join-back over the FULL candidate set. Only the
    // threshold = 0 diagnostic mode (LSH false-positive audit: a
    // hash-collision pair with ZERO shared words must surface as jaccard 0,
    // not vanish) pays for that extra join.
    val scored =
      if (threshold > 0) inter
      else cands.join(inter, Seq("id1", "id2"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
    scored
      .join(sizes.toDF("doc_id", "sza"), col("id1") === col("doc_id")).drop("doc_id")
      .join(sizes.toDF("doc_id", "szb"), col("id2") === col("doc_id")).drop("doc_id")
      .select(col("id1"), col("id2"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Q50 — confirmed near-dup summary: LSH→verify pipeline health metrics
    * over the FULL corpus — this is the stack's designated near-dedup scale
    * path (q121's scaladoc routes ER recall through it), so no row cap:
    * [[MinhashBucketCap]] already bounds the pair join to ≤ B·n
    * comparisons, which is the only quadratic term in the pipeline (the
    * r7-era `doc_id < 2000` cap predated the bucket cap and made the 10×
    * drill vacuous — r15 verdict #1).
    * Gated at the production threshold (0.6): the threshold = 0.0
    * all-candidates diagnostic stays OUT of the benched suite — it scores
    * every zero-overlap hash collision and its cost measures the LSH
    * false-positive tail, not the dedup pipeline (r02 verdict #5). */
  def q50NeardupConfirmed(s: SparkSession, dir: String): DataFrame = {
    val pairs = confirmedNearDups(docs(s, dir))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      coalesce(round(avg("jaccard"), 4), lit(0.0)).as("avg_jaccard"),
      coalesce(round(max("jaccard"), 4), lit(0.0)).as("max_jaccard"))
  }

  /** Candidate near-dup pairs: join within LSH buckets only — the scale path
    * (bucket sizes are small, so the join is near-linear, vs O(n²) brute
    * force). Pairs deduplicated across bands.
    *
    * maxBucketSize caps the quadratic blowup a mega-duplicate cluster
    * causes (one piece of boilerplate duplicated 1M× = one bucket = 10¹²
    * pairs): buckets over the cap are dropped from PAIR GENERATION — their
    * members are by construction exact/near-exact dup clusters that the
    * cheaper exact-dedup pass (md5 / dropExactDuplicates) already collapses,
    * so skipping their pairwise expansion loses nothing at scale. */
  /** Default LSH bucket cap (q34 rule) — shared with the s50 SQL spelling. */
  val MinhashBucketCap = 1000
  def minhashCandidatePairs(d: DataFrame, maxBucketSize: Int = MinhashBucketCap): DataFrame =
    minhashCandidatePairsFromWords(
      d.select(col("doc_id"), wordsOf(col("text")).as("words")), maxBucketSize)

  /** [[minhashCandidatePairs]] over a pre-tokenized (doc_id, words) frame. */
  def minhashCandidatePairsFromWords(dw: DataFrame,
      maxBucketSize: Int = MinhashBucketCap): DataFrame = {
    // bucket-size gate as a WINDOW count, not a groupBy+self-semi-join: the
    // signature pipeline upstream is the expensive part and sits under both
    // sides of the pair join already; a semi-join formulation would embed it
    // two MORE times
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "sig1", "sig2")
    // persist the band table before the self-join: without it the whole
    // shingle→minhash→band pipeline is embedded under BOTH join sides and
    // re-derives signatures from raw text twice (round-1 verdict: 2× the
    // dominant cost of q50/q34). The table is (doc_id, band, sig) — KBs per
    // million docs, trivially cacheable; at 100 TB you'd checkpoint it to
    // durable storage instead. Released by the caller's
    // GraftSession.releasePersisted after the result materializes (see
    // confirmedNearDups' lifecycle note).
    val bands = lshBands(minhashSignaturesFromWords(dw))
      .withColumn("__bn", count(lit(1)).over(bucketW))
      .filter(col("__bn") <= maxBucketSize)
      .drop("__bn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig1") === col("b.sig1") &&
          col("a.sig2") === col("b.sig2") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** Q34 — MinHash/LSH bucket statistics. Since r11 the whole pipeline runs
    * on the replayable universal-hash family, so this lane has a COMPUTED
    * DuckDB oracle (shingle→fold→16 mins→band pack replayed in SQL) instead
    * of the former golden snapshot. Always 4 rows (one per band). */
  def q34MinhashBands(s: SparkSession, dir: String): DataFrame =
    lshBands(minhashSignatures(docs(s, dir)))
      .groupBy("band", "sig1", "sig2").agg(count(lit(1)).as("bucket_n"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("bucket_n") > 1, col("bucket_n")).otherwise(0L)).as("docs_in_collisions"),
        sum(col("bucket_n") * (col("bucket_n") - 1) / 2).cast("long").as("candidate_pairs"))
      .orderBy("band")

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document: bit b's vote is the parity of the
    * pairwise-independent g_b(x(word)) = (a_b·x + b_b) mod p — 64 universal
    * functions from the replayable family (the per-bit ±1 votes SimHash
    * needs are exactly pairwise-independent bits, Charikar STOC'02). One
    * pass, 64 codegen'd conditional-sum aggregates; only (doc_id, 64 ints)
    * reach the shuffle.
    *
    * The fingerprint is emitted as TWO longs (hi = bits 32–63, lo = bits
    * 0–31, both in [0, 2³²)): a single 64-bit pack would set bit 63 and the
    * value's sign-wrap arithmetic is exactly what DuckDB's checked BIGINT
    * rejects — two unsigned-range halves replay as plain integer sums.
    * Hamming distance = bit_count(xor(hi)) + bit_count(xor(lo)). */
  def simhash(d: DataFrame): DataFrame = {
    val words = d.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .withColumn("h", replayableStringHash(col("w")))
    val votes = (0 until 64).map { b =>
      sum(when(universalMix(col("h"), simhashA(b), simhashB(b)) % 2 === 1L, 1L)
        .otherwise(-1L)).as(s"v$b")
    }
    def pack(bits: Range, base: Int) = bits
      .map(b => when(col(s"v$b") > 0, lit(1L << (b - base))).otherwise(0L))
      .reduce(_ + _)
    words.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        pack(32 until 64, 32).as("simhash_hi"),
        pack(0 until 32, 0).as("simhash_lo"))
  }

  /** Q35 — SimHash fingerprints over the FULL corpus (the r7-era
    * `doc_id < 100` cap lifted in r16 — the lane is one map-side pass of 64
    * conditional sums per word plus a groupBy(doc_id), linear by shape).
    * Computed DuckDB oracle since r11 (the 64 universal parities replay as
    * plain SQL arithmetic). */
  def q35Simhash(s: SparkSession, dir: String): DataFrame =
    simhash(docs(s, dir)).orderBy("doc_id")

  // ------------------------------------------------------- decontamination

  /** Benchmark decontamination: ids of corpus documents sharing at least one
    * word k-shingle with a benchmark/eval set — the screen every training
    * pipeline runs so eval data never leaks into training data.
    *
    * Shape at 100 TB: benchmark shingle sets are small (eval suites are
    * thousands of docs), so the distinct benchmark-shingle side broadcasts
    * and the corpus side streams through a broadcast semi-join — the corpus
    * never shuffles, and only contaminated (doc_id) survive to the tiny
    * distinct. Exploded shingles stay columnar inside the scan stage.
    *
    * The broadcast is FORCED, not left to the planner: the r5 scale drill
    * caught the benchmark shingle table tipping over
    * `autoBroadcastJoinThreshold` at 10× (size estimates for an exploded
    * distinct are loose), silently degrading the semi-join to sort-merge —
    * which shuffle-sorts the ENTIRE exploded corpus shingle table (~50× row
    * inflation over the corpus) and was the dominant term in the
    * curation_flow 28.6× blow-up. The size CONTRACT this encodes: the
    * benchmark side is an eval suite — bounded at thousands of documents /
    * tens of MB of distinct shingles — independent of corpus scale; it must
    * fit in one executor's memory or the caller should pre-reduce it.
    * PlanAuditSpec pins that the corpus probe side of this join never
    * sorts. */
  /** `carry` columns ride along with doc_id through the shingle pass so the
    * caller never has to re-scan the corpus just to recover them. */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame, k: Int = 5,
      carry: Seq[String] = Nil): DataFrame =
    // the ~50× shingle fan-out must not run single-threaded on an
    // unsplittable source layout; no-op when the corpus plan is already
    // parallel (the 100 TB case — the EXPLODED table still never shuffles)
    contaminatedIdsFromWords(
      Scale.ensureParallel(corpus).select(
        ("doc_id" +: carry).map(col) :+ wordsOf(col("text")).as("words"): _*),
      benchmark, k, carry)

  /** [[contaminatedIds]] with a pre-tokenized (doc_id, carry…, words)
    * corpus probe side; the benchmark side still takes raw text (eval
    * suites are small — one cheap scan). */
  def contaminatedIdsFromWords(corpusWords: DataFrame, benchmark: DataFrame,
      k: Int = 5, carry: Seq[String] = Nil): DataFrame = {
    val keyCols = "doc_id" +: carry
    def shW(dw: DataFrame, keep: Seq[String]): DataFrame = dw
      .filter(size(col("words")) >= k)
      .select(keep.map(col) :+ explode(shingles(col("words"), k)).as("sh"): _*)
    val bench = benchmark.select(col("doc_id"), wordsOf(col("text")).as("words"))
    shW(corpusWords, keyCols)
      .join(broadcast(shW(bench, Seq("doc_id")).select("sh").distinct()),
        Seq("sh"), "left_semi")
      .select(keyCols.map(col): _*).distinct()
  }

  /** Canary "eval sentence" for Q76 — 5 words so it is exactly one
    * k=5 shingle. Interpolated into the DuckDB-oracle and SqlFrontDoor
    * spellings too (r9 ADVICE: shared literals must have ONE source of
    * truth or the three spellings drift silently until the gate trips). */
  val Canary = "zq wv jk pq xy"

  /** Q132 dup-injection parameters — every doc_id ≡ 0 (mod [[DupFixMod]])
    * replaces its text with `DupFixPrefix ⌊doc_id/DupFixWindow⌋`. Shared
    * by the Scala plan, the DuckDB oracle, and the s132 SQL text. */
  val DupFixMod = 7
  val DupFixWindow = 70
  val DupFixPrefix = "dupfix "

  /** Q132 — cross-source duplicate CONTAINMENT MATRIX: for every source
    * pair, how many distinct content fingerprints appear in BOTH — the
    * diagnostic every dedup run reports ("how much of the new crawl is
    * already in the books corpus"), which decides whether a source earns
    * its storage before any per-doc keep/drop runs. The fixture corpus has
    * zero organic exact dups (500/500 unique fingerprints at sf0.01), so
    * duplication is injected deterministically in a PROJECTION (the q76
    * canary discipline, no join): every doc_id ≡ 0 (mod 7) replaces its
    * text with a shared `dupfix ⌊doc_id/70⌋` string — each 70-id window
    * yields a 10-doc duplicate group spanning 10 rotating sources, so the
    * matrix is non-vacuous at every SF and the oracle replays it exactly
    * (md5 is the same function on both engines).
    *
    * Scale: only (16-byte fingerprint, source) pairs ever shuffle — text
    * reduces to md5 map-side, `distinct` is a partial-agg, and the self
    * equi-join on fp explodes at most |sources|² rows per fingerprint
    * (bounded by the source count, not the corpus). */
  def q132CrossSourceDupMatrix(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).filter(col("text").isNotNull)
      .select(col("source"),
        when(col("doc_id") % DupFixMod === 0,
          concat(lit(DupFixPrefix), expr(s"doc_id div $DupFixWindow").cast("string")))
          .otherwise(col("text")).as("text"))
    val fp = base.select(md5(col("text")).as("fp"), col("source")).distinct()
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .orderBy("source_a", "source_b")
  }

  /** Q131 — per-doc contamination overlap SCORE: where q76 answers "is this
    * doc contaminated at all" (binary semi-join), this grades HOW MUCH —
    * the fraction of a document's 5-shingle occurrences that land in the
    * benchmark shingle set, in exact ppm integers. The graded signal is
    * what a curation pipeline thresholds ("drop ≥ x% overlap, flag the
    * rest"), and the canary injection (q76's trick: appended to every 7th
    * corpus doc and every benchmark doc) keeps the score column
    * non-vacuous at every scale.
    *
    * Counts are over shingle OCCURRENCES, not distinct shingles, by
    * design: occurrence counting keeps the whole plan shuffle-free until
    * the per-doc partial agg (a distinct-shingle variant would have to
    * dedup (doc_id, shingle) — a full shuffle of the exploded corpus —
    * for a near-identical signal).
    *
    * Scale: benchmark shingles broadcast (eval slices are small by
    * definition); the corpus explodes ~50× map-side, left-joins the
    * broadcast in place, and partial-aggregates to one row per doc before
    * anything shuffles — only (doc_id, count, count) triples cross the
    * wire. */
  def q131ContaminationScore(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"),
      concat(coalesce(col("text"), lit("")),
        when(col("doc_id") % 7 === 0 || col("doc_id") % 100 === 0,
          lit(" " + Canary)).otherwise(lit(""))).as("text"))
    def sh(d: DataFrame): DataFrame = d
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
      .filter(size(col("words")) >= k)
      .select(col("doc_id"), explode(shingles(col("words"), k)).as("sh"))
    val benchSh = sh(base.filter(col("doc_id") % 100 === 0))
      .select("sh").distinct().withColumn("hit", lit(1L))
    sh(Scale.ensureParallel(base.filter(col("doc_id") % 100 =!= 0)))
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_contam"))
      .filter(col("n_contam") > 0)
      .select(col("doc_id"), col("n_shingles"), col("n_contam"),
        expr("n_contam * 1000000 div n_shingles").cast("long").as("contam_ppm"))
      .orderBy("doc_id")
  }

  /** Q76 — contaminated-doc counts per language, with benchmark = every
    * 100th doc_id (a stand-in eval slice). The word-salad corpus has no
    * organic cross-doc 5-gram overlap at every scale, so contamination is
    * injected deterministically (Q67's PII-injection trick): the canary
    * sentence is appended to every benchmark doc and to every 7th corpus
    * doc — those docs must come back contaminated, proving the shingle
    * match end-to-end rather than vacuously returning empty. */
  def q76Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("lang"),
      concat(coalesce(col("text"), lit("")),
        when(col("doc_id") % 7 === 0 || col("doc_id") % 100 === 0,
          lit(" " + Canary)).otherwise(lit(""))).as("text"))
    val rest = base.filter(col("doc_id") % 100 =!= 0)
    // lang rides through the shingle pass (carry) — a join-back to recover
    // it would re-scan the whole corpus a second time
    contaminatedIds(rest, base.filter(col("doc_id") % 100 === 0), carry = Seq("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n_contaminated"))
      .orderBy("lang")
  }

  // --------------------------------------------------------- dup clustering

  /** Connected components by min-label propagation with pointer jumping:
    * each round every node takes the minimum of its own label, its
    * neighbors' labels, AND the label of its label (path halving) — so a
    * diameter-d chain converges in O(log d) rounds, not O(d). The round is
    * two joins + one partial-aggregated groupBy — pure Spark shuffle
    * machinery, O(E + V) per round.
    *
    * Seeding: if `nodes` carries an `lbl` column it is used as the initial
    * labeling instead of `id`. Any labeling where each seed is the id of a
    * node in the SAME component (and ≥ nothing — min-propagation only ever
    * lowers labels toward the component minimum) is valid; a cheap
    * closed-form upper bound (e.g. per-fingerprint MIN for exact-dup edges)
    * starts the fixpoint one jump from convergence and cuts the iterative
    * rounds to a single verification pass in the common case (r02 verdict
    * #6 — q79 cold cost was ~log(d) driver-coordinated rounds).
    *
    * Lineage is truncated each round by pinning the label RDD and
    * rebuilding the DataFrame over it (without this the plan doubles per
    * iteration and the driver, not the data, becomes the bottleneck); the
    * previous round's RDD is unpersisted as soon as the next is
    * materialized, so storage holds at most two label generations plus the
    * edge set. The FINAL generation stays pinned under the returned plan —
    * callers must release it after materializing (unpersist /
    * GraftSession.releasePersisted; Bench and Verify sweep between
    * queries). The per-round `count()` is the convergence test — the one
    * legitimate driver-side action in an iterative fixpoint.
    * Non-convergence within `maxIter` throws rather than silently
    * returning wrong labels. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = nodes.sparkSession
    def pin(df: DataFrame) = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    val (sym, symRdd) = pin(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())
    var (labels, labelsRdd) = pin(
      if (nodes.columns.contains("lbl")) nodes.select(col("id"), col("lbl"))
      else nodes.select(col("id"), col("id").as("lbl")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels.select(col("id").as("nbr"), col("lbl")),
          col("dst") === col("nbr"))
        .groupBy("src").agg(min("lbl").as("nbr_lbl"))
      val cand = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(labels("lbl"), coalesce(col("nbr_lbl"), labels("lbl"))).as("cand"),
          labels("lbl").as("old_lbl"))
      // pointer jump: follow cand to ITS current label — labels always hold
      // ids of same-component nodes, so the jump stays in-component while
      // halving the distance to the component minimum
      val jumped = cand.join(
          labels.select(col("id").as("jid"), col("lbl").as("jlbl")),
          col("cand") === col("jid"), "left")
        .select(col("id"),
          least(col("cand"), coalesce(col("jlbl"), col("cand"))).as("new_lbl"),
          col("old_lbl"))
      val (next, nextRdd) = pin(jumped)
      changed = next.filter(col("new_lbl") =!= col("old_lbl")).count()
      labelsRdd.unpersist(false)
      labels = next.select(col("id"), col("new_lbl").as("lbl"))
      labelsRdd = nextRdd
      iter += 1
    }
    symRdd.unpersist(false)
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Q79 — near-dup cluster assignment: the step AFTER pair mining, where
    * pairwise duplicates become groups and one keeper survives per group.
    * Edges here are exact-dup CHAINS (consecutive ids within a shared-md5
    * group, via lag over the fp window) — linear in group size where the
    * all-pairs construction is O(g²) per group and detonates on a giant
    * identical-text cluster; chains also force real multi-hop propagation
    * (diameter = group size − 1) instead of handing the operator 1-hop
    * cliques. The oracle has a closed form — cluster = MIN(doc_id) over the
    * fingerprint group — so the conformance row proves the generic
    * iterative operator actually reaches the right fixpoint. NULL-text
    * docs are excluded: a NULL fingerprint is not a dup claim.
    *
    * Labels are SEEDED with the per-fingerprint MIN (the closed form the
    * exact-dup edge construction admits), so the iterative operator starts
    * at the fixpoint and converges in one verification round instead of
    * O(log diameter) driver round-trips — the oracle row then proves the
    * operator PRESERVES the correct fixpoint; genuine multi-hop propagation
    * from unseeded labels is pinned separately by DedupSpec's chain tests. */
  def q79DupClusters(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val labeled = d
      .withColumn("prev", lag("doc_id", 1).over(w))
      .withColumn("lbl", min("doc_id").over(Window.partitionBy("fp")))
    val chains = labeled.filter(col("prev").isNotNull)
      .select(col("prev").as("src"), col("doc_id").as("dst"))
    connectedComponents(
        labeled.select(col("doc_id").as("id"), col("lbl")), chains)
      .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------ embedding cosine dedup

  /** Q37 — embedding-cosine near-dup mining: top-20 most similar pairs in a
    * bounded subset (vec_id < 300). Exact double math + ROUND(4) so it
    * oracle-matches; tie-break by (id1, id2). The unbounded scale path is
    * Similarity.lshCosineBuckets. */
  def q37NeardupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).filter(col("vec_id") < 300)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val a = e.toDF("id1", "v1")
    val b = e.toDF("id2", "v2")
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(VectorOps.cosine(col("v1"), col("v2")), 4).as("sim"))
      .orderBy(col("sim").desc, col("id1"), col("id2"))
      .limit(20)
  }

  // ------------------------------------ embedding-cosine semantic dedup

  /** Per-cluster member cap for q152's pairwise confirm. √n-stride seeding
    * keeps clusters near √n members, so the cap is inactive on balanced
    * data (500 vecs → ~22-member clusters; 50k → ~224) and exists purely
    * as the skew bound: a pathological cluster contributes at most
    * cap²/2 pairs instead of |cluster|²/2, the same role FrameBucketCap
    * plays for q150's fingerprint buckets. Production tuning at 100 TB
    * raises k (more, smaller clusters) rather than leaning on the cap —
    * over-cap members are emitted as kept-unexamined, never dropped. */
  val SemMemberCap = 256

  /** Cosine threshold for "semantic duplicate". 0.35 sits just under the
    * fixture's max within-cluster similarity (0.472, random-vector
    * regime) so the lane exercises real positives (~58 pairs at sf0.01);
    * real text embeddings would use ~0.9+. Compared on ROUND(sim, 4) so
    * Spark and the DuckDB oracle threshold the identical value. */
  val SemDupTau = 0.35

  /** Q152 — SemDeDup-style semantic dedup over the embedding column
    * (Abbas et al. 2023: cluster the corpus, then deduplicate *within*
    * clusters only). Completes the dedup family's embedding leg with a
    * SCALING path: q37 is the bounded all-pairs audit (`vec_id < 300`,
    * O(n²) by design); this lane prunes the comparison space with the
    * same √n-stride IVF assignment q48/q114 use — one broadcast-centroid
    * argmax pass, then pairwise cosine ONLY inside a cluster. At sf0.01
    * that is 5,605 candidate pairs instead of 124,750 (95.5% pruned);
    * with √n clusters of ~√n members the candidate count grows as n^1.5
    * against all-pairs' n², and the member cap bounds any skewed
    * cluster's contribution at cap²/2.
    *
    * Within-cluster-only comparison is the technique's documented recall
    * trade: pairs straddling a cluster boundary are missed (fixture: 58
    * of the 271 global ≥τ pairs share a cluster — random vectors scatter
    * across clusters; real embedding spaces put near-dups in the same
    * cell, which is why the published method works). Verdict columns per
    * vector: its cluster, the lowest-id ≥τ neighbor it duplicates
    * (`dup_of`, −1 when kept — COALESCE so the bigint never NULLs into
    * a cross-engine hash divergence), and `is_dup`. Survivor rule
    * min-id-wins, the q26/q79 discipline.
    *
    * Plan shape: assignment is the q48 kernel (3 budgeted embeddings
    * scans: √n count, stride-filtered centroid scan, corpus pass); the
    * ranked member table is persisted before fanning into the self-join's
    * two sides and the verdict join — the q34/q50 discipline, without
    * which Spark recomputes the broadcast-argmax subtree three times.
    * Members carry the UNIT-NORMALIZED vector (one O(n·d) pass), so the
    * Θ(n^1.5) pair stage is a pure fused-loop dot product — 2 flops per
    * element instead of the 3-accumulator cosine kernel's 6; at 100 TB
    * the pair stage dominates and the normalize pass is noise. The
    * oracle replays normalize-then-dot with the same left-associative
    * index-order folds, so the hash contract is unchanged. */
  def q152SemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    semDedupVerdicts(e).orderBy("vec_id")
  }

  /** The q152 SemDeDup core over an arbitrary embedding frame `e`
    * (vec_id, v: array<double>) — extracted (r16) so the curation flow can
    * compose the verdict set as a dedup stage ([[graft.operators.Curation]]).
    * Same plan and persist lifecycle as q152; unordered (q152 adds the
    * display orderBy). */
  def semDedupVerdicts(e: DataFrame): DataFrame = {
    val assigned = Similarity.ivfAssign(e, Similarity.sqrtStride(e))
    val members = assigned
      .withColumn("mrk",
        row_number().over(Window.partitionBy("cluster").orderBy("vec_id")))
      .withColumn("nrm", VectorOps.norm(col("v"))) // own column: inlining
      // the fold inside the transform lambda re-evaluates it per element
      .withColumn("vn", VectorOps.unit(col("v"), col("nrm")))
      .drop("v", "nrm")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val paired = members.filter(col("mrk") <= SemMemberCap)
    val a = paired.select(col("cluster"), col("vec_id").as("id1"), col("vn").as("v1"))
    val b = paired.select(col("cluster"), col("vec_id").as("id2"), col("vn").as("v2"))
    val dupOf = a.join(b, Seq("cluster"))
      .filter(col("id1") < col("id2"))
      .select(col("id2"), col("id1"),
        round(VectorOps.dotNative(col("v1"), col("v2")), 4).as("sim"))
      .filter(col("sim") >= SemDupTau)
      .groupBy(col("id2").as("vec_id"))
      .agg(min(col("id1")).as("dup_of"))
    members.select(col("cluster"), col("vec_id"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
        col("dup_of").isNotNull.as("is_dup"))
  }

  // -------------------------------------- content-defined passage chunking

  /** Content-defined chunking (CDC) over a document's word stream: a word
    * whose md5 hex starts with '0' or '1' (p = 1/8, expected passage ≈ 8
    * words) STARTS a new passage. Because the boundary decision depends
    * only on the word itself — not its position — a sentence shared by two
    * documents at DIFFERENT offsets chunks into identical passages in both,
    * which is exactly what fixed-stride chunking (q66) cannot do. This is
    * the standard trick behind boilerplate/passage-level dedup in crawl
    * pipelines (rsync/LBFS-style content-defined boundaries, here with a
    * portable md5 gate instead of a rolling hash so DuckDB can replay it).
    *
    * Scale shape: the whole chunking is ONE map-side projection — a
    * document fits in its row, so the split is computed with array HOFs
    * (boundary flags → segment start positions → slice per segment) and
    * the only generator is the final posexplode of the per-doc passage
    * array. Zero shuffles until the caller's passage-hash agg. (The r1–r6
    * spelling shuffled twice for the same answer: a per-doc cumulative
    * window over posexploded tokens, then a groupBy(doc_id, pid) that
    * collect_list+sorted every token struct back together — the r6 drill
    * measured it at 3.6× for 10× data; reassembling a row-local value
    * through the shuffle machinery was all overhead.)
    *
    * Returns (doc_id, pid, passage) — pid ascending in document order,
    * identical numbering to the window spelling (first passage gets pid 1
    * when word 0 is itself a boundary, else pid 0). */
  def cdcPassages(d: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // the ~50× token fan-out must not be serialized by the source layout
    // (no-op on an already-parallel input — Scale.ensureParallel)
    val words = Scale.ensureParallel(d)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
      // boundary flag per word, hashed ONCE (separate projection so the
      // start-position filter and the pid offset both read the flags
      // instead of re-running md5 per consumer)
      .withColumn("__b", transform(col("__w"),
        w => when(substring(md5(w), 1, 1).isin("0", "1"), 1).otherwise(0)))
    // 0-based start position of every passage: position 0 unless word 0 is
    // a boundary (then the head segment is empty and does not exist — the
    // window spelling had no pid-0 rows in that case), plus every boundary
    // position
    val starts = concat(
      when(element_at(col("__b"), 1) === 1, array().cast("array<int>"))
        .otherwise(array(lit(0))),
      filter(sequence(lit(0), size(col("__w")) - 1),
        i => element_at(col("__b"), i + 1) === 1))
    // passage k spans [starts(k), starts(k+1)) — the last one runs to the
    // end of the document
    // try_element_at: the k+2 lookup runs one past the end for the final
    // segment by design — ANSI element_at throws there
    val passages = transform(col("__s"), (s0, k) =>
      concat_ws(" ", slice(col("__w"), s0 + 1,
        coalesce(try_element_at(col("__s"), k + 2), size(col("__w"))) - s0)))
    words
      .withColumn("__s", starts)
      .select(col(idCol),
        when(element_at(col("__b"), 1) === 1, 1L).otherwise(0L).as("__off"),
        posexplode(passages).as(Seq("__k", "passage")))
      .select(col(idCol), (col("__k") + col("__off")).as("pid"), col("passage"))
  }

  /** Q92 — passage-level dedup summary over CDC chunks, with an injected
    * boilerplate canary ("the quick brown fox…" appended to every 5th doc;
    * its words 'quick'/'lazy'/'dog' are boundary words, so every injected
    * doc shares identical mid-boilerplate passages — the conformance row
    * can't pass vacuously on all-unique passages). keeper_sum pins WHICH
    * doc wins each duplicated group (min doc_id), not just how many. */
  def q92CdcPassageDedup(s: SparkSession, dir: String): DataFrame = {
    val boiler = " the quick brown fox jumps over the lazy dog"
    val base = docs(s, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        concat(col("text"), when(col("doc_id") % 5 === 0, boiler).otherwise("")).as("text"))
    cdcPassages(base)
      .groupBy(md5(col("passage")).as("pmd5"))
      .agg(count(lit(1)).as("copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper"))
      .agg(
        count(lit(1)).as("n_unique_passages"),
        sum("copies").cast("long").as("n_passages"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).cast("long").as("cross_doc_groups"),
        sum(when(col("n_docs") >= 2, col("copies"))).cast("long").as("cross_doc_copies"),
        sum(when(col("n_docs") >= 2, col("keeper"))).cast("long").as("keeper_sum"))
  }

  /** Q121 — blocked fuzzy join (entity resolution): document pairs whose
    * normalized 24-char prefixes are within edit distance 6, candidate-
    * generated by MULTI-KEY BLOCKING — the classic ER decomposition that
    * turns an O(n²) all-pairs Levenshtein into Σ|block|² comparisons on a
    * cheap equi-join. Complements the set-similarity dedup stack (q33
    * Jaccard, q34/q50 MinHash, q53 char n-grams): edit distance catches
    * single-character typo variants that shingle overlap scores poorly.
    * Levenshtein is the same classic DP in both engines → exact oracle,
    * all-integer. No row cap: the whole corpus participates (the r7-era
    * `doc_id < 2000` cap is gone).
    *
    * Blocking key = (4-char prefix, ⌊len/8⌋ length band): two sigs at edit
    * distance ≤6 can differ in length by ≤6, so the coarse band costs some
    * recall at band edges — the inherent blocking trade, declared in the
    * semantics (both engines compute the identical candidate set, so the
    * oracle stays exact). Mega-block guard: blocks larger than
    * [[FuzzyBlockCap]] are dropped deterministically (window count over
    * the block key — the q34 `maxBucketSize` rule). Such blocks are
    * near-constant boilerplate prefixes whose pairs are ER noise, and the
    * guard bounds per-block cost at B² regardless of corpus size. At the
    * verify SFs every block is far under the cap (max 197 at sf0.1), so
    * the guard is observable only at drill scale.
    *
    * Scale: the block key is the join key — candidate pairs shuffle as an
    * equi-join, never a cross join. A FIXED-cardinality blocking key makes
    * Σ|block|² inherently superlinear in corpus size; the cap turns that
    * into ≤ B·n comparisons (linear), at the price of dropping saturated
    * blocks. At 100 TB you'd OR several complementary blocking keys and
    * prescreen candidates with the q34 MinHash bands before paying the DP
    * — q50 is the scale path for recall; this lane is the exact-oracle
    * blocked-DP shape. */
  val FuzzyBlockCap = 1000
  def q121FuzzyPairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), lower(substring(trim(col("text")), 1, 24)).as("sig"))
      .withColumn("blk", substring(col("sig"), 1, 4))
      .withColumn("lb", expr("length(sig) div 8").cast("long"))
      .withColumn("bn", count(lit(1)).over(Window.partitionBy("blk", "lb")))
      .filter(col("bn") <= FuzzyBlockCap)
      .drop("bn")
    val a = d.select(col("doc_id").as("id1"), col("sig").as("sig1"), col("blk"), col("lb"))
    val b = d.select(col("doc_id").as("id2"), col("sig").as("sig2"), col("blk"), col("lb"))
    a.join(b, Seq("blk", "lb")).filter(col("id1") < col("id2"))
      // threshold form (SPARK-44384): banded O(len·k) DP with early exit,
      // -1 beyond the bound — exact distances for every emitted pair, so
      // the output is identical to the full-DP spelling the oracle runs
      // (measured 4.5 s → 2.6 s at 50k docs; the DP is this lane's cost)
      .withColumn("lev", levenshtein(col("sig1"), col("sig2"), 6).cast("long"))
      .filter(col("lev") >= 0)
      .select("id1", "id2", "lev")
      .orderBy("id1", "id2")
  }

  // ------------------------------------------- exact-substring span dedup

  /** Token width of an ExactSubstr match window (Lee et al. 2021 use 50 BPE
    * tokens on real corpora; 8 words keeps the fixture docs — ~60 words —
    * able to carry several disjoint spans). */
  val ExactSubstrK = 8

  /** Q161 — exact-substring duplicate spans (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", the ExactSubstr side of
    * that paper's NearDup/ExactSubstr pair): every MAXIMAL token range of a
    * document that is covered by k-token windows occurring verbatim anywhere
    * else in the corpus. This is the span-DISCOVERY primitive the document-
    * level ladder (q28 exact, q50 MinHash, q152 SemDeDup) cannot express:
    * those keep or drop whole documents, while ExactSubstr localizes the
    * duplicated text itself (licence headers, boilerplate footers, quoted
    * passages) so a curation pass can trim spans and keep the remainder.
    * q92's CDC passages are the probabilistic cousin (content-defined
    * chunk-then-hash: recall only for whole shared chunks); this lane is the
    * exact-recall path — every duplicated run ≥ k tokens is found, at any
    * offset, regardless of chunk boundaries.
    *
    * Algorithm, Spark-first (the paper builds one corpus-wide suffix array;
    * the distributed equivalent is the k-gram occurrence relation):
    *   1. one map-side pass per doc: rolling k-token windows hashed with
    *      md5 over the space-rejoined words (array HOFs + one posexplode —
    *      the q92 zero-shuffle chunking discipline; md5 is the portable
    *      gate DuckDB replays byte-exactly),
    *   2. corpus-wide multiplicity per hash: `count() OVER (PARTITION BY h)`
    *      — ONE shuffle, hash-partitioned, the distributed spelling of the
    *      suffix-array group; occurrences with copies ≥ 2 (self-overlap
    *      counts, as in the paper) survive,
    *   3. per-doc interval merge of surviving [pos, pos+k) windows: equal
    *      widths make the classic running-max island scan a single lag —
    *      a window over (doc_id, pos) whose partitions are the per-doc
    *      duplicated positions (≤ tokens/doc, row-local rows).
    * Output: (doc_id, span_start, span_end, span_tokens), token-indexed,
    * half-open, overlap-or-adjacent windows merged. Σ span_tokens is the
    * paper's "duplicated bytes" accounting; the spans are directly usable
    * as trim instructions.
    *
    * Scale (100 TB): the occurrence stream is N_tokens rows of
    * (doc_id, pos, 16-byte hash) — linear, never a suffix array in memory;
    * the h-shuffle is the only corpus-wide exchange and carries no text
    * (hot boilerplate hashes sort within their partition — no per-key
    * state). Only duplicated occurrences (sparse on real crawls) reach the
    * per-doc merge. Exactness is modulo md5 collision over 8-word windows
    * (the engineering trade every production ExactSubstr variant ships).
    *
    * Conformance injection (the q92 canary rule — the lane must not pass
    * vacuously on all-unique text): every 3rd doc gets a shared 12-word
    * licence-header prefix (5 overlapping windows → ONE merged span, so the
    * interval merge is exercised, not just window equality) and every 5th
    * doc a shared 9-word footer suffix; doc_id % 15 == 0 docs carry BOTH —
    * two disjoint spans in one document. The oracle replays the injection. */
  def q161ExactSubstrSpans(s: SparkSession, dir: String): DataFrame =
    exactSubstrSpans(exactSubstrCorpus(s, dir))

  /** The q161/q163 conformance corpus: the documents table with the
    * header/footer duplication canaries injected (q92 rule — the span
    * lanes must not pass vacuously on all-unique text). Shared by the
    * discovery lane (q161) and the trim lane (q163) so the two gate the
    * SAME spans. */
  private[graft] def exactSubstrCorpus(s: SparkSession, dir: String): DataFrame = {
    val header = "shared license header text appears before many documents in the crawl corpus"
    val footer = "subscribe to our newsletter for updates and special offers"
    docs(s, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), concat(
        when(col("doc_id") % 3 === 0, header + " ").otherwise(""),
        col("text"),
        when(col("doc_id") % 5 === 0, " " + footer).otherwise("")).as("text"))
  }

  /** The ExactSubstr core over any (doc_id, text) frame — see
    * [[q161ExactSubstrSpans]] for semantics and the scale contract. */
  def exactSubstrSpans(d: DataFrame, k: Int = ExactSubstrK): DataFrame = {
    // ~N_tokens fan-out must not be serialized by the source layout (q92)
    val words = Scale.ensureParallel(d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= k)
    val grams = words.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("w")) - k),
        i => md5(concat_ws(" ", slice(col("w"), i + 1, lit(k)))))).as(Seq("pos", "h")))
    val dupOcc = grams
      .withColumn("copies", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("copies") >= 2)
      .select("doc_id", "pos")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    dupOcc
      .withColumn("prev", lag("pos", 1).over(byPos))
      // equal-width intervals sorted by start: the previous window's end is
      // lag(pos)+k, so overlap-or-adjacency is pos <= prev+k — no running
      // max needed
      .withColumn("fresh",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L).otherwise(0L))
      .withColumn("span_id", sum("fresh").over(byPos))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min("pos").as("s0"), (max("pos") + k).as("s1"))
      .select(col("doc_id"),
        col("s0").cast("long").as("span_start"),
        col("s1").cast("long").as("span_end"),
        (col("s1") - col("s0")).cast("long").as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  /** APPLY [[exactSubstrSpans]]' output — cut the spans out, keep the
    * remainder (Lee et al. 2021 train on the TRIMMED corpus; discovery
    * without application is only half the operator). Token-indexed cuts
    * against the same whitespace tokenization the discovery pass used;
    * remainders re-join with single spaces.
    *
    * Input: `docs` with (doc_id, text, ...any other columns); `spans` with
    * (doc_id, span_start, span_end) half-open token ranges. Output: the
    * input columns with `text` REPLACED by the trimmed text, plus
    * `kept_tokens` / `trimmed_tokens` accounting columns (a doc with no
    * spans keeps its text verbatim-modulo-whitespace-normalization:
    * re-joining on single spaces is the same normalization the k-gram
    * hashes applied, so discovery and application agree on positions).
    *
    * Scale (100 TB): one broadcast-free row-local pass — spans collapse to
    * ≤ tokens/doc structs per doc (a (doc_id)-keyed shuffle of 24-byte
    * rows, the only exchange), then per-row array HOFs (`filter` with the
    * index lambda over the words array) cut inside one projection. Nothing
    * corpus-wide, nothing quadratic; cost ∝ Σ tokens. */
  def trimSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val sp = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__sp"))
    val others = docs.columns.filterNot(_ == "text")
    docs.join(sp, Seq("doc_id"), "left")
      .withColumn("__w", wordsOf(col("text")))
      .withColumn("__spn", coalesce(col("__sp"), array()))
      // token i survives iff no span covers it; i is the 0-based index the
      // discovery pass positions refer to
      .withColumn("__kept", filter(col("__w"), (_, i) =>
        !exists(col("__spn"), s =>
          i >= s.getField("span_start") && i < s.getField("span_end"))))
      .select(others.map(col) :+
        concat_ws(" ", col("__kept")).as("text") :+
        size(col("__kept")).cast("long").as("kept_tokens") :+
        (size(col("__w")) - size(col("__kept"))).cast("long").as("trimmed_tokens"): _*)
  }

  /** Q163 — ExactSubstr trim-and-keep (r18 verdict Next #1): q161's spans
    * APPLIED. Runs discover → [[trimSpans]] → re-discover on the trimmed
    * corpus, and emits per-doc (kept_tokens, trimmed_tokens) beside the
    * corpus-level FIXPOINT AUDIT: residual_spans / residual_tokens = what a
    * second discovery pass still finds. Trimming removes EVERY occurrence
    * of every duplicated window (the all-copies variant — q161's span
    * relation is per-occurrence, so applying it verbatim cuts all copies),
    * hence any window surviving inside a preserved island was unique
    * before and stays unique; the only possible residual is a stitched
    * window (prefix+suffix re-joined across a mid-doc cut) colliding
    * across docs — absent in the fixture (DedupSpec pins residual = 0, the
    * fixpoint). One corpus re-scan + the q161 h-shuffle twice — linear.
    *
    * The canaried corpus is [[exactSubstrCorpus]] — the SAME injected
    * spans q161 gates, so this lane provably trims the spans that lane
    * discovered (header docs lose 12+ tokens, footer docs 9+). */
  def q163TrimSpans(s: SparkSession, dir: String): DataFrame = {
    val base = exactSubstrCorpus(s, dir)
    val trimmed = trimSpans(base, exactSubstrSpans(base))
    val residual = exactSubstrSpans(trimmed.select(col("doc_id"), col("text")))
      .agg(count(lit(1)).cast("long").as("residual_spans"),
        coalesce(sum("span_tokens"), lit(0L)).cast("long").as("residual_tokens"))
    trimmed.select(col("doc_id"), col("kept_tokens"), col("trimmed_tokens"))
      .crossJoin(broadcast(residual))
      .orderBy("doc_id")
  }
}
