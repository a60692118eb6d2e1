package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic ≥10× scale drill (VERDICT r4 directive #4): testdata stops at
  * sf0.1, so the only way to SEE a hidden quadratic or a 2 GB task is to
  * manufacture the next decade of scale and measure. [[materialize]] writes
  * a `factor`× copy of the drill tables; Bench runs the most expensive
  * queries on a same-written 1× copy and the `factor`× copy and records
  * per-query runtime ratios — a plan that is linear in the data should scale
  * well UNDER `factor` (fixed overhead amortizes), and a ratio far above
  * `factor` is a scale bug, caught here instead of on a cluster.
  *
  * Measurement design (r5 verdict, "What's wrong"):
  *  - BOTH sides are freshly materialized by the same writer with the same
  *    multi-file layout. The r5 drill reused the main bench passes' timings
  *    as the base side (different cache/GC state) and read the source
  *    single-file sf0.1 layout on one side only — the recorded 28.6× was
  *    mostly those artifacts.
  *  - The layout is multi-file (one per core): a single parquet file under
  *    the row-group size is ONE row group = ONE split, so every map stage
  *    runs single-threaded regardless of cores — wall-clock then grows
  *    linearly with data even for perfectly linear plans. Real data growth
  *    brings real split growth on a cluster; the drill must model that, or
  *    it measures the test harness's file count, not the engine's plans.
  *  - Timing is INTERLEAVED best-of-two (base, ×N, base, ×N) so a
  *    contention burst or page-cache transition hits both sides alike
  *    instead of permanently poisoning one ratio side.
  *
  * Replication must not distort the algorithmic structure:
  *  - `documents`: ids shift by copy; every copy beyond the first gets a
  *    copy-specific token spliced after every 4th word, which breaks ALL
  *    cross-copy 5-shingles — near-dup cluster sizes stay scale-INVARIANT
  *    (the within-copy dup structure is preserved verbatim). Naive
  *    replication would make every doc a near-dup of its 9 siblings and
  *    quadratically inflate candidate pairs: a drill artifact, not a
  *    finding.
  *  - `embeddings`: ids shift; each copy's vectors get a deterministic
  *    per-(copy, dim) perturbation so no two copies are cosine-identical
  *    (exact duplicates would tie the ANN truth ranking).
  *  - `lineitem` / `orders` / `events`: keys shift by copy; measure columns
  *    are kept verbatim, so group cardinalities grow linearly and value
  *    distributions are unchanged.
  */
object ScaleDrill {

  /** The most expensive suite queries (r4/r5 bench) + one events query —
    * every drill table is exercised. q107 joined in r6: the built-in
    * percentile buffers per-distinct-value counts per group, and the drill
    * is where that buffer either holds or breaks. */
  val drillQueries: Seq[String] = Seq(
    "q50_neardup_confirmed", // documents: LSH near-dup pipeline
    "q161_exact_substr_spans", // documents (r18): ExactSubstr — the k-gram
                             // occurrence stream is token-linear and the
                             // multiplicity window shuffles 16-byte hashes;
                             // splice copies make MOST grams duplicated at
                             // ×10 (every copy shares its between-splice
                             // windows), so the island merge sees ~full
                             // volume — the honest worst case; text lane,
                             // gates at the measured volume ratio
    "q163_exact_substr_trim", // documents (r19): ExactSubstr APPLIED —
                             // discover + token-cut + re-discover is two
                             // q161 passes and one row-local trim, all
                             // token-linear; text lane, gates at the
                             // measured volume ratio like q161
    "q164_neardup_aware_split", // documents (r19): the near-dup-aware
                             // split — the q50 banded pipeline (volume-
                             // bound), component contraction over the
                             // sparse rep graph, and 16-byte-key audit
                             // shuffles; text lane at the volume bar
    "q167_curation_trimmed", // documents (r19): the trim-FIRST curation
                             // funnel — the q163 span chain + the q111
                             // ladder, all token-linear stages over the
                             // trimmed corpus; text lane at the volume bar
    "q168_bpe_train",        // documents (r19): BPE training — one
                             // token-linear word-count pass, then NMerges
                             // rounds over the DISTINCT-WORD table (the
                             // Zipf bound: vocab grows sublinearly in
                             // corpus volume, so the drill is where the
                             // "merge loop never touches the corpus"
                             // claim is measured); text lane at the
                             // volume bar
    "q169_quality_classifier", // documents (r19): NB quality filter — one
                             // corpus explode + the token-keyed model
                             // join-back, the q116 blow-up class (a Zipf
                             // head that shuffles instead of broadcasts
                             // is exactly what the ×10 side would catch);
                             // text lane at the volume bar
    "q170_bpe_tokenize",     // documents (r19): BPE apply — the q168
                             // chain plus ONE corpus re-pass joined to
                             // the vocab table; text lane at the volume
                             // bar (cost ∝ token volume, vocab sublinear)
    "q172_bpe_artifact",     // documents (r19): tokenizer-as-artifact —
                             // the q170 math plus the persist/load round
                             // trip; text lane at the volume bar
    "q173_bpe_encode_unseen", // documents (r20): merge-replay encode of
                             // held-out text — one persisted corpus
                             // explode + the row-local replay over
                             // DISTINCT words (Zipf-bounded, so the
                             // drill is where "replay cost is per
                             // distinct word" is measured); text lane
                             // at the volume bar. The per-dir artifact
                             // memo means timed pairs measure the
                             // ENCODE leg (train settles off-clock —
                             // the deploy shape)
    "q174_nb_model_artifact", // documents (r20): NB train→persist→load→
                             // score — the q169 cost plus the artifact
                             // round trip; text lane at the volume bar
    "q175_curated_split",    // documents (r20): curate→near-dup-aware
                             // split composition — two trim-chain
                             // evaluations + the q50 banded pipeline
                             // over survivors; text lane at the volume
                             // bar
    "q171_ann_adaptive_search", // embeddings (r19): adaptive-nprobe
                             // filtered serve — the q157 family plus a
                             // centroid-sized cumulative window; fixed
                             // 2.5 bar like the other serve lanes
    "q56_window_dist",       // orders: sharded distribution windows
    "q87_ann_recall",        // embeddings: ANN truth + IVF + LSH
    "q92_cdc_passages",      // documents: content-defined passage dedup
    "q97_rolling_range",     // events: RANGE-frame rolling window
    "q99_winsorized",        // lineitem: sharded two-sided percentile
    "q112_percentile_disc_sharded", // lineitem: the (now default) 100 TB
                             // percentile spelling — q107 aliases to it
                             // since r10, so one gated lane covers both
    "q116_bigram_rarity",    // documents: exploded-bigram self-join — the
                             // count-table join-back is the classic shape
                             // that blows up when the head of the Zipf
                             // distribution shuffles instead of broadcasts
    "q121_fuzzy_pairs",      // documents: blocked fuzzy join (r8 verdict #7:
                             // cap lifted, ratio recorded) — see
                             // knownSuperlinear for the regime analysis
    "q118_mad_outliers",     // lineitem: histogram-refinement medians — the
                             // zero-shuffle quantile plan must show its flat
                             // scaling here, where the shuffle plans can't
    "q124_tpch_q18",         // lineitem×orders×customer: the drill's only
                             // multi-way join lane — semi-join pre-filter +
                             // 3-way join must scale with the FILTERED side
    "q127_snapshot_diff",    // orders: full-outer reconciliation — SMJ both
                             // sides, the join-bound shape with no dim to
                             // broadcast
    "q128_latest_per_key",   // events: partial SortAggregate of max(struct) —
                             // the |keys|-shuffle contract vs the window
                             // spelling, measured not just plan-pinned
    "q146_payload_dedup",    // documents (r13 verdict #7): the multimodal
                             // pillar's payload-never-shuffles property
                             // under data growth — md5 fingerprinting is
                             // byte-proportional map work, the exchange
                             // carries 24 bytes/doc however large the
                             // payloads grow (pre-measured 1.3 at 10×)
    "q150_frame_neardup",    // documents (r13 verdict #6): the composed
                             // multimodal×dedup lane — head-frame banding
                             // with the capped-bucket discipline must stay
                             // flat as families multiply (pre-measured
                             // ~1.0 at 10×: candidate pairs scale with
                             // |families|, not corpus²)
    "q114_ivfpq_recall",     // embeddings (r14 verdict #6): the 100 TB
                             // similarity-search plan of record — IVF
                             // partition pruning + PQ-ADC scoring; the
                             // audit's truth pass (20 fixed queries ×
                             // corpus) and the index build are both
                             // linear in N, so the lane gates at 2.5
    "q151_decode_ivf",       // documents (r14 verdict #3): decode→IVF
                             // assignment over the FULL corpus with a
                             // fixed ≈64-centroid budget — decode cost is
                             // byte-proportional, so it gates as a text
                             // lane (time ratio vs measured volume ratio)
    "q153_ivfpq_rerank",     // embeddings (r15): the q114 index + the exact
                             // refine stage — the FULL production ANN path.
                             // Rerank adds a fixed Q·R working set on top
                             // of q114's linear truth/index passes, so the
                             // lane gates at the same 2.5 bar: the refine
                             // stage must stay invisible under data growth
    "q155_hybrid_bm25_ann",  // documents×embeddings (r16): the at-scale
                             // hybrid — BM25 postings join (work ∝ matching
                             // postings, linear in text volume but dwarfed
                             // by the vector side at drill scale) + the
                             // q153 IVF-PQ+rerank channel (linear index/
                             // truth passes, fixed Q·R refine) + RRF.
                             // Gates at 2.5 like q153: the fusion must add
                             // nothing that grows faster than the index
    "q157_ann_index_serve",  // embeddings (r17): build→persist→load→search.
                             // The lane times the WHOLE round trip, so the
                             // drill bounds the build (one assign pass +
                             // one encode pass + the partitioned write —
                             // all linear) while the serve half must stay
                             // query-proportional (nprobe code shards +
                             // Q·R rerank rows, independent of N); gates
                             // at 2.5 like q153
    "q159_ann_index_append", // embeddings (r18): online append — base build
                             // over 90% (one assign + one encode pass,
                             // linear), appendToIndex over the rest (cost
                             // ∝ appended rows — the lane's point), serve.
                             // Gates at 2.5 like q157: every pass is linear
                             // in N and the serve half query-proportional
    "q165_ann_index_delete", // embeddings (r19): deletion — full build
                             // (linear), tombstone write (∝ |ids|), serve
                             // with the broadcast anti-join. Gates at 2.5
                             // like q157: the delete path must add nothing
                             // corpus-proportional beyond the build
    "q166_ann_filtered_search", // embeddings (r19): filtered serve — the
                             // q157 round trip plus a broadcast semi-join
                             // of the metadata selection into the
                             // candidate set; gates at 2.5: the filter
                             // must stay invisible under data growth
    "q176_ann_index_retrain", // embeddings (r20): quantizer refresh —
                             // build + append + delete + RETRAIN (one
                             // live-vector pass re-deriving quantizers +
                             // codes, ∝ |live| like the build) + serve;
                             // gates at 2.5 like q157: refresh must add
                             // only another linear encode pass
    "q156_curation_neardup", // documents×embeddings (r16): the composed
                             // curation funnel WITH the near-dup ladder —
                             // curation_flow's stages plus q50's banded
                             // MinHash and q152's clustered SemDeDup, each
                             // individually drill-gated; the composition
                             // gates as a text lane (splice inflates token
                             // volume, and the q50 stage is volume-bound)
    "q152_semdedup")         // embeddings (r15): SemDeDup — the dedup
                             // family's embedding-leg SCALING path. With
                             // √n-stride seeding, kernel work (assignment
                             // argmax + within-cluster pairs) is Θ(n^1.5)
                             // total = Θ(√n)/row, but at drill scale
                             // (2k→20k × 64-dim) the ~31× kernel growth
                             // vanishes into 32-thread map stages:
                             // pre-measured 1.28 at 10×, gated at 2.5.
                             // Production at 100 TB fixes k (the
                             // published method's regime: assignment
                             // O(n·k), pairs O(n²/k)) instead of √n —
                             // the √n spelling keeps the lane self-sizing
                             // across SFs without a tuning knob.

  /** Drill lanes measured for VISIBILITY but EXPECTED superlinear: the ratio
    * is a documented property of the spelling, not a regression, so Bench
    * excludes these from the failure gate and records them under a separate
    * `known_superlinear` key in bench_detail.json — failures[] stays
    * empty-unless-regression (r6 ADVICE #1; a permanently red list would
    * dilute the gate's ship-blocking signal from day one). */
  val knownSuperlinear: Map[String, String] = Map(
    "q107_percentile_builtin_drill" ->
      ("built-in percentile buffers per-distinct-value counts per group " +
        "(r6 measured 24.5x at 10x data); since r10 the q107 NAME resolves " +
        "to the sharded q112 plan and this buffer spelling exists ONLY as " +
        "this drill lane — measured so the documented caveat stays a " +
        "number, unreachable so no user plan carries it"),
    "q121_fuzzy_pairs" ->
      ("blocked-ER comparisons cost min(Σ|block|², cap·n): fixed-cardinality " +
        "blocking keys make block sizes grow WITH the corpus, so the 1×→10× " +
        "window sits in the quadratic regime until blocks saturate the " +
        "1000-member cap, after which cost is linear (cap·n). The exact-oracle " +
        "lane keeps the blocked-DP shape; q50 MinHash banding is the declared " +
        "scale path for fuzzy candidates at 100 TB"))

  /** The documents replication transform (shared by [[materialize]] and the
    * [[textProbe]] documents-only materialization): ids shift by copy; a
    * copy-specific token splices after every 4th word so cross-copy
    * shingles break (see the object scaladoc's structure-invariance
    * argument). Expects a `copy` column. */
  private def spliceDocs(d: DataFrame, maxDoc: Long): DataFrame =
    d.withColumn("doc_id", col("doc_id") + col("copy") * maxDoc)
      .withColumn("text",
        when(col("copy") === 0 || col("text").isNull, col("text"))
          .otherwise(concat_ws(" ",
            transform(split(trim(col("text")), "\\s+"),
              (w, i) => when(i % 4 === 3,
                concat(w, lit(" zc"), col("copy"))).otherwise(w)))))

  /** LINEAR-VOLUME documents transform (r12 verdict #5): REPLACE every 4th
    * word with the copy token instead of splicing one in beside it. Token
    * and bigram COUNTS are preserved exactly, so a `factor`× copy carries
    * exactly `factor`× text volume — the corpus-statistics lanes can then
    * be gated at the plain 2.5 bar instead of leaning on the measured
    * splice-volume ratio. Cross-copy near-dup structure degrades the same
    * way splice's does (any 5 consecutive words contain a replaced
    * position, so 5-shingles break across copies; the surviving ~1/4 of
    * 3-shingles put cross-copy Jaccard at ≈0.14, far under the 0.6
    * confirm threshold), and within-copy duplicate pairs transform
    * identically on both sides so they stay duplicates. */
  private def replaceDocs(d: DataFrame, maxDoc: Long): DataFrame =
    d.withColumn("doc_id", col("doc_id") + col("copy") * maxDoc)
      .withColumn("text",
        when(col("copy") === 0 || col("text").isNull, col("text"))
          .otherwise(concat_ws(" ",
            transform(split(trim(col("text")), "\\s+"),
              (w, i) => when(i % 4 === 3,
                concat(lit("zc"), col("copy"))).otherwise(w)))))

  /** Write a `factor`× scale copy of the drill tables under `outDir`.
    * factor=1 writes a verbatim copy — the like-for-like base side. */
  def materialize(s: SparkSession, sfDir: String, outDir: String, factor: Int): Unit = {
    require(factor >= 1, s"factor $factor must be >= 1")
    val copies = broadcast(s.range(0, factor).select(col("id").as("copy")))
    // one file per core: the unit of parallel parquet read is the row group,
    // and these tables are far under the 128 MB row-group size — a
    // single-file write would pin every downstream map stage to one core
    val nFiles = s.sparkContext.defaultParallelism

    def scaled(table: String)(f: DataFrame => DataFrame): Unit = {
      val base = Tables(s, sfDir, table)
      f(base.crossJoin(copies)).drop("copy")
        .select(base.columns.map(col).toIndexedSeq: _*)
        .repartition(nFiles)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }

    val maxDoc = Tables(s, sfDir, "documents").agg(max("doc_id")).first().getLong(0) + 1
    scaled("documents")(spliceDocs(_, maxDoc))

    val maxVec = Tables(s, sfDir, "embeddings").agg(max("vec_id")).first().getLong(0) + 1
    scaled("embeddings") { d =>
      d.withColumn("vec_id", col("vec_id") + col("copy") * maxVec)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x + pmod(xxhash64(col("copy"), i), lit(997)).cast("double") / 100000.0)
              .cast("float")))
    }

    val maxOrder = Tables(s, sfDir, "orders").agg(max("o_orderkey")).first().getLong(0) + 1
    scaled("orders")(d => d.withColumn("o_orderkey", col("o_orderkey") + col("copy") * maxOrder))
    scaled("lineitem")(d => d.withColumn("l_orderkey", col("l_orderkey") + col("copy") * maxOrder))

    val maxUser = Tables(s, sfDir, "events").agg(max("user_id")).first().getLong(0) + 1
    scaled("events")(d => d.withColumn("user_id", col("user_id") + col("copy") * maxUser))

    // dimension tables ride along verbatim (fact FKs still resolve; dims
    // don't grow with fact scale) so Tables.registerAll works against a
    // drill dir — q107 reaches lineitem through the SQL catalog
    val scaledTables = Set("documents", "embeddings", "orders", "lineitem", "events")
    Tables.names.filterNot(scaledTables).foreach { t =>
      Tables(s, sfDir, t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Drill lanes that exist ONLY here (not in SparkEntry.queries): the
    * buffer-based percentile built-in, kept measurable after r10 defaulted
    * the q107 name to the sharded plan (r9 verdict #2). */
  val extraDrillQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_percentile_builtin_drill" ->
      (graft.operators.Relational.q107PercentileDiscBuiltin _))

  /** A gated lane whose best-of-two ratio lands above this re-measures one
    * extra interleaved pair. r9 shipped 3.12 (q112) and 3.62 (q116) drill
    * ratios that an idle-host re-measure put at 1.7 / 1.9 — the drill runs
    * at the END of the bench JVM, where one GC/host burst across both ×N
    * timings fakes a superlinear lane. 2.5 is the bar the verdict holds
    * gated lanes to, so anything above it earns the third pair BEFORE the
    * artifact records it; a REAL superlinear lane fails the extra pair
    * identically (r9 verdict #1). */
  val remeasureRatio: Double = 2.5

  /** Gated lanes whose drill input is the DOCUMENTS table: the splice
    * tokens that keep near-dup structure scale-invariant also ADD tokens,
    * so the ×N side carries MORE than N× text volume (12.2× bigrams at
    * N=10) and a perfectly linear plan legitimately shows a time ratio up
    * to the VOLUME ratio, not the row factor. Their gate therefore
    * compares the time ratio to the measured volume ratio — in the
    * artifact, not in prose (r11 verdict #2: q116 sat above the 2.5 bar
    * three recorded rounds running with the vol-ratio division left to a
    * human). */
  val textLanes: Set[String] =
    Set("q50_neardup_confirmed", "q92_cdc_passages", "q116_bigram_rarity",
      "curation_flow", "q151_decode_ivf", "q156_curation_neardup",
      "q161_exact_substr_spans", "q163_exact_substr_trim",
      "q164_neardup_aware_split", "q167_curation_trimmed",
      "q168_bpe_train", "q169_quality_classifier", "q170_bpe_tokenize",
      "q172_bpe_artifact", "q173_bpe_encode_unseen",
      "q174_nb_model_artifact", "q175_curated_split")

  /** The self-adjudicating PASS bar per gated lane: sublinear-per-input.
    * Text lanes pass while time ratio ≤ the measured bigram-volume ratio
    * (linear in true input volume); row-factor lanes keep the verdict's
    * 2.5 bar. Recorded per lane in bench_detail as `bar` + `gate_ok`. */
  def gateBar(name: String, volRatio: Double): Double =
    if (textLanes(name) && volRatio > 0) volRatio else remeasureRatio

  /** The rc-failure bar (Bench exits nonzero above it): the full
    * linear-cost ratio — the row factor for row lanes, the measured
    * volume ratio for text lanes (for text lanes the pass bar and the
    * failure bar coincide: superlinear-in-volume at 10× IS a scale bug). */
  def failBar(name: String, factor: Int, volRatio: Double): Double =
    if (textLanes(name) && volRatio > 0) volRatio else factor.toDouble

  /** Burst re-measure trigger: a quarter of the linear-cost bar (2.5-of-10
    * for row lanes — unchanged; volRatio/4 for text lanes, the probe's
    * proportion) so a contention burst earns a third pair well before the
    * pass bar is at stake. */
  def remeasureBar(name: String, volRatio: Double): Double =
    if (textLanes(name) && volRatio > 0) volRatio / 4.0 else remeasureRatio

  /** Run the drill: materialize a 1× and a `factor`× copy under `outDir`
    * (subdirs `base1x` / `scaled`), then time each query on both,
    * interleaved best-of-two. Returns (name, baseSec, scaledSec, pairs)
    * rows — `pairs` records how many interleaved (base, ×N) pairs the lane
    * consumed, so a re-measured ratio is visible as such in the artifact.
    * Persisted state is swept between executions exactly like the bench
    * passes, so one query's working set never pollutes another's ratio. */
  def run(s: SparkSession, sfDir: String, outDir: String, factor: Int,
          wallFence: Map[String, Double] = Map.empty): (Seq[(String, Double, Double, Int)], Long, Long) = {
    val baseDir = s"$outDir/base1x"
    val bigDir = s"$outDir/scaled"
    materialize(s, sfDir, baseDir, 1)
    materialize(s, sfDir, bigDir, factor)
    // Measured denominator for the text lanes (r10 verdict #6): the splice
    // tokens that keep near-dup structure scale-invariant also ADD tokens,
    // so the ×N documents side carries MORE than N× bigrams (12.2× at N=10
    // per the r9 probe) — without this number in the artifact, q116's
    // reproducible ~3.2 reads as 'above the 2.5 bar' instead of '~0.26× of
    // linear in its true input volume'. Two cheap aggregations.
    val volBase = bigramVolume(s, baseDir)
    val volBig = bigramVolume(s, bigDir)
    def once(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSession.releasePersisted(s)
      sec
    }
    val volRatio = if (volBase > 0) volBig.toDouble / volBase else -1.0
    val all = drillQueries.map(n => n -> SparkEntry.baseQueries(n)) ++
      extraDrillQueries.toSeq :+ ("curation_flow" -> curationFlow)
    val rows = all.map { case (name, fn) =>
      // UNTIMED warmup to CONVERGENCE per side (r18, was one fixed pair
      // since r15): a single settle execution is not enough for the
      // codegen-heaviest lanes — the drill phase loads ~13.5k generated
      // classes and logs 366 s of JIT-compiler time against 413 s of wall
      // (bench_detail, r18 run 1), so a timed pass that starts while the
      // C2 queue is still draining executes INTERPRETED generated loops:
      // q114's isolated idle-host reps read {11.8, 5.7, 2.1, 1.8} on the
      // x10 side — the THIRD pass is the first compiled one — and the r18
      // recorded gate flagged its ratio at 3.11 (x10 4.33 vs base 1.39,
      // pairs=3) on a plan whose converged ratio is ~1.2. Warm each side
      // until a pass stops improving by >25% (cap 3 extra passes), so
      // compilation happens off the clock on BOTH sides — matching how a
      // long-lived cluster actually serves — and the timed pairs measure
      // plans, not the compile queue. Known-superlinear lanes are
      // recorded-not-gated and keep the cheap single-pair warm.
      def settle(dir: String): Unit = {
        // ADVICE r18: compare against the RUNNING MINIMUM, not the previous
        // pass — a noisy slow pass must not reset the comparison point (the
        // old `prev = cur` let cur > prev mask continued convergence, so a
        // steadily-but-slowly converging lane stopped warming while still
        // in the compile-queue regime).
        var best = once(fn, dir)
        var extra = 0
        var improving = true
        while (improving && extra < 3) {
          val cur = once(fn, dir)
          improving = cur < best * 0.75
          best = math.min(best, cur)
          extra += 1
        }
      }
      if (knownSuperlinear.contains(name)) { once(fn, baseDir); once(fn, bigDir) }
      else { settle(baseDir); settle(bigDir) }
      val b1 = once(fn, baseDir); val x1 = once(fn, bigDir)
      val b2 = once(fn, baseDir); val x2 = once(fn, bigDir)
      var (b, x) = (math.min(b1, b2), math.min(x1, x2))
      var pairs = 2
      // known-superlinear lanes are recorded, not gated — an extra pair
      // there buys nothing and the ×N side is the drill's most expensive
      // timing, so only gated queries earn the re-measure
      if (x > b * remeasureBar(name, volRatio) && !knownSuperlinear.contains(name)) {
        val b3 = once(fn, baseDir); val x3 = once(fn, bigDir)
        b = math.min(b, b3); x = math.min(x, x3)
        pairs = 3
      }
      // Cross-run x10-WALL fence adjudication while the drill dirs still
      // exist (r18): Bench passes each gated lane's fence threshold (best
      // × fenceX, +0.5 s floor); a lane whose min-of-pairs would flag it
      // earns one extra pair — a codegen-mode flap (the r18 rotating-fence
      // population: 1.6–2× spreads on curation_flow/q113/q56/q117/q94,
      // every one clearing on the adjacent same-code run) clears on the
      // immediate retry, a real slowdown persists and flags with the
      // extra-pair evidence recorded in `pairs`.
      if (wallFence.get(name).exists(x > _) && !knownSuperlinear.contains(name)) {
        val b4 = once(fn, baseDir); val x4 = once(fn, bigDir)
        b = math.min(b, b4); x = math.min(x, x4)
        pairs += 1
      }
      (name, b, x, pairs)
    }
    // Stage attribution, GENERALIZED to every gated lane (r11 verdict #6:
    // q99 recorded 5.11 with no attribution because the old hook was
    // curation-specific): any gated lane whose post-re-measure ratio stays
    // above its PASS bar earns one extra pair driven through the executed
    // plan with SQL timing metrics aggregated per physical operator — the
    // artifact then names WHICH operator carries the ratio. curation_flow
    // additionally keeps its composed-stage prefix timings (the operator
    // metrics of a multi-query funnel attribute less cleanly than its
    // stage cut). pairs=1 marks the weaker evidence; Bench records these
    // under a separate key and excludes them from failure math.
    // attribution is DIAGNOSTIC ONLY: a throw here (the profile re-runs
    // the lane's most expensive execution) must not discard the completed
    // drill measurements or trip Bench's crash path — degrade to
    // no-attribution and note it on stderr
    val attribution = rows.filterNot(r => knownSuperlinear.contains(r._1)).flatMap {
      case (name, b, x, _) if x > b * gateBar(name, volRatio) =>
        try {
          val fn = if (name == "curation_flow") curationFlow
            else SparkEntry.baseQueries.getOrElse(name, extraDrillQueries(name))
          val baseProf = planTimeProfile(s, fn, baseDir)
          val bigProf = planTimeProfile(s, fn, bigDir)
          val top = bigProf.toSeq.sortBy(-_._2).take(6)
          // a node absent from the 1x profile (AQE picked a different
          // operator at 10x, or its base timing was 0) records base -1 —
          // Bench renders its ratio as -1 instead of a divide-by-epsilon
          val opRows = top.map { case (node, xs) =>
            (s"attr:$name:$node", baseProf.getOrElse(node, -1.0), xs, 1)
          }
          val curRows = if (name == "curation_flow")
            curationStagePrefixes.map { case (stage, pfn) =>
              val pb = once(pfn, baseDir); val px = once(pfn, bigDir)
              (s"attr:$name:stage_$stage", pb, px, 1)
            } else Seq.empty
          opRows ++ curRows
        } catch { case e: Throwable =>
          System.err.println(s"[drill] attribution for $name failed: ${e.getMessage}")
          GraftSession.releasePersisted(s)
          Seq.empty
        }
      case _ => Seq.empty
    }
    (rows ++ attribution, volBase, volBig)
  }

  /** Operator-level time profile of one lane on one dataset: drive the
    * lane's OWN QueryExecution to completion (the Prof trick — a .write
    * would build a fresh one and leave this plan's metrics empty), then
    * walk the adaptive executed plan — through AQE wrapper and query-stage
    * nodes — summing each node's SQL TIMING metrics per node name.
    * Seconds per operator kind; diagnostic only (metric coverage varies by
    * operator — scan/sort/agg/exchange all carry timings). */
  private[graft] def planTimeProfile(s: SparkSession,
      fn: (SparkSession, String) => DataFrame, dir: String): Map[String, Double] = {
    try {
      val qe = fn(s, dir).queryExecution
      qe.toRdd.foreach(_ => ())
      ScanAudit.walk(qe.executedPlan)
        .map { p =>
          val sec = p.metrics.values.map { m =>
            m.metricType match {
              case "timing" => m.value / 1000.0
              case "nsTiming" => m.value / 1e9
              case _ => 0.0
            }
          }.sum
          p.nodeName -> sec
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        .filter(_._2 > 0.0)
    } finally GraftSession.releasePersisted(s)
  }

  /** Cumulative stage prefixes of [[curationFlow]] (same operators, same
    * constants as Curation.curate with the drill's quota) — timed only when
    * the composed lane's drill ratio exceeds [[remeasureRatio]], so the
    * recorded number arrives stage-attributed. Ratios are cumulative: the
    * stage that JUMPS relative to its predecessor is the carrier. */
  private[graft] val curationStagePrefixes: Seq[(String, (SparkSession, String) => DataFrame)] = {
    def passers(sp: SparkSession, d: String): DataFrame = {
      val input = graft.operators.Scale.ensureParallel(Tables(sp, d, "documents"))
      val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
        .cast("double") / length(col("text"))
      input.filter(col("text").isNotNull && length(trim(col("text"))) > 0 &&
        alpha >= 0.45)
    }
    def deduped(sp: SparkSession, d: String): DataFrame = {
      val q = passers(sp, d)
      val keepers = q
        .select(graft.operators.Dedup.contentFp(col("text")).as("__fp"), col("doc_id"))
        .groupBy("__fp").agg(min("doc_id").as("doc_id"))
      q.withColumn("__fp", graft.operators.Dedup.contentFp(col("text")))
        .join(keepers, Seq("__fp", "doc_id"), "left_semi").drop("__fp")
    }
    def clean(sp: SparkSession, d: String): DataFrame = {
      val benchmark = Tables(sp, d, "documents")
        .filter(col("doc_id") % 100 === 0).select("doc_id", "text")
      deduped(sp, d).join(
        graft.operators.Dedup.contaminatedIds(passers(sp, d), benchmark)
          .select("doc_id"),
        Seq("doc_id"), "left_anti")
    }
    Seq(
      "quality"  -> ((sp: SparkSession, d: String) => passers(sp, d)),
      "dedup"    -> ((sp: SparkSession, d: String) => deduped(sp, d)),
      "decontam" -> ((sp: SparkSession, d: String) => clean(sp, d)),
      "quota"    -> ((sp: SparkSession, d: String) =>
        graft.operators.TextAnalysis.quotaCap(
          clean(sp, d), "source", "doc_id", "curate", 1000000)))
  }

  /** The composed curation flow as a (session, dir) => frame lambda — the
    * drill's end-to-end lane, also reachable from [[Prof]] by the name
    * "curation_flow". Timing it through a write covers BOTH curate()'s
    * internal funnel materialization and the caller-side output write. */
  val curationFlow: (SparkSession, String) => DataFrame = (sp, d) => {
    val docs = Tables(sp, d, "documents")
    val benchmark = docs.filter(col("doc_id") % 100 === 0).select("doc_id", "text")
    graft.operators.Curation.curate(docs, benchmark, quotaPerSource = 1000000)._1
  }

  // ---------------------------------------------- q157 serve-scale probe

  /** The q157 saved-index serve cost, measured ∝ QUERIES (r17 verdict #7):
    * build the index ONCE over `sfDir`'s embeddings, then serve an
    * EXTERNAL query batch of Q and one of `factor`·Q against the same
    * artifact — interleaved best-of-two after one untimed warm pair (the
    * drill's discipline). AnnIndexSpec pins the serve plan's scan shape
    * (nprobe code partitions + Q·R rerank rows, embeddings untouched);
    * this records the wall-clock counterpart: the ratio should sit well
    * under `factor` (per-query probe work is identical; fixed overhead
    * amortizes across the bigger batch). Queries are corpus vectors
    * deterministically perturbed and id-shifted out of the corpus
    * namespace — external vectors, never corpus rows.
    * Returns (q, bestSec at Q, bestSec at factor·Q). */
  def serveScale(s: SparkSession, sfDir: String, factor: Int = 10,
                 q: Int = 20): (Int, Double, Double) = {
    import graft.operators.Similarity
    val e = Tables(s, sfDir, "embeddings").select(col("vec_id"),
      graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
    val path = Similarity.indexPathFor(sfDir) + "_servescale"
    Similarity.writeIndex(e, path)
    val idx = Similarity.loadIndex(s, path)
    def queries(n: Int): DataFrame =
      e.filter(col("vec_id") < n).select(
        (col("vec_id") + 1000000L).as("qid"),
        transform(col("v"), (x, i) =>
          x + pmod(xxhash64(col("vec_id"), i), lit(997)).cast("double") / 100000.0)
          .as("qv"))
    def once(n: Int): Double = {
      val t0 = System.nanoTime()
      Similarity.searchIndex(idx, queries(n))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSession.releasePersisted(s)
      sec
    }
    once(q); once(q * factor) // untimed warm pair: compile off the clock
    val b1 = once(q); val x1 = once(q * factor)
    val b2 = once(q); val x2 = once(q * factor)
    (q, math.min(b1, b2), math.min(x1, x2))
  }

  // ------------------------------------------------- 30× text-stack probe

  /** The corpus-statistics lanes whose 100 TB story rests on salted joins /
    * broadcast count tables — probed at a SECOND scale point (r9 verdict
    * #6: the 10× drill's splice tokens inflate bigram volume 12.2×, which
    * makes a 10×-window exponent unreadable; a 30× point with the measured
    * volume ratio beside it is). All three read ONLY the documents table. */
  val textProbeQueries: Seq[String] =
    Seq("q116_bigram_rarity", "q131_contamination_score", "q98_bigram_lm")

  /** Exact bigram volume of a documents dir — the denominator that turns a
    * raw time ratio into a per-volume exponent: the splice tokens that keep
    * dedup structure scale-invariant ALSO add tokens, so `factor`× copies
    * carry MORE than `factor`× bigrams and a linear plan legitimately
    * shows ratio ≈ volume ratio, not ≈ factor. */
  def bigramVolume(s: SparkSession, dir: String): Long =
    Tables(s, dir, "documents").filter(col("text").isNotNull)
      .select(greatest(size(split(trim(lower(col("text"))), "\\s+")) - 1, lit(0)).as("nb"))
      .agg(sum(col("nb").cast("long"))).first().getLong(0)

  /** Materialize ONLY the documents table (the probe tables' whole input)
    * at `factor`× — splice transform by default (the full drill's mode);
    * `linear = true` uses [[replaceDocs]] for exactly-linear volume. */
  def materializeDocuments(s: SparkSession, sfDir: String, outDir: String,
                           factor: Int, linear: Boolean = false): Unit = {
    val copies = broadcast(s.range(0, factor).select(col("id").as("copy")))
    val base = Tables(s, sfDir, "documents")
    val maxDoc = base.agg(max("doc_id")).first().getLong(0) + 1
    val xform = if (linear) replaceDocs _ else spliceDocs _
    xform(base.crossJoin(copies), maxDoc).drop("copy")
      .select(base.columns.map(col).toIndexedSeq: _*)
      .repartition(s.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** Run the text probe: fresh 1× and `factor`× documents copies, each
    * probe query timed interleaved best-of-two (plus one re-measure pair
    * above volRatio/4 — the drill's burst logic at the probe's scale), and
    * the bigram volume of both sides measured exactly. With
    * `linear = true` the copies are replacement-mode (exactly `factor`×
    * volume) — the r13 TEXT GATE mode: Bench gates those ratios at the
    * plain 2.5 bar, no volume normalization needed (r12 verdict #5).
    * Returns (rows = (name, baseSec, scaledSec, pairs), baseVol, scaledVol). */
  def textProbe(s: SparkSession, sfDir: String, outDir: String,
                factor: Int = 30, linear: Boolean = false): (Seq[(String, Double, Double, Int)], Long, Long) = {
    val baseDir = s"$outDir/base1x"
    val bigDir = s"$outDir/scaled"
    materializeDocuments(s, sfDir, baseDir, 1, linear)
    materializeDocuments(s, sfDir, bigDir, factor, linear)
    val volBase = bigramVolume(s, baseDir)
    val volBig = bigramVolume(s, bigDir)
    def once(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSession.releasePersisted(s)
      sec
    }
    // a linear-in-volume plan may cost up to ~volRatio× (not factor×), so
    // the burst re-measure bar scales with the measured volume inflation:
    // a quarter of the full linear-cost ratio — the same proportion as the
    // drill's 2.5-of-10 bar
    val volRatio = volBig.toDouble / math.max(1L, volBase)
    val rows = textProbeQueries.map { name =>
      val fn = SparkEntry.baseQueries(name)
      val b1 = once(fn, baseDir); val x1 = once(fn, bigDir)
      val b2 = once(fn, baseDir); val x2 = once(fn, bigDir)
      var (b, x) = (math.min(b1, b2), math.min(x1, x2))
      var pairs = 2
      if (x > b * volRatio / 4.0) {
        val b3 = once(fn, baseDir); val x3 = once(fn, bigDir)
        b = math.min(b, b3); x = math.min(x, x3)
        pairs = 3
      }
      (name, b, x, pairs)
    }
    (rows, volBase, volBig)
  }

  // ------------------------------------------------ linear-marginal gate

  /** Bar for the marginal-cost ratio m_hi/m_lo: a truly-linear plan shows
    * 1.0 (the intercept cancels exactly); n²/all-pairs shows
    * (v_hi+v_lo)/(v_lo+v_1) ≈ 3.6 at (1×,10×,30×) REGARDLESS of intercept
    * — caught with 2.4× margin. n·log n at corpus n is locally
    * near-linear (≈1.1–1.2 over one 3× window) and sits deliberately
    * inside the bar: sort-shaped cost is not a polynomial scale-killer.
    * Bar history: 1.3 through r14 on r13's measured ≲1.2 best-of-2 noise,
    * raised to 1.5 in r15 on more data — four same-code clean-host runs
    * put q131's ratio at 1.20/1.29/1.08/1.37 (the statistic is a quotient
    * of two SMALL wall-time differences, so its noise envelope is wider
    * than any single timing's): a bar inside the envelope flips red on a
    * third of healthy runs, while every convexity this gate exists to
    * catch (the r6 motivating case measured 24.5× wall at 10×) clears
    * 1.5 by an order of magnitude. */
  val marginalBar: Double = 1.5

  /** Noise floor for resolving the low-window marginal: if the 1×→lo×
    * wall-time delta is under this, the lane is overhead-dominated even
    * at lo× volume and the marginal ratio is numerically meaningless —
    * the gate falls back to the unarguable wall backstop t_hi ≤ hi·t_1. */
  val marginalNoiseFloorSec: Double = 0.2

  /** r13 TEXT GATE, final form. The first form gated the wall-clock ratio
    * at 10× linear volume against the drill's 2.5 bar — but that bar is
    * only satisfiable when fixed per-query overhead c is ≥5× the
    * per-volume marginal cost m ((c+10m)/(c+m) ≤ 2.5 ⇔ c ≥ 5m), so it
    * passes overhead-dominated lanes REGARDLESS of their scaling law (an
    * n² lane with c ≥ 20m still shows ratio <6) and fails honestly-linear
    * lanes whose real per-token work dominates — measured: the three
    * corpus-statistics lanes ran 2.6–2.9 at exactly-10× volume with
    * log-slopes of only 0.28–0.47. This form cancels the intercept
    * instead: replacement-mode copies at 1×/lo×/hi× give exact volumes,
    * and the gate compares the marginal cost per added bigram across the
    * two windows, m_lo = (t_lo−t_1)/(v_lo−v_1) vs m_hi =
    * (t_hi−t_lo)/(v_hi−v_lo). Linear ⇒ m_hi/m_lo ≈ 1 no matter the
    * intercept; any convex cost curve pushes it above [[marginalBar]].
    * Strictly harder than the wall-ratio bar AND immune to its
    * false-positives/negatives. Wall ratios stay in the artifact as
    * context. Returns (rows = (name, t1, tLo, tHi, pairs), v1, vLo, vHi). */
  def textMarginal(s: SparkSession, sfDir: String, outDir: String,
                   lo: Int = 10, hi: Int = 30)
      : (Seq[(String, Double, Double, Double, Int)], Long, Long, Long) = {
    val d1 = s"$outDir/base1x"; val dLo = s"$outDir/lo"; val dHi = s"$outDir/hi"
    materializeDocuments(s, sfDir, d1, 1, linear = true)
    materializeDocuments(s, sfDir, dLo, lo, linear = true)
    materializeDocuments(s, sfDir, dHi, hi, linear = true)
    val v1 = bigramVolume(s, d1)
    val vLo = bigramVolume(s, dLo)
    val vHi = bigramVolume(s, dHi)
    def once(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(s, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSession.releasePersisted(s)
      sec
    }
    val rows = textProbeQueries.map { name =>
      val fn = SparkEntry.baseQueries(name)
      // interleaved best-of-2 (the drill's pairing discipline: a host
      // burst inflating one side's timings fakes a superlinear marginal)
      var t1 = once(fn, d1); var tLo = once(fn, dLo); var tHi = once(fn, dHi)
      val (a1, aLo, aHi) = (once(fn, d1), once(fn, dLo), once(fn, dHi))
      t1 = math.min(t1, a1); tLo = math.min(tLo, aLo); tHi = math.min(tHi, aHi)
      var pairs = 2
      if (!marginalOk(t1, tLo, tHi, v1, vLo, vHi)) {
        val (b1, bLo, bHi) = (once(fn, d1), once(fn, dLo), once(fn, dHi))
        t1 = math.min(t1, b1); tLo = math.min(tLo, bLo); tHi = math.min(tHi, bHi)
        pairs = 3
      }
      (name, t1, tLo, tHi, pairs)
    }
    (rows, v1, vLo, vHi)
  }

  /** Marginal ratio m_hi/m_lo for the gate's artifact row; −1 when the
    * low-window delta is under the noise floor (overhead-dominated).
    * A negative HIGH-window delta (tHi < tLo — timing noise on a
    * sub-linear lane) clamps to 0.0 rather than rendering a negative
    * ratio: the −1 sentinel stays exclusively "low window unresolvable"
    * so the artifact's marginal_ratio field is unambiguous (r13 ADVICE #5). */
  def marginalRatio(t1: Double, tLo: Double, tHi: Double,
                    v1: Long, vLo: Long, vHi: Long): Double = {
    val dLo = tLo - t1
    if (dLo < marginalNoiseFloorSec) -1.0
    else {
      val mLo = dLo / math.max(1L, vLo - v1)
      val mHi = (tHi - tLo) / math.max(1L, vHi - vLo)
      math.max(0.0, mHi / mLo)
    }
  }

  /** The per-lane PASS rule: marginal ratio ≤ [[marginalBar]], or — when
    * the low window can't resolve a marginal — the wall backstop
    * t_hi ≤ (v_hi/v_1)·t_1 (fully-linear wall cost). */
  def marginalOk(t1: Double, tLo: Double, tHi: Double,
                 v1: Long, vLo: Long, vHi: Long): Boolean = {
    val r = marginalRatio(t1, tLo, tHi, v1, vLo, vHi)
    if (r < 0) tHi <= t1 * (vHi.toDouble / math.max(1L, v1))
    else r <= marginalBar
  }
}
