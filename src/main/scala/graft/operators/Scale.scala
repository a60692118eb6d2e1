package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scale utilities: the shuffle-engineering layer for 100 TB operation.
  *
  * AQE covers the common cases at runtime (skew-join splitting, partition
  * coalescing, join-strategy switching — enabled in GraftSession). These are
  * the explicit tools for the cases AQE can't fix:
  *  - saltedJoin: a hot key inside a SHUFFLED join that must stay shuffled
  *    (e.g. streaming state, or both sides too big to broadcast) — AQE can
  *    split skewed shuffle blocks, but salting prevents the hot block from
  *    ever existing, and works in stateful streaming where AQE doesn't.
  *  - bucketing: repeated joins/aggregations on the same key amortize ONE
  *    layout shuffle across every later query — co-located scans join with
  *    zero exchanges.
  */
object Scale {

  /** Guarantee a frame's evaluation parallelism is at least the session's
    * core count before heavy per-row work (explode fan-out, regex
    * tokenization, hash kernels).
    *
    * The trap this closes: map-side parallelism is gated on the SOURCE
    * LAYOUT, not on cores. A parquet file smaller than the writer's row-group
    * size holds ONE row group, and a row group is the unit of parallel read —
    * so a scan of few small files runs its entire map chain (however
    * expensive per row) on one or two cores, no matter how many are idle.
    * That is the classic small-files / unsplittable-input under-parallelism
    * problem (same shape as a gzip input), and the r5 10× scale drill hit it
    * exactly: the drill corpus is one file per table, so every document
    * operator's shingle/token explode ran single-threaded at BOTH scales and
    * wall-clock grew linearly with data — recorded as the q92/curation_flow
    * blow-up.
    *
    * The `rdd.getNumPartitions` probe is free ONLY for an exchange-free
    * (scan-rooted) plan: there it is physical planning, no job. With AQE
    * enabled, `.rdd` on a plan CONTAINING exchanges executes the upstream
    * shuffle stages eagerly (AQE must run them to pick the final plan), and
    * it throws outright on a streaming frame — so this helper probes only
    * when the optimized plan has no shuffle-inducing node and is a no-op
    * otherwise (a post-shuffle subtree already evaluates with the session's
    * configured shuffle parallelism, so there is nothing to fix there
    * anyway; r6 ADVICE #3). When the probe does fire and finds fewer live
    * partitions than half the session's cores (every real cluster scan of
    * TB-scale data has plenty), the under-parallel input gets one
    * round-robin exchange — paid once, before the fan-out multiplies the
    * bytes. */
  def ensureParallel(d: DataFrame): DataFrame = {
    if (d.isStreaming) return d
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Deduplicate, Distinct, GlobalLimit, Join, RepartitionOperation, Sort}
    val mayExchange = d.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Deduplicate | _: Sort |
           _: GlobalLimit | _: RepartitionOperation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Window => true
      case _ => false
    }
    if (mayExchange) return d
    val target = d.sparkSession.sparkContext.defaultParallelism
    if (d.rdd.getNumPartitions * 2 <= target) d.repartition(target) else d
  }

  /** Salted equi-join: big side gets a uniform salt in [0, salt); small side
    * is replicated `salt` ways; join key becomes (key, salt). The hot key's
    * rows land in `salt` different partitions instead of one. Result is
    * row-identical to big.join(small, key) — only the partitioning differs.
    *
    * Salt derivation is deterministic from the row's partition+offset (no
    * rand(): retries/replays produce the same placement). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int = 16): DataFrame = {
    val salted = big.withColumn(
      "_salt", pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(salt)))
    val replicated = small.withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Per-key frequency above a threshold — the skew detector used to decide
    * when saltedJoin (or a broadcast of the hot subset) is worth it. */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).filter(col("n") >= minCount)

  /** Write `df` as a bucketed+sorted catalog table: one layout shuffle now,
    * zero exchanges for every later equi-join/agg on `key` between tables
    * bucketed the same way. The on-disk contract a 1000-executor cluster
    * leans on for fact-fact joins too big to broadcast. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: with bucketing
    * enabled this plans as SortMergeJoin over the pre-bucketed scans with NO
    * ShuffleExchange on either side. */
  def bucketedJoin(s: SparkSession, left: String, right: String, key: String): DataFrame =
    s.table(left).join(s.table(right), Seq(key))

  /** Bloom-pruned semi-join: the runtime-filter pattern for big-probe /
    * medium-build joins where the build side is too large to broadcast as
    * rows but its KEY SET fits in a bloom filter (megabytes for tens of
    * millions of keys at 1% fpp).
    *
    *   1. build side: distributed `stat.bloomFilter` over xxhash64(key) —
    *      the only thing collected to the driver is the compact sketch;
    *   2. probe side: filter through the native codegen'd
    *      [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    *      (the same expression Spark's own injected runtime filters use),
    *      evaluated AT THE SCAN — before any exchange;
    *   3. exact LEFT SEMI join confirms survivors (the bloom admits ~fpp
    *      false positives; it is a shuffle-reducer, never the correctness
    *      boundary).
    *
    * At 100 TB the win is step 2: a 1% - selective build side means ~99% of
    * probe rows die in the scan stage and never enter the semi-join
    * shuffle. Spark's AQE injects this automatically only under a narrow
    * set of conditions (shuffle-stage reuse, creation-side thresholds);
    * this operator states it explicitly so the plan is guaranteed.
    *
    * Hash contract: build inserts `putLong(xxhash64(key))`, probe tests
    * `mightContainLong(xxhash64(key))` — the identical (seed-42) hash on
    * both sides, and the identical serialized format (`BloomFilter
    * .writeTo`/`readFrom`) the expression deserializes. */
  def bloomPrunedSemiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame =
    probe.filter(bloomMightContain(build, buildKey, probeKey, expectedItems, fpp))
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")

  /** The probe-side predicate of [[bloomPrunedSemiJoin]]: a codegen'd
    * `might_contain(bloom, xxhash64(key))` over a bloom built (distributed)
    * from the build side's key set. Exposed separately so the pruning
    * effectiveness is testable on its own.
    *
    * `expectedItems = 0` (default) sizes the bloom from a count of the
    * build side: one cheap extra job on the dim, and the bloom literal in
    * the probe plan shrinks from a fixed worst case to ~1.2 bytes/key —
    * an oversized bloom ships with EVERY probe task's binary (Spark warns
    * "Broadcasting large task binary" above 1 MB). Pass it explicitly when
    * the build cardinality is already known. The build side is persisted
    * across the sizing count and the bloom aggregation (released before
    * returning), so auto-sizing costs one extra CACHED pass, not a second
    * scan of the dim.
    *
    * NOTE: the bloom must exist before the probe plan can reference it, so
    * calling this (or [[bloomPrunedSemiJoin]]) runs the build-side jobs
    * EAGERLY at plan-construction time — unlike everything else in this
    * library, the returned Column is not fully lazy. (Spark's own injected
    * runtime filters defer via a scalar subquery; an explicit operator
    * trades that laziness for a guaranteed scan-stage filter.) */
  def bloomMightContain(build: DataFrame, buildKey: String, probeKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    import org.apache.spark.sql.GraftColumnBridge
    val keys = build.select(xxhash64(col(buildKey)).as("__h"))
    val cached = if (expectedItems > 0) keys else keys.persist()
    val bloom =
      try {
        val sized = if (expectedItems > 0) expectedItems
                    else math.max(cached.count(), 4096L)
        cached.stat.bloomFilter("__h", sized, fpp)
      } finally { if (expectedItems <= 0) cached.unpersist() }
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // seed 42 = the xxhash64() function's seed, matching the insert side
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      XxHash64(Seq(GraftColumnBridge.expression(col(probeKey))), 42L)))
  }

  /** Q100 — [[saltedJoin]] under the oracle gate: salting changes WHERE
    * rows meet (the hot key spreads over `salt` partitions), never WHICH
    * rows join — so the plain-join oracle must hash-match exactly. The
    * row-identity property ScaleSpec asserts on a constructed hot key is
    * here proven on real tables by the DuckDB compare. */
  def q100SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_quantity")
    // the operator contract: small side is REPLICATED salt× — so it must be
    // dim-sized, not fact-sized (a ~4%-selective orders slice here)
    val o = Tables(s, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(li, o, "l_orderkey", salt = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast("decimal(12,2)")), 2).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Q91 — lineitem rows belonging to the top-value orders (~5% of orders
    * pass the price gate), via [[bloomPrunedSemiJoin]]. The oracle states
    * the plain `IN` subquery; the bloom is invisible to the result —
    * exactly the property the operator guarantees. */
  def q91BloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val build = Tables(s, dir, "orders")
      .filter(col("o_totalprice") > 475000.0)
      .select("o_orderkey")
    bloomPrunedSemiJoin(Tables(s, dir, "lineitem"), build, "l_orderkey", "o_orderkey")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum(col("l_quantity").cast("decimal(12,2)")), 2).cast("double").as("sum_qty"))
      .orderBy("l_returnflag")
  }
}
