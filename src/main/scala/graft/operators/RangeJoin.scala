package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Binned range-join decomposition — the 100 TB scale path for
  * point-in-interval joins.
  *
  * Spark's only native physical strategy for a pure inequality join
  * predicate is a (broadcast) nested-loop join: O(|points| × |intervals|)
  * comparisons, and a hard wall once the interval side outgrows the
  * broadcast threshold. The standard decomposition (used by every
  * production range-join implementation, e.g. the interval-binning
  * literature and Spark's own bucketed geospatial joins) converts the
  * range predicate into an equi-join:
  *
  *   1. pick a bin width W;
  *   2. each point p maps to exactly one bin  ⌊p/W⌋;
  *   3. each interval [s, e) explodes to its covered bins
  *      ⌊s/W⌋ … ⌊(e-1)/W⌋  (one row per bin);
  *   4. equi-join on the bin key — hash-partitionable, AQE-skew-splittable,
  *      broadcastable when one side is small;
  *   5. re-check the exact predicate  s ≤ p < e  as a residual filter
  *      (bins over-approximate: a shared bin does not imply containment).
  *
  * Cost: |points| + Σ ceil(len/W) join input rows instead of the NLJ's
  * cross product — each point is compared only against intervals that
  * share its bin. W trades replication (long intervals explode into
  * many bins) against residual-filter selectivity (wide bins pull in
  * more non-matching points); for disjoint intervals of typical length
  * L, W ≈ L keeps replication ≤ 2× while bins stay tight.
  *
  * The reference pipeline has no join engine at all (it lands rows in
  * MySQL, reference README.md:204); this operator is part of the
  * delegated analytics surface (SURVEY.md §2.3.3, theta/range join row).
  */
object RangeJoin {

  /** Join `points` to `intervals` on  start ≤ point < end  via bin
    * decomposition. `pointCol`/`startCol`/`endCol` name LONG columns in
    * the same unit (the q88 instance uses epoch nanoseconds); `binWidth`
    * is in that unit and must be > 0. Values must be non-negative (the
    * bin key is computed as v - v % W, which floors only for v ≥ 0 —
    * epoch-nanos timestamps satisfy this; a general signed variant would
    * need floor-div).
    *
    * Output: all point columns + all interval columns. No assumption of
    * interval disjointness — an interval row matches every contained
    * point, a point matches every containing interval (standard
    * range-join semantics).
    *
    * Scale shape: the exploded interval side shuffles (or broadcasts)
    * on the bin key; the point side needs only its single computed bin
    * key — Catalyst plans a plain hash join, so both sides stream,
    * partial aggregation can sit above, and AQE can split a skewed bin.
    * The exact predicate is re-applied post-join, so correctness never
    * depends on the bin width choice. */
  def binnedPointInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    // v - v % W == floor(v/W)*W for v ≥ 0: bin start in value units, pure
    // LONG arithmetic (no double division — epoch-nanos exceed a double's
    // 53-bit mantissa, so v/W through doubles could mis-bin boundary rows).
    def binOf(v: Column): Column = v - (v % w)
    val p = points.withColumn("__bin", binOf(col(pointCol)))
    val iv = intervals.withColumn(
      "__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol) - 1), w)))
    p.join(iv, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  private val HourNs = 3600000000000L

  /** Q88 — "busy period" analytics: a self-derived interval table range-
    * joined back to the fact stream, the canonical ops query the reference
    * delegates to MySQL (which at 100 TB simply cannot run it).
    *
    * Interval derivation (exact integer arithmetic end to end, so both
    * engines agree bit-for-bit):
    *   - bucket events into hours: hb = ts - ts % 1h (LONG nanos);
    *   - a hour is busy when its count exceeds 1.1× the mean over observed
    *     hours, tested as 10·c·n_hours > 11·total (no division);
    *   - consecutive busy hours merge into islands (gaps-and-islands:
    *     hb - row_number()·1h is constant per run of consecutive hours);
    *   - island ⇒ interval [min hb, max hb + 1h).
    * The hour table is bounded by the fixture's fixed 30-day window
    * (≤ ~720 rows at ANY scale factor — more data densifies hours, it does
    * not add them), so every interval-derivation step is a tiny-table
    * operation; the single global window runs over ≤720 rows and uses the
    * q81 constant-partition idiom (substring(col,1,0): constant "" but
    * non-foldable, so WindowExec keeps an explicit partitionSpec and emits
    * no scale warning — PlanAuditSpec pins the exemption).
    *
    * The join back to events goes through [[binnedPointInterval]] with a
    * 4-hour bin: islands are hour-aligned but bins are NOT island-aligned,
    * so the residual filter is genuinely exercised. The exploded interval
    * table stays tiny ⇒ Catalyst broadcasts it and the fact side never
    * shuffles for the join (PlanAuditSpec asserts BroadcastHashJoin, not
    * the nested-loop join a naive range predicate would force); the final
    * per-island aggregate ships only |islands| partial rows. */
  def q88RangeJoinBinned(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val hrs = ev
      .groupBy((col("ts") - (col("ts") % HourNs)).as("hb"))
      .agg(count(lit(1)).as("c"))
    // tiny × 1: broadcast the two global scalars against ≤720 hour rows
    val stats = hrs.agg(sum("c").as("total"), count(lit(1)).as("n_hours"))
    val busy = hrs.crossJoin(broadcast(stats))
      .filter(lit(10) * col("c") * col("n_hours") > lit(11) * col("total"))
      .select("hb")
    val constPart = substring(col("hb").cast("string"), 1, 0) // q81 idiom
    val islands = busy
      .withColumn("grp",
        col("hb") - row_number().over(
          Window.partitionBy(constPart).orderBy("hb")) * HourNs)
      .groupBy("grp")
      .agg(
        min("hb").as("start_ns"),
        (max("hb") + HourNs).as("end_ns"),
        count(lit(1)).as("island_hours")) // hours are consecutive ⇒ count = span
      .drop("grp")
    binnedPointInterval(ev, "ts", islands, "start_ns", "end_ns", 4 * HourNs)
      .groupBy(col("start_ns").as("island_start"), col("island_hours"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        e2ToMoney(sum(cents(col("value")))).as("total_value"))
      .orderBy("island_start")
  }

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)
  // exact-money mirror of Relational's cents/e2ToMoney (same contract)
  private def cents(c: Column): Column = round(c * 100).cast("long")
  private def e2ToMoney(sumE2: Column): Column =
    (sumE2.cast("decimal(20,0)") / 100).cast("decimal(12,2)").cast("double")
}
