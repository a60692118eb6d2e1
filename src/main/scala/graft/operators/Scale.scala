package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
