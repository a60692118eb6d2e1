package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Partition-aware parquet layout — the storage half of the 100 TB design.
  *
  * The reference lands rows in MySQL tables with no physical layout control
  * (reference DataPipeline.java:178-199 emits flat CREATE TABLEs); at
  * 100 TB the dominant query cost is the scan, and the scan cost is decided
  * at WRITE time:
  *
  *  - hive-style directory partitioning on a low-cardinality column
  *    (lang / source / event date) lets Catalyst prune whole directories
  *    from the `InMemoryFileIndex` before any I/O — the `PartitionFilters`
  *    entry in the scan node, distinct from row-level `PushedFilters`;
  *  - sorting within files on a selective key writes parquet row-group
  *    min/max statistics that filter pushdown can skip on — a point or
  *    range query on the sort key touches O(matching row-groups), not the
  *    whole file;
  *  - repartitioning by the partition columns BEFORE `partitionBy` bounds
  *    the file count: without it every one of T write tasks emits a file
  *    into every one of P directories (T×P small files — the classic
  *    metadata bomb at scale); with it each partition's rows land in the
  *    task that owns them (P files total, AQE-coalesced).
  */
object ParquetLayout {

  /** Write `df` hive-partitioned by `partCols`, each file sorted on
    * `sortCols`. Layout contract: ≤ `spark.sql.shuffle.partitions` files
    * per partition directory (one repartition, no per-task fan-out).
    * `SaveMode.Append` lands the batch as NEW files inside the existing
    * partition directories (and fresh directories for unseen partition
    * values) without touching prior files — the index-append path. */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String], sortCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partCols: _*)
      .mode(mode)
      .parquet(path)

  /** Read a partitioned layout back. Plain `spark.read.parquet` — partition
    * discovery and pruning are Catalyst-native; this exists so call sites
    * document intent and tests audit the pruned plan in one place. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write `df` clustered by the Z-ORDER (Morton) interleave of two numeric
    * columns — the layout for workloads that filter on EITHER (or both) of
    * two dimensions, where a plain sort can serve only one.
    *
    * A file sorted by `user_id` carries tight user_id min/max per row group
    * but the FULL time range in every one of them: a time-range query skips
    * nothing. Interleaving the bits of 16-bit rank buckets of both columns
    * into one 32-bit key and range-partitioning + sorting on it tiles the
    * (a, b) plane with locality in BOTH dimensions: with F files each file
    * covers ~1/√F of each dimension's span, so parquet min/max stats prune
    * ~(1 − 1/√F) of row groups for a narrow predicate on EITHER column.
    * ScaleSpec proves the property observably — per-file min/max widths on
    * both dimensions, z-ordered vs single-column-sorted.
    *
    * Scale: one pass — a 4-value min/max agg (driver-sized), then ONE
    * range repartition by the computed z-value (Spark samples the key
    * distribution, so z-dense regions split evenly) and a local sort per
    * file. Bucketing is min/max-normalized in DOUBLE before the 16-bit
    * quantize — value spans up to 2⁶³ cannot overflow, and layout keys
    * need monotonicity, not exactness.
    *
    * `ts` interaction (r8 verdict #8): `Tables.normalizeTs` rewrites the
    * events `ts` column in a load-time projection, so a raw-scan predicate
    * on the REWRITTEN `ts` does not reach parquet row-group stats — a
    * z-order layout keyed on `ts` would silently lose its pruning for
    * timestamp-physical files. Rule: z-order AFTER loading through
    * `Tables` (the layout then stores the normalized bigint and min/max
    * stats speak the same spelling queries filter on — this is what the
    * engine's layouts do), or key on a column normalizeTs never touches.
    * Bigint-physical events files (the engine's own written layouts) are
    * untouched by normalizeTs and prune as usual. */
  def writeZOrdered(df: DataFrame, path: String,
      colA: String, colB: String, nFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions._
    val n = if (nFiles > 0) nFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    def bucket(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, 1e-300)
      least(floor((col(c).cast("double") - lit(lo)) / lit(span) * 65536.0), lit(65535.0))
        .cast("long")
    }
    val ba = bucket(colA, r.getDouble(0), r.getDouble(1))
    val bb = bucket(colB, r.getDouble(2), r.getDouble(3))
    // Morton interleave: bit i of each 16-bit bucket lands at 2i+1 / 2i —
    // 32 shift/mask terms, all codegen'd integer ops
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(ba, i) bitwiseAND 1L, 2 * i + 1) +
        shiftleft(shiftright(bb, i) bitwiseAND 1L, 2 * i)
    }.reduce(_ + _)
    df.repartitionByRange(n, z)
      .sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
