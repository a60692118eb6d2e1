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
    * per partition directory (one repartition, no per-task fan-out). */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String], sortCols: Seq[String]): Unit =
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Read a partitioned layout back. Plain `spark.read.parquet` — partition
    * discovery and pruning are Catalyst-native; this exists so call sites
    * document intent and tests audit the pruned plan in one place. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
