package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Conformance: every SparkEntry query's DataFrame plan must produce exactly
  * the rows of its declared oracle SQL when that SQL is run by Spark itself
  * over the same tables. This validates the Spark side of the hash-compare
  * gate; the DuckDB side reuses the same SQL (or a dialect twin, overridden
  * below where the dialects split — FIXTURES.md §C). */
class RelationalConformanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"
  var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Spark-dialect twins for oracle SQL that is DuckDB-specific. */
  val sparkDialect: Map[String, String] = Map(
    "q08_agg_tpch_q1" -> // TIMESTAMP literal vs timestamp_ntz column
      "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, ROUND(SUM(l_extendedprice), 2) AS sum_base, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc, ROUND(AVG(l_quantity), 4) AS avg_qty, COUNT(*) AS cnt FROM lineitem WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q23_json_extract" -> // json_extract_string -> get_json_object
      "SELECT event_type, CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS s FROM events GROUP BY event_type ORDER BY event_type",
    "q24_event_tumbling" -> // ts already bigint epoch-nanos under nanosAsLong
      "SELECT (ts - (ts % 3600000000000)) AS hour_bucket, event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sv FROM events GROUP BY 1, 2 ORDER BY 1, 2",
  )

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(name) {
      val df = fn(spark, sfDir)
      val got = df.collect()
      assert(got.length > 0, s"$name returned no rows")
      SparkEntry.oracleSql.get(name).foreach { duckSql =>
        val sql = sparkDialect.getOrElse(name, duckSql)
        val exp = spark.sql(sql)
        assert(df.columns.toSeq == exp.columns.toSeq,
          s"$name column mismatch: ${df.columns.toSeq} vs ${exp.columns.toSeq}")
        val expRows = exp.collect()
        assert(got.length == expRows.length,
          s"$name row count ${got.length} != ${expRows.length}")
        got.zip(expRows).zipWithIndex.foreach { case ((g, e), i) =>
          assert(g == e, s"$name row $i: $g != $e")
        }
      }
    }
  }
}
