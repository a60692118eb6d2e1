package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: print ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is materialized through the noop sink (full plan execution
  * including sorts — a bare .count() would let Catalyst eliminate ORDER BY
  * and skip column materialization, under-reporting honest cost). */
object Bench {
  def main(args: Array[String]): Unit = {
    // f-interpolators are locale-sensitive: a comma-decimal locale would
    // emit invalid JSON and break the driver's parse of the metrics line
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + parquet-footer warmup so the first measured query isn't charged
    // for classloading/codegen infrastructure.
    Tables.names.foreach(n => Tables(spark, sfDir, n).count())

    def onePass() = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // pass 1 pays per-plan codegen/classload; pass 2 is steady-state — the
    // number that corresponds to sustained throughput on a long-lived cluster
    val cold = onePass()
    val warm = onePass().toMap
    val qs = cold.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val qsWarm = warm.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = cold.map(_._2).sum
    val totalWarm = warm.values.sum
    val pipelineRps = benchPipeline(spark)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"total_warm":$totalWarm%.3f,"queries_warm":$qsWarm,"pipeline_rows_per_sec":$pipelineRps%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Pipeline throughput (BASELINE.md planned metric): generate → Confluent-
    * framed Avro encode (key-hash partitioned) → decode, rows/s. The
    * reference's configured ceiling is ~100 rec/s/partition × 9 partitions
    * (BASELINE.md "implied ceiling"); this measures the same loop as Spark
    * stages. Sink excluded: Derby isn't the reference's MySQL, and disk JDBC
    * would measure the wrong engine. */
  private def benchPipeline(spark: SparkSession, n: Long = 1000000L): Double = {
    import graft.pipeline.{ConfluentAvro, RecordGenerator, SchemaRegistry}
    import graft.schema.SchemaBridge
    val ss = SchemaBridge.parseSimple(
      """[{"name":"bench_ds","fields":{"key_field":"string","ts_field":"long",
        |"str_field":"string","dbl_field":"double"}}]""".stripMargin).head
    val avro = SchemaBridge.toAvro(ss)
    val id = SchemaRegistry.register("bench_ds-value", avro)
    val src = RecordGenerator.generate(spark, ss, n, seed = 42)
    val t0 = System.nanoTime()
    ConfluentAvro.decode(ConfluentAvro.encode(src, avro, id, numPartitions = 9), "value", avro)
      .write.format("noop").mode("overwrite").save()
    n / ((System.nanoTime() - t0) / 1e9)
  }
}
