package graft

/** Ad-hoc profiler: `runMain graft.Prof <queryName> [sfDir] [runs] [cpus]`.
  * Times repeated noop-sink executions of one SparkEntry query, then prints
  * the formatted plan — the iterate-on-.explain loop from the build brief. */
object Prof {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
