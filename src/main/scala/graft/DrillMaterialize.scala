package graft

/** Dev tool: materialize the ScaleDrill factor-× tables once to a kept
  * directory so individual queries can be profiled against them with
  * [[Prof]] without paying the materialization on every experiment.
  * `runMain graft.DrillMaterialize [sfDir] [outDir] [factor]` */
object DrillMaterialize {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_drill10x"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local()
    ScaleDrill.materialize(spark, sfDir, outDir, factor)
    println(s"[drill] materialized ${factor}x of $sfDir at $outDir")
    spark.stop()
  }
}
