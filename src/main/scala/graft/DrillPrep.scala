package graft

/** Materialize the [[ScaleDrill]] 1×/`factor`× drill copies WITHOUT timing
  * anything: `runMain graft.DrillPrep [sfDir] [outDir] [factor]`. Lets
  * [[Prof]] iterate on one drill query's plan against a pre-written scaled
  * copy (`Prof q99_winsorized <outDir>/scaled`) instead of paying the
  * materialization on every profiling run.
  */
object DrillPrep {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_drill_prep"
    val factor = if (args.length > 2) args(2).toInt else 10
    // 4th arg "lineardocs": documents-only replacement-mode copies (the
    // r13 text-gate fixture) instead of the full splice-mode table set
    val linearDocs = args.length > 3 && args(3) == "lineardocs"
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (linearDocs) {
      ScaleDrill.materializeDocuments(spark, sfDir, s"$outDir/base1x", 1, linear = true)
      ScaleDrill.materializeDocuments(spark, sfDir, s"$outDir/scaled", factor, linear = true)
    } else {
      ScaleDrill.materialize(spark, sfDir, s"$outDir/base1x", 1)
      ScaleDrill.materialize(spark, sfDir, s"$outDir/scaled", factor)
    }
    println(s"[drillprep] wrote $outDir/base1x and $outDir/scaled (${factor}x) from $sfDir" +
      (if (linearDocs) " [linear docs]" else ""))
    spark.stop()
  }
}
