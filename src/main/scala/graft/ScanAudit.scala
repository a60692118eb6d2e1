package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executed-plan scan audit: `runMain graft.ScanAudit [sfDir] [laneFilter]`.
  *
  * For every DataFrame-lane query, drives the executed plan and reports how
  * many LIVE FileScans of each table the final AQE tree carries (reused
  * exchanges collapse duplicates; this counts what actually reads disk).
  * A lane scanning one table more often than its semantics require is the
  * exact bug class the r12 bench caught in q99/q112 — an inferred filter
  * or a pruned column making two branch subtrees differ by a hair, so
  * ReuseExchange never fires and the fact table is read twice. Re-scans
  * are NOT always bugs (self-joins, correlated scalar subqueries, and the
  * ANN truth-vs-candidate passes legitimately read a table twice), so this
  * is a diagnostic listing, not a gate: lanes are printed descending by
  * max per-table scan count for a human (or the next round's builder) to
  * eyeball against each operator's documented shape. */
object ScanAudit {
  def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec => p +: walk(q.plan)
    case other => other +: other.children.flatMap(walk)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = GraftSession.builder("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.baseQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      .flatMap { case (name, fn) =>
        try {
          val qe = fn(spark, dir).queryExecution
          qe.toRdd.foreach(_ => ())
          val nodes = walk(qe.executedPlan)
          val scansByTable = nodes.collect { case s: FileSourceScanExec =>
            s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?")
          }.groupBy(identity).view.mapValues(_.size).toMap
          val reused = nodes.count(_.isInstanceOf[ReusedExchangeExec])
          if (scansByTable.isEmpty) None
          else Some((name, scansByTable, reused))
        } catch { case e: Throwable =>
          System.err.println(s"[scan-audit] $name failed: ${e.getMessage}")
          None
          // sweep in finally: a lane that persists then THROWS must not
          // leak cached blocks into every later lane's audit
        } finally GraftSession.releasePersisted(spark)
      }
    rows.sortBy { case (_, byTable, _) => -byTable.values.max }.foreach {
      case (name, byTable, reused) =>
        val desc = byTable.toSeq.sortBy(-_._2)
          .map { case (t, n) => s"$t×$n" }.mkString(", ")
        println(f"[scan-audit] ${byTable.values.max}%2d max  reused=$reused%2d  $name%-34s $desc")
    }
    spark.stop()
  }
}
