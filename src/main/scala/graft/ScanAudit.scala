package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executed-plan scan audit + regression GATE.
  *
  * For every DataFrame-lane query, drives the executed plan and reports how
  * many LIVE FileScans of each table the final AQE tree carries (reused
  * exchanges collapse duplicates; this counts what actually reads disk).
  * A lane scanning one table more often than its semantics require is the
  * exact bug class the r12 bench caught in q99/q112 — an inferred filter
  * or a pruned column making two branch subtrees differ by a hair, so
  * ReuseExchange never fires and the fact table is read twice.
  *
  * Since r13 (r12 verdict #3) the audit is a GATE, not just a listing:
  * `scan_budgets.json` (checked in, emitted by `--emit`) records each
  * lane's expected per-table live-scan budget; [[check]] returns a
  * violation string for every (lane, table) whose executed plan exceeds
  * it, and Bench folds those into `failures[]` (nonzero rc). Re-scans are
  * NOT always bugs — self-joins, correlated scalar subqueries, and the
  * ANN truth-vs-candidate passes legitimately read a table twice — so
  * those lanes carry explicit budgets >1 IN THE FILE, reviewable at a
  * glance; any lane/table absent from the file (e.g. a new lane) defaults
  * to the strict budget of 1.
  *
  * Budgets are measured and gated at sf0.001: live-scan counts come from
  * plan STRUCTURE (exchange reuse), which AQE sizing does not change, so
  * the small fixture is representative and the gate costs ~a minute.
  *
  * `runMain graft.ScanAudit [sfDir] [laneFilter]`       — print the listing
  * `runMain graft.ScanAudit [sfDir] --emit [path]`      — write budgets
  * `runMain graft.ScanAudit [sfDir] --check [path]`     — gate (rc 1 on fail)
  */
object ScanAudit {
  val DefaultBudgetPath = "scan_budgets.json"

  def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec => p +: walk(q.plan)
    case other => other +: other.children.flatMap(walk)
  }

  /** Drive every (filtered) lane's executed plan on `dir` and return
    * (lane, live FileScans per table, reused-exchange count). A lane that
    * throws is reported on stderr and omitted (the correctness gate owns
    * lane failures; this gate owns plan shape). */
  def collect(spark: SparkSession, dir: String,
              only: Option[String] = None): Seq[(String, Map[String, Int], Int)] =
    SparkEntry.baseQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      .flatMap { case (name, fn) =>
        try {
          val qe = fn(spark, dir).queryExecution
          qe.toRdd.foreach(_ => ())
          val nodes = walk(qe.executedPlan)
          val scansByTable = nodes.collect { case s: FileSourceScanExec =>
            s.relation.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
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

  /** Violations of `budgets` in `rows`: every (lane, table) whose live-scan
    * count exceeds its budget (default 1 for anything not in the file). */
  def violations(rows: Seq[(String, Map[String, Int], Int)],
                 budgets: Map[String, Map[String, Int]]): Seq[String] =
    for {
      (name, byTable, _) <- rows
      (table, n) <- byTable.toSeq.sortBy(_._1)
      budget = budgets.getOrElse(name, Map.empty).getOrElse(table, 1)
      if n > budget
    } yield s"scan_budget:$name:$table($n>$budget)"

  /** Parse the budget file (json4s rides Spark's classpath). Returns None
    * when the file is absent — callers decide whether that skips or fails. */
  def loadBudgets(path: String): Option[Map[String, Map[String, Int]]] = {
    val f = new java.io.File(path)
    if (!f.isFile) None
    else {
      import org.json4s._
      val parsed = jackson.JsonMethods.parse(f)
      Some(parsed.asInstanceOf[JObject].obj.map { case (lane, tables) =>
        lane -> tables.asInstanceOf[JObject].obj.map {
          case (t, JInt(n)) => t -> n.toInt
          case (t, v) => throw new IllegalArgumentException(s"bad budget $lane/$t: $v")
        }.toMap
      }.toMap)
    }
  }

  /** Serialize budgets deterministically (sorted keys) for clean diffs. */
  def renderBudgets(rows: Seq[(String, Map[String, Int], Int)]): String =
    rows.sortBy(_._1).map { case (name, byTable, _) =>
      val inner = byTable.toSeq.sorted
        .map { case (t, n) => s"""  "$t": $n""" }.mkString("{\n", ",\n", "\n }")
      s""" "$name": $inner"""
    }.mkString("{\n", ",\n", "\n}\n")

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val mode = if (args.length > 1) args(1) else ""
    val spark = GraftSession.builder("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rc: Int = mode match {
      case "--emit" =>
        val path = if (args.length > 2) args(2) else DefaultBudgetPath
        val rows = collect(spark, dir)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path), renderBudgets(rows))
        println(s"[scan-audit] wrote ${rows.size} lane budgets to $path")
        0
      case "--check" =>
        val path = if (args.length > 2) args(2) else DefaultBudgetPath
        loadBudgets(path) match {
          case None =>
            System.err.println(s"[scan-audit] no budget file at $path — emit one first")
            1
          case Some(budgets) =>
            val viols = violations(collect(spark, dir), budgets)
            viols.foreach(v => println(s"[scan-audit] VIOLATION $v"))
            println(s"[scan-audit] ${viols.size} violations vs $path")
            if (viols.nonEmpty) 1 else 0
        }
      case laneFilter =>
        val only = Option(laneFilter).filter(_.nonEmpty)
        val rows = collect(spark, dir, only)
        rows.sortBy { case (_, byTable, _) => -byTable.values.max }.foreach {
          case (name, byTable, reused) =>
            val desc = byTable.toSeq.sortBy(-_._2)
              .map { case (t, n) => s"$t×$n" }.mkString(", ")
            println(f"[scan-audit] ${byTable.values.max}%2d max  reused=$reused%2d  $name%-34s $desc")
        }
        0
    }
    spark.stop()
    if (rc != 0) sys.exit(rc)
  }
}
