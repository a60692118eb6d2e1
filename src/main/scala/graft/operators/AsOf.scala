package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** General as-of join (time-series "latest right row at or before each left
  * row", per key) — the library form of q41's union+window scheme
  * (SURVEY §2.3.3 "as-of / interval").
  *
  * Spark-first rationale: Spark has no AsOfJoin node. The preference-order
  * options (SURVEY §4.3 / build brief) were (b) a custom LogicalPlan +
  * Strategy + BinaryExecNode, or (a) composing built-ins. Composition wins
  * here because the union+window plan already has the optimal physical
  * shape: ONE hash shuffle on the key, one per-partition sort, linear state
  * — exactly what a hand-written sort-merge AsOfJoinExec would do, but with
  * AQE, codegen, and spill handling for free. A custom node would only
  * re-implement that.
  *
  * Scale: no join node exists, so there is no BNLJ blowup risk and no skew
  * amplification beyond the window's own key skew (mitigate hot keys
  * upstream via [[Scale.hotKeys]] detection).
  */
object AsOf {

  /** For every left row, attach the latest right row with the same `key`
    * whose `rightTs` <= `leftTs` (backward as-of; ties take the right row).
    * Right payload arrives as one nullable struct column `asofCol`
    * (null = no right row at or before). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   asofCol: String = "asof"): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rPayload = struct(right.columns.map(col): _*)
    val rType = StructType(right.schema.fields)

    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(null).cast(rType).as("__p"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lType).as("__lrow"),
      rPayload.as("__p"))

    val w = Window.partitionBy("__k").orderBy("__ts", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*"), col("__asof").as(asofCol))
  }
}
