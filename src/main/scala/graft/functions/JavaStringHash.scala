package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.functions.{abs, lit}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing Java `String#hashCode` — the
  * reference's partitioner hash (`Math.abs(key.hashCode() % partitionCount)`,
  * AvroProducer.java:82). Spark's built-in hash() is Murmur3, so partition-
  * level parity with the reference requires this expression (SURVEY §4.3.2).
  *
  * Implemented with doGenCode (not a Scala UDF) so it stays inside
  * whole-stage codegen — on the produce path this runs once per record at
  * 100 TB scale. */
case class JavaStringHash(child: Expression) extends UnaryExpression {

  // input must be a string column (callers go through the typed Column API)
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaStringHash =
    copy(child = newChild)
}

object JavaStringHash {
  /** Column API (bridged into Spark 4's connect-unified Column). Casts any
    * input to string. */
  def java_string_hash(c: Column): Column =
    GraftColumnBridge.column(JavaStringHash(
      GraftColumnBridge.expression(c.cast("string"))))

  /** Reference partition assignment: `Math.abs(hash % n)` — abs AFTER mod,
    * exactly as AvroProducer.java:82 (Spark's int % has Java remainder
    * semantics, so the arithmetic matches bit-for-bit; |h % n| < n so the
    * Math.abs(MIN_VALUE) edge the reference carries is unreachable here). */
  def partition_for(key: Column, numPartitions: Int): Column =
    abs(java_string_hash(key) % lit(numPartitions))

  /** Same arithmetic on the driver side, for parity tests. */
  def referencePartitionFor(key: String, numPartitions: Int): Int =
    math.abs(key.hashCode % numPartitions)

  /** Register `java_string_hash` for SQL callers:
    * `SELECT java_string_hash(c_name) FROM customer`. Non-string arguments
    * are cast to string — same coercion the Column API applies (a raw
    * non-string child would fail codegen/eval at runtime). */
  def registerSql(s: org.apache.spark.sql.SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "java_string_hash",
      exprs => JavaStringHash(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, org.apache.spark.sql.types.StringType)),
      "scala_udf")
}
