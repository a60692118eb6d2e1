package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.SimpleSchema

/** Distributed, deterministic re-expression of the reference's random record
  * generator (AvroProducer.generateValue, AvroProducer.java:97-123):
  *
  *   int    → [1, 100]           (RANDOM.nextInt(100)+1)
  *   long   → epoch millis       (System.currentTimeMillis())
  *   float  → [0, 1], 3 decimals
  *   double → [0, 1], 6 decimals
  *   string → 6 random ASCII letters
  *
  * The reference loops single-threaded per producer thread; here it's
  * `spark.range(n)` + codegen'd hash expressions, so generation scales with
  * partitions and — crucially for tests — is REPRODUCIBLE: value =
  * f(seed, row id, field name), independent of partitioning/task order
  * (rand(seed) would not be: it depends on partition layout). */
object RecordGenerator {
  private def h(seed: Long, fieldName: String, salt: Int): Column =
    xxhash64(lit(seed), col("id"), lit(fieldName), lit(salt))

  /** The reference clock is frozen at the README's sample timestamp so long
    * fields look like real epoch-millis but stay deterministic
    * (reference README.md:205-214, timestamp_field1=1679818410755). */
  val BaseMillis = 1679818410755L

  private val Letters = "abcdefghijklmnopqrstuvwxyz"

  def valueFor(typ: String, seed: Long, name: String): Column = typ match {
    case "boolean" => pmod(h(seed, name, 0), lit(2)) === 0
    case "int"     => (pmod(h(seed, name, 0), lit(100)) + 1).cast("int")
    case "long"    => lit(BaseMillis) + pmod(h(seed, name, 0), lit(86400000L))
    case "float"   => (pmod(h(seed, name, 0), lit(1001)).cast("double") / 1000.0).cast("float")
    case "double"  => pmod(h(seed, name, 0), lit(1000001)).cast("double") / 1000000.0
    case "string"  => stringCol(seed, name)
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** 6 pseudo-random lowercase letters — substr(alphabet, hash%26+1, 1) × 6. */
  private def stringCol(seed: Long, name: String): Column =
    concat((0 until 6).map { j =>
      lit(Letters).substr(pmod(h(seed, name, j), lit(26)).cast("int") + 1, lit(1))
    }: _*)

  /** Generate `n` records of `schema` as a DataFrame. */
  def generate(spark: SparkSession, schema: SimpleSchema, n: Long, seed: Long = 42L): DataFrame = {
    val cols = schema.fields.map { case (f, t) => valueFor(t, seed, f).as(f) }
    spark.range(n).select(cols: _*)
  }
}
