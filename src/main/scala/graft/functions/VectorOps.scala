package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(DoubleType) columns, built from codegen'd
  * higher-order functions (zip_with / aggregate / transform) — no UDFs, so
  * the whole pipeline stays inside whole-stage codegen.
  *
  * `aggregate` folds left-to-right in array index order, so sums are
  * deterministic per row regardless of partitioning — required for the
  * DuckDB hash-compare (only the final ROUND absorbs cross-engine
  * accumulation-order noise).
  */
object VectorOps {
  /** Elementwise dot product. Inputs must already be array<double>. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast an array<float> embedding to array<double> so all products are
    * computed in double precision (matches the oracle's CAST AS DOUBLE). */
  def asDouble(c: Column): Column = c.cast("array<double>")
}
