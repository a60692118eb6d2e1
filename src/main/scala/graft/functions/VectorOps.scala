package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(DoubleType) columns.
  *
  * The hot kernel (cosine) is a native codegen Expression
  * ([[CosineSimilarity]]); the building blocks kept here use higher-order
  * functions (interpreted lambda per element — fine off the hot path, and
  * UDF-free so plans stay analyzable).
  *
  * All folds run in array index order, so sums are deterministic per row
  * regardless of partitioning — required for the DuckDB hash-compare (only
  * the final ROUND absorbs cross-engine accumulation-order noise).
  */
object VectorOps {
  /** Elementwise dot product. Inputs must already be array<double>. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity — native fused-loop expression (one traversal,
    * whole-stage-codegen'd). Same index-order accumulation as the HOF
    * composition `dot(a,b)/(norm(a)*norm(b))`, bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(CosineSimilarity(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** HOF composition of cosine (reference semantics for parity tests). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Dot product — native fused-loop expression ([[DotProduct]]). For pair
    * stages over pre-normalized vectors, where cosine degenerates to dot
    * and the 3-accumulator kernel wastes 2/3 of its flops. */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(DotProduct(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Unit-normalize against a separately computed norm column (callers
    * compute `norm(v)` once per row; the lambda divides each element).
    * Zero vectors yield ±Infinity/NaN elements, matching what the cosine
    * kernel's 0/0 would have produced downstream. */
  def unit(v: Column, nrm: Column): Column = transform(v, x => x / nrm)

  /** Fused argmax-cosine against a one-row broadcast centroid array —
    * `cents`: array<struct<cent_id long, centv array<double>>>. */
  def bestCentroid(vec: Column, cents: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(BestCentroid(
      org.apache.spark.sql.GraftColumnBridge.expression(vec),
      org.apache.spark.sql.GraftColumnBridge.expression(cents)))

  /** Fused LSH signature against a precomputed hyperplane matrix literal —
    * `planes`: array<array<double>>, bit b = sign(vec · planes[b]). */
  def lshBucket(vec: Column, planes: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(LshBucket(
      org.apache.spark.sql.GraftColumnBridge.expression(vec),
      org.apache.spark.sql.GraftColumnBridge.expression(planes)))

  /** Cast an array<float> embedding to array<double> so all products are
    * computed in double precision (matches the oracle's CAST AS DOUBLE). */
  def asDouble(c: Column): Column = c.cast("array<double>")
}
