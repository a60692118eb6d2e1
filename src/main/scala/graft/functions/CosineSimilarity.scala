package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst cosine similarity over two array<double> columns: one
  * fused loop accumulating dot product and both norms.
  *
  * Exists because the higher-order-function composition (aggregate ∘
  * zip_with) evaluates its lambda interpreted per element — three separate
  * array traversals with closure invocation per step. This expression
  * compiles into the whole-stage-codegen body as a single primitive loop,
  * which is what the brute-force/rerank kernels of similarity search spend
  * their time in at scale (SURVEY §2.3.11; preference order §4.3: native
  * Expression over UDF).
  *
  * Accumulation is in array-index order, matching the HOF version and the
  * DuckDB oracle's per-index SUM bit-for-bit. Zero vectors yield NaN
  * (0/0), identical to the HOF behavior. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Native fused-loop dot product over two array<double> columns.
  *
  * Exists for pair stages over PRE-NORMALIZED vectors (q152 SemDeDup):
  * cosine of unit vectors IS their dot product, so normalizing each vector
  * once (O(n·d), the members stage) lets the Θ(n^1.5) within-cluster pair
  * stage run 2 flops/element (mul + add) instead of [[CosineSimilarity]]'s
  * 6 (three fused accumulators) — a 3× flop cut on the asymptotically
  * dominant term, which is exactly the trade a 100 TB corpus pays for.
  *
  * Accumulation is in array-index order from a 0.0 seed, matching the
  * oracle's unrolled left-associative `a[1]*b[1] + a[2]*b[2] + …` sum
  * bit-for-bit (0.0 + x == x exactly in IEEE for every x except -0.0,
  * and a -0.0 product chain is absorbed by the callers' ROUND + threshold
  * compare). Loops to the shorter length, like the cosine kernel. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}
