package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The winnowing loop itself, callable from both the interpreted eval and
  * the generated code (one plain JVM call per row keeps the projection
  * inside whole-stage codegen while the loop runs as compiled Scala — the
  * JavaStringHash/BestCentroid discipline, for a loop too stateful to
  * inline as an expression tree). */
object WinnowKernel {
  /** EXACTLY the HOF spelling TextAnalysis.winnowFingerprints shipped
    * through r15, value-for-value:
    *
    *   grams[i] = (a · ((hashCode(concat_ws(" ", slice(words, i+1, k)))
    *                     & 0xFFFFFFFF) mod p) + b) mod p
    *              for i in 0 .. max(|words| − k, 0)        (inclusive)
    *   mins[j]  = min(slice(grams, j+1, window))
    *              for j in 0 .. max(|grams| − window, 0)   (inclusive)
    *   result   = array_distinct(mins)                     (first-occurrence
    *                                                        order)
    *
    * including the degenerate tails (slice past the end is short; an empty
    * words array yields the single hash of ""). WinnowKernelSpec pins
    * bit-parity against the HOF spelling on the real corpus, interpreted
    * and codegen. */
  def compute(wordsArr: ArrayData, k: Int, window: Int,
              a: Long, b: Long, p: Long): ArrayData = {
    val n = wordsArr.numElements()
    val words = new Array[String](n)
    var w = 0
    while (w < n) { words(w) = wordsArr.getUTF8String(w).toString; w += 1 }
    val gn = math.max(n - k, 0) + 1
    val grams = new Array[Long](gn)
    var i = 0
    while (i < gn) {
      // java.lang.String#hashCode of the space-joined gram, computed
      // incrementally (31·h + char) so no per-gram string materializes
      var h = 0
      val end = math.min(i + k, n)
      var j = i
      while (j < end) {
        if (j > i) h = 31 * h + ' '
        val s = words(j)
        var c = 0
        while (c < s.length) { h = 31 * h + s.charAt(c); c += 1 }
        j += 1
      }
      val base = (h.toLong & 0xFFFFFFFFL) % p
      grams(i) = (a * base + b) % p
      i += 1
    }
    val mn = math.max(gn - window, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j2 = 0
    while (j2 < mn) {
      var m = Long.MaxValue
      val end = math.min(j2 + window, gn)
      var t = j2
      while (t < end) { if (grams(t) < m) m = grams(t); t += 1 }
      seen.add(m)
      j2 += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** Fused winnowing fingerprint (Schleimer et al., SIGMOD'03) over a words
  * array: k-gram rolling hashes (the replayable universal family — Java
  * hashCode base fold, one universal mix), minimum per sliding window,
  * distinct — all in ONE compiled pass per document.
  *
  * Why a native kernel (r16): the HOF spelling (transform-built gram array,
  * transform-of-array_min window minima) is semantically right but Spark
  * evaluates HigherOrderFunction lambdas INTERPRETED (CodegenFallback), and
  * at full-corpus scale q40 pays per-element Catalyst dispatch for ~51
  * grams × ~25 chars per document — measured 5.06 s at sf0.1 where this
  * kernel does the same integer work in one fused loop. Values are
  * BIT-IDENTICAL to the HOF spelling (WinnowKernelSpec pins parity on the
  * corpus, interpreted and codegen), so the q40/s40 oracles are unchanged
  * and the s40 SQL text keeps the portable HOF spelling. */
case class WinnowFingerprints(child: Expression, k: Int, window: Int,
                              a: Long, b: Long, p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    WinnowKernel.compute(v.asInstanceOf[ArrayData], k, window, a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowKernel.compute($c, $k, $window, ${a}L, ${b}L, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.sql.GraftColumnBridge
  /** Column API: fingerprints of the space-joined word k-grams. */
  def winnow(words: Column, k: Int, window: Int, a: Long, b: Long, p: Long): Column =
    GraftColumnBridge.column(WinnowFingerprints(
      GraftColumnBridge.expression(words), k, window, a, b, p))
}
