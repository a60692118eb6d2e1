package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The MinHash-signature loop, callable from interpreted eval and generated
  * code (the WinnowKernel discipline: one plain JVM call per row keeps the
  * projection inside whole-stage codegen while the loop runs compiled). */
object MinhashKernel {
  /** EXACTLY the explode+partial-agg spelling Dedup.minhashSignatures
    * shipped through r16, value-for-value, for |words| ≥ k:
    *
    *   base_i = (hashCode(concat_ws(" ", words[i..i+k-1])) & 0xFFFFFFFF)
    *            mod p                       for i in 0 .. |words| − k
    *   sig[j] = min_i (a[j]·base_i + b[j]) mod p
    *
    * Returns null for |words| < k — the legacy spelling's pre-filter
    * domain; callers filter first (MinhashKernelSpec pins parity on the
    * filtered corpus). The per-gram hash folds the UTF-16 units
    * incrementally so no shingle string ever materializes. */
  def compute(wordsArr: ArrayData, k: Int,
              a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = wordsArr.numElements()
    if (n < k) return null
    val words = new Array[String](n)
    var w = 0
    while (w < n) { words(w) = wordsArr.getUTF8String(w).toString; w += 1 }
    val m = a.length
    val sig = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i <= n - k) {
      var h = 0
      var j = i
      while (j < i + k) {
        if (j > i) h = 31 * h + ' '
        val s = words(j)
        var c = 0
        while (c < s.length) { h = 31 * h + s.charAt(c); c += 1 }
        j += 1
      }
      val base = (h.toLong & 0xFFFFFFFFL) % p
      var t = 0
      while (t < m) {
        val v = (a(t) * base + b(t)) % p
        if (v < sig(t)) sig(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Fused MinHash signature over a words array: k-word shingles are hashed
  * with the replayable universal family and all [[graft.operators.Dedup]]
  * MinHashK min-aggregates computed in ONE compiled pass per document.
  *
  * Why a native kernel (r16, the WinnowFingerprints lesson applied to the
  * dedup family's hottest path): the legacy spelling built every shingle
  * STRING inside an interpreted `transform` lambda (HigherOrderFunction is
  * CodegenFallback), exploded ~52 string rows per document, and re-reduced
  * them through 16 partial MIN aggregates — per-element Catalyst dispatch
  * on the path q34/q50/q156 (and the 10× drill) all pay for. The kernel
  * folds hashCode over the UTF-16 units incrementally (no shingle string,
  * no exploded rows) and emits the 16 mins directly; the signature values
  * are BIT-IDENTICAL (MinhashKernelSpec pins corpus parity, degenerate
  * shapes, non-ASCII, and interpreted ≡ codegen), so the q34/q50 oracles
  * and every SQL twin are unchanged. */
case class MinhashSig(child: Expression, k: Int,
                      a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // |words| < k yields null

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(v: Any): Any =
    MinhashKernel.compute(v.asInstanceOf[ArrayData], k, aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MinhashKernel.compute($c, $k, $aRef, $bRef, ${p}L);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  import org.apache.spark.sql.GraftColumnBridge
  /** Column API: the MinHashK-long signature array of the k-word shingles. */
  def minhashSig(words: Column, k: Int, a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftColumnBridge.column(MinhashSig(
      GraftColumnBridge.expression(words), k, a, b, p))
}
