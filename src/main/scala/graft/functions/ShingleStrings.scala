package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shingle-building loop, callable from interpreted eval and generated
  * code (the WinnowKernel discipline). */
object ShingleKernel {
  private val Sep = UTF8String.fromString(" ")

  /** The space-joined k-gram array of `words` — value-identical to the HOF
    * spelling `transform(sequence(0, n-k), i -> concat_ws(" ",
    * slice(words, i+1, k)))` on its callers' domain (every consumer
    * filters `size(words) >= k` first). Below that domain the HOF spelling
    * is partial (a descending sequence feeds slice a 0 start, which
    * throws); the kernel is total and returns an EMPTY array instead —
    * strictly more defined, never different where both are defined.
    * Byte-level UTF8 concat, so non-ASCII words join exactly as
    * concat_ws does. */
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val ws = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ws(i) = words.getUTF8String(i); i += 1 }
    val out = new Array[AnyRef](n - k + 1)
    var s = 0
    while (s <= n - k) {
      out(s) = UTF8String.concatWs(Sep,
        java.util.Arrays.copyOfRange(ws, s, s + k): _*)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Compiled word k-shingles (space-joined k-grams) — the third r16 kernel:
  * [[graft.operators.Dedup.shingles]]'s HOF spelling built every shingle
  * string through an interpreted transform lambda (HigherOrderFunction is
  * CodegenFallback), a cost every shingle consumer paid — benchmark
  * decontamination (q76/q111/q131/q156), the bigram family
  * (q74/q98/q116), and the curation drill. This expression emits the same
  * strings from one compiled pass per document; ShingleKernelSpec pins
  * bit-parity against the kept-in-tree HOF spelling for k=2 and k=5,
  * boundary lengths, and non-ASCII text. */
case class ShingleStrings(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {
  import org.apache.spark.sql.GraftColumnBridge
  /** Column API: the space-joined k-gram array of a words array. */
  def shingleStrings(words: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleStrings(
      GraftColumnBridge.expression(words), k))
}
