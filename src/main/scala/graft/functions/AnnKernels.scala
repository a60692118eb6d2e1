package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Fused argmax-cosine over a (small, broadcast) centroid table: returns the
  * `cent_id` whose vector maximizes cosine similarity with `vec`.
  *
  * `cents` is `array<struct<cent_id: long, centv: array<double>>>` — the
  * whole centroid table folded into ONE row (collect_list) and broadcast, so
  * the IVF assignment is a single narrow codegen'd pass over the corpus:
  * N·C fused-loop cosines, zero joined rows, zero shuffle. The previous
  * spelling (broadcast NLJ producing N×C rows carrying BOTH 64-dim vector
  * payloads, then a groupBy(vec_id) max_by) moved ~1 KB of row copy per
  * (vector, centroid) pair through a non-codegen BNLJ — the r5 scale drill
  * measured it at 11 s for 20 k × 141 assignments that are ~180 M flops.
  *
  * Ties: strict `>`, centroid array pre-sorted by cent_id → the LOWEST
  * cent_id among exact ties wins, deterministically. All-NaN similarities
  * (zero vectors) return -1 (no valid assignment).
  *
  * Input typing (r5 advice): the eval loops read 8-byte doubles positionally
  * (`ArrayData.getDouble`), so an `array<float>` argument — e.g. the
  * embeddings table's native column passed without VectorOps.asDouble —
  * would silently read garbage. Declaring `inputTypes` makes the analyzer
  * insert the cast (or fail analysis when no cast exists) instead. */
case class BestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq( // inferred: AbstractDataType is private[sql]
    ArrayType(DoubleType),
    ArrayType(StructType(Seq(
      StructField("cent_id", LongType), StructField("centv", ArrayType(DoubleType))))))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cs = r.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var bestId = -1L
    var i = 0
    while (i < cs.numElements()) {
      val s = cs.getStruct(i, 2)
      val id = s.getLong(0)
      val c = s.getArray(1)
      val n = math.min(v.numElements(), c.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        val x = v.getDouble(j); val y = c.getDouble(j)
        dot += x * y; na += x * x; nb += y * y
        j += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sim > best) { best = sim; bestId = id }
      i += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val best = ctx.freshName("best"); val bestId = ctx.freshName("bestId")
      val st = ctx.freshName("st"); val c = ctx.freshName("c"); val sim = ctx.freshName("sim")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bestId = -1L;
         |for (int $i = 0; $i < $cs.numElements(); $i++) {
         |  InternalRow $st = $cs.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $st.getArray(1);
         |  int $n = java.lang.Math.min($v.numElements(), $c.numElements());
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $x = $v.getDouble($j);
         |    double $y = $c.getDouble($j);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $sim = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if ($sim > $best) { $best = $sim; $bestId = $st.getLong(0); }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BestCentroid =
    copy(left = l, right = r)
}

/** Fused random-hyperplane LSH signature: bit b of the result is
  * sign(vec · planes[b]); `planes` is `array<array<double>>` — the
  * hyperplane matrix, precomputed ONCE (it depends only on (table, bit,
  * dim)) and attached as a single literal. One codegen'd double loop per
  * row replaces the per-row-per-bit interpreted HOF pipeline
  * (transform(sequence) materializing a fresh hyperplane array + xxhash64
  * per element, per row) — ~77 M interpreted lambda steps for 6 tables
  * over a 20 k corpus in the r5 drill.
  *
  * Bit semantics match the HOF spelling exactly: dot accumulated in index
  * order, bit set iff dot > 0 (NaN sets nothing). Rows shorter than a
  * plane fold over the shared prefix, like zip_with.
  *
  * Input typing: same contract as [[BestCentroid]] — positional getDouble
  * reads require array<double>; the declared `inputTypes` make an
  * array<float> argument cast at analysis instead of reading garbage. */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = // inferred: AbstractDataType is private[sql]
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val ps = r.asInstanceOf[ArrayData]
    var bucket = 0L
    var b = 0
    while (b < ps.numElements()) {
      val p = ps.getArray(b)
      val n = math.min(v.numElements(), p.numElements())
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v.getDouble(j) * p.getDouble(j); j += 1 }
      if (dot > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, ps) => {
      val b = ctx.freshName("b"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val p = ctx.freshName("p"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |long $bucket = 0L;
         |for (int $b = 0; $b < $ps.numElements(); $b++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $p = $ps.getArray($b);
         |  int $n = java.lang.Math.min($v.numElements(), $p.numElements());
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += $v.getDouble($j) * $p.getDouble($j);
         |  }
         |  if ($dot > 0) $bucket |= (1L << $b);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LshBucket =
    copy(left = l, right = r)
}
