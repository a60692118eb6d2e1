package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.functions.{CosineSimilarity, DotProduct, JavaStringHash}

/** Engine extension point, registered with every [[GraftSession]] (and
  * usable standalone via `spark.sql.extensions=graft.GraftExtensions`).
  * This is the sanctioned Spark mechanism for the capability tier the
  * build brief calls (c): session-wired functions and optimizer rules —
  * no forked analyzer, no reflection into session internals.
  *
  *  - `graft_cosine(a, b)`: the native fused-loop [[CosineSimilarity]]
  *    kernel, SQL-callable (the Column API route is VectorOps.cosine).
  *  - `graft_dot(a, b)`: the native fused-loop [[DotProduct]] kernel for
  *    pair stages over pre-normalized vectors (VectorOps.dotNative).
  *  - `java_string_hash(s)`: the reference's partitioner hash
  *    (Java String#hashCode — AvroProducer.java:82 semantics) for SQL
  *    callers; a session-extension registration, unlike the temp-function
  *    helper JavaStringHash.registerSql which lives per-session-state.
  *  - [[RewriteHofCosine]]: optimizer rule fusing the declarative
  *    higher-order-function cosine into the codegen kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => CosineSimilarity(a, b)
        case other => throw new IllegalArgumentException(
          s"graft_cosine expects (array<double>, array<double>), got ${other.length} args")
      }))
    ext.injectFunction((new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotProduct(a, b)
        case other => throw new IllegalArgumentException(
          s"graft_dot expects (array<double>, array<double>), got ${other.length} args")
      }))
    ext.injectFunction((new FunctionIdentifier("java_string_hash"),
      new ExpressionInfo(classOf[JavaStringHash].getName, "java_string_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => JavaStringHash(Cast(c, StringType))
        case other => throw new IllegalArgumentException(
          s"java_string_hash expects one argument, got ${other.length}")
      }))
    ext.injectOptimizerRule(_ => RewriteHofCosine)
  }
}

/** Rewrites the higher-order-function cosine composition
  * `aggregate(zip_with(a,b,(x,y)=>x*y),0.0,(acc,v)=>acc+v)
  *    / (sqrt(aggregate(a,0.0,(acc,v)=>acc+v*v)) * sqrt(aggregate(b,...)))`
  * (VectorOps.cosineHof — what a user writing declarative array math
  * produces) into the single-traversal codegen [[CosineSimilarity]]
  * kernel: three interpreted array walks with per-element closure calls
  * become one primitive loop inside whole-stage codegen.
  *
  * Semantics guard: the HOF form yields NULL for ragged pairs (zip_with
  * pads with NULL → the sum is NULL) while the kernel loops to the SHORTER
  * length, so the rewrite emits `if (size(a)=size(b)) kernel else NULL` —
  * behavior-identical on every input, including NULL arrays (size(NULL) is
  * NULL → branch NULL, matching HOF null-propagation).
  *
  * Runs inside the operator-optimization fixed point (injected rule), so it
  * fires whether the expression sits in one Project or gets collapsed into
  * one mid-batch. Accumulation order is index order in both forms —
  * bit-for-bit equal results (SimilaritySpec parity test). */
object RewriteHofCosine extends Rule[LogicalPlan] {

  /** finish lambda of a 3-arg `aggregate`: c => c */
  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        v.exprId == a.exprId
      case _ => false
    }
  }

  /** (acc, v) => acc + v */
  private object SumLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
          Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
        acc.exprId == a1.exprId && v.exprId == a2.exprId
      case _ => false
    }
  }

  /** aggregate(zip_with(a, b, (x,y) => x*y), 0.0, sum) → (a, b) */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(
            Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType), merge, fin)
          if x.exprId == xa.exprId && y.exprId == ya.exprId &&
            SumLambda.unapply(merge) && IdentityLambda.unapply(fin) =>
        Some((a, b))
      case _ => None
    }
  }

  /** aggregate(arr, 0.0, (acc,v) => acc + v*v) → arr */
  private object NormSqAgg {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(arr, Literal(0.0, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable,
              Multiply(v1: NamedLambdaVariable, v2: NamedLambdaVariable, _), _),
            Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _), fin)
          if acc.exprId == a1.exprId && v1.exprId == a2.exprId &&
            v2.exprId == a2.exprId && IdentityLambda.unapply(fin) =>
        Some(arr)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotAgg(a, b),
        Multiply(Sqrt(NormSqAgg(na)), Sqrt(NormSqAgg(nb)), _), _)
        if (a.semanticEquals(na) && b.semanticEquals(nb)) ||
          (a.semanticEquals(nb) && b.semanticEquals(na)) =>
      If(EqualTo(Size(a), Size(b)),
        CosineSimilarity(a, b),
        Literal(null, DoubleType))
  }
}
