package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProductFloat

/** Catalyst optimizer rule: rewrite the declarative higher-order dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * over ARRAY<FLOAT> columns into the codegen'd [[DotProductFloat]]
  * expression. Users (and composed library code) write the idiomatic
  * functions-API formulation; the plan executes the tight primitive loop
  * (HOFs are CodegenFallback — interpreted, allocating an intermediate
  * array per row). Semantics are identical, including the edge cases:
  * float widened to double, sequential accumulation; ragged lengths and
  * null elements yield null in BOTH formulations (zip_with pads/passes
  * nulls which poison the sum; DotProductFloat checks explicitly), so
  * the rewrite is safe on any input, not just clean embeddings.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x * y (either operand possibly widened by a cast) over the two
    * lambda variables of a zip_with. */
  private def isPairwiseMultiply(fn: Expression): Boolean = fn match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      def strip(e: Expression): Expression = e match {
        case c: Cast => strip(c.child)
        case other => other
      }
      (strip(l), strip(r)) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          Set(lv.exprId, rv.exprId) == Set(x.exprId, y.exprId)
        case _ => false
      }
    case _ => false
  }

  private def isAccumulateAdd(fn: Expression): Boolean = fn match {
    case LambdaFunction(Add(l, r, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l, r) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          Set(lv.exprId, rv.exprId) == Set(acc.exprId, v.exprId)
        case _ => false
      }
    case _ => false
  }

  private def isIdentityFinish(fn: Expression): Boolean = fn match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      v.exprId == p.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, merge), Literal(0.0d, DoubleType), agg, finish)
        if isFloatArray(a) && isFloatArray(b) &&
          isPairwiseMultiply(merge) && isAccumulateAdd(agg) && isIdentityFinish(finish) =>
      DotProductFloat(a, b)
  }
}

/** Catalyst optimizer rule: an edit distance compared against a small
  * literal bound never needs the full O(len²) DP — Spark's thresholded
  * Levenshtein runs the banded O(thr·len) variant that abandons a row
  * once every cell exceeds the bound, returning −1 past it and the
  * exact distance (≥ 0) otherwise. Users write the idiomatic predicate;
  * the optimizer swaps in the cheap kernel:
  *
  *   levenshtein(a, b) <= k   →   levenshtein(a, b, k)     >= 0
  *   levenshtein(a, b) <  k   →   levenshtein(a, b, k − 1) >= 0
  *
  * (plus the mirrored literal-first spellings). Equivalent on every
  * input including nulls: a null operand nulls BOTH comparisons, which
  * filter identically. Negative bounds are left alone (always-false
  * predicates fold away elsewhere). The rewrite is the automated form
  * of what dedup_fuzzy_names applies by hand — entity-resolution
  * verify stages are exactly where these predicates appear.
  */
object ThresholdLevenshtein extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.IntegerType

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      banded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      banded(l, r, k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
      banded(l, r, k)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 1 =>
      banded(l, r, k - 1)
  }
}

/** Session extension installing graft's optimizer rules + SQL functions.
  * Wire with .withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => ThresholdLevenshtein)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product_float"),
        new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
        (children: Seq[Expression]) => DotProductFloat(children(0), children(1))))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product_int"),
        new ExpressionInfo(classOf[graft.functions.DotProductInt].getName, "dot_product_int"),
        (children: Seq[Expression]) => graft.functions.DotProductInt(children(0), children(1))))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("code_lookup_sum"),
        new ExpressionInfo(classOf[graft.functions.CodeLookupSum].getName, "code_lookup_sum"),
        (children: Seq[Expression]) => graft.functions.CodeLookupSum(children(0), children(1))))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
        (children: Seq[Expression]) => graft.functions.NfcNormalize(children.head)))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("freq_items_sketch"),
        new ExpressionInfo(classOf[graft.functions.FreqItemsSketch].getName, "freq_items_sketch"),
        (children: Seq[Expression]) => {
          val k = children(1) match {
            case Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"freq_items_sketch: k must be an integer literal, got $other")
          }
          graft.functions.FreqItemsSketch(children.head, k).toAggregateExpression()
        }))
  }
}
