package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the built-in dot-product composition
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0d, (acc,x) -> acc+x)` and
  * rewrite it to the native codegen'd [[DotProduct]]. Users writing the
  * idiomatic higher-order-function form get the fast expression for free —
  * the preference-order (c) integration point (Rule + extensions) from the
  * build brief, applied where it pays: higher-order functions are
  * interpreted per element, DotProduct is one codegen loop.
  *
  * Semantics-preserving: [[DotProduct]] reproduces the composition's null
  * behavior exactly (null on null array, length mismatch, or null
  * element), so the rewrite never changes a result — pinned by
  * FunctionsSpec's equivalence tests over those edge inputs.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def sameVars(e1: Expression, e2: Expression, args: Seq[NamedExpression]): Boolean =
    args.length == 2 && Set[Expression](e1, e2) == args.toSet[NamedExpression].map(identity[Expression])

  private def isIdentity(finish: LambdaFunction): Boolean = finish.function match {
    case v: NamedLambdaVariable => finish.arguments.headOption.contains(v)
    case _ => false
  }

  private def isElementwiseMul(zipFn: LambdaFunction): Boolean = zipFn.function match {
    case m: Multiply => sameVars(m.left, m.right, zipFn.arguments)
    case _ => false
  }

  private def isSum(merge: LambdaFunction): Boolean = merge.function match {
    case a: Add => sameVars(a.left, a.right, merge.arguments)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(l, r, zipFn: LambdaFunction),
          Literal(zero, DoubleType), merge: LambdaFunction, finish: LambdaFunction)
        if zero == 0.0 && isIdentity(finish) && isSum(merge) &&
          isElementwiseMul(zipFn) && isDoubleArray(l) && isDoubleArray(r) =>
      DotProduct(l, r)
  }
}

/** Session extensions: the custom expressions as SQL functions + the
  * dot-product rewrite rule. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "dot_product(a, b) takes exactly 2 arguments")
      }))
    e.injectFunction((
      FunctionIdentifier("rand_exponential"),
      new ExpressionInfo(classOf[RandExponential].getName, "rand_exponential"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(rate) => RandExponential(rate, 42L)
        case Seq(rate, Literal(seed: Long, _)) => RandExponential(rate, seed)
        case Seq(rate, Literal(seed: Int, _)) => RandExponential(rate, seed.toLong)
        case _ => throw new IllegalArgumentException(
          "rand_exponential(rate[, seed]) takes 1 or 2 arguments")
      }))
    // Spark's own bloom-filter expressions exist only in Catalyst's
    // internal registry (runtime shuffle-join filtering); expose them as
    // SQL functions so the explicit build/probe membership-sketch path
    // (see functions.BloomMembership) also works from SQL text.
    e.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[aggregate.BloomFilterAggregate].getName, "bloom_filter_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => new aggregate.BloomFilterAggregate(c)
        case Seq(c, n) => new aggregate.BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new aggregate.BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(itemHash[, nItems[, nBits]]) takes 1-3 arguments")
      }))
    e.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[BloomFilterMightContain].getName, "might_contain"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bloom, item) => BloomFilterMightContain(bloom, item)
        case _ => throw new IllegalArgumentException(
          "might_contain(bloom, itemHash) takes exactly 2 arguments")
      }))
    e.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, n) => WordNgrams(text, n)
        case _ => throw new IllegalArgumentException(
          "word_ngrams(text, n) takes exactly 2 arguments")
      }))
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
