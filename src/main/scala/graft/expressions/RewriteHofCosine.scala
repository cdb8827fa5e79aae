package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule rewriting the portable higher-order-function cosine
  * pattern (VectorFns.cosine: `aggregate(zip_with(a,b,*)) /
  * (sqrt(aggregate(a,x+y*y)) * sqrt(aggregate(b,x+y*y)))`) into the
  * native codegen'd [[CosineSimilarity]] — same double-precision
  * index-order accumulation, so results are bit-identical, but the
  * interpreted lambda dispatch (three array passes, boxed) collapses to
  * one fused primitive loop.
  *
  * This is the same move Spark's own optimizer makes in rules like
  * RewriteDistinctAggregates: users write the composable form, the
  * library recognizes it. Inject via `spark.experimental
  * .extraOptimizations` (GraftFunctions.installOptimizations) or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** lambda (x, y) -> x * y over exactly the bound variables */
  private def isMulLambda(e: Expression): Boolean = e match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) => x == a && y == b
    case _ => false
  }

  /** lambda (acc, v) -> acc + v */
  private def isAddLambda(e: Expression): Boolean = e match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) => x == a && y == b
    case _ => false
  }

  /** lambda x -> x (ArrayAggregate's finish function) */
  private def isIdentity(e: Expression): Boolean = e match {
    case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) => x == a
    case _ => false
  }

  /** aggregate(zip_with(a, b, *), 0.0, +, id) -> (a, b) */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(ZipWith(a, b, mul), zero, add, fin)
        if isZero(zero) && isMulLambda(mul) && isAddLambda(add) && isIdentity(fin) =>
        Some((a, b))
      case _ => None
    }
  }

  /** aggregate(v, 0.0, (acc, y) -> acc + y*y, id) -> v */
  private object NormSqAgg {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(v, zero,
          LambdaFunction(Add(x: NamedLambdaVariable,
            Multiply(y1: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _), fin)
        if isZero(zero) && isIdentity(fin) && x == a && y1 == b && y2 == b =>
        Some(v)
      case _ => None
    }
  }

  /** Drop a float->double array cast: CosineSimilarity reads floats
    * natively and widens per element, producing the same doubles.
    */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == ArrayType(DoubleType) ||
        c.dataType == ArrayType(DoubleType, containsNull = true) =>
      c.child.dataType match {
        case ArrayType(FloatType, _) => c.child
        case _ => e
      }
    case _ => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case Divide(DotAgg(a, b),
          Multiply(Sqrt(NormSqAgg(a2)), Sqrt(NormSqAgg(b2)), _), _)
        if a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineSimilarity(stripCast(a), stripCast(b))
    }
}
