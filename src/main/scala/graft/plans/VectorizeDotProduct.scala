package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native codegen [[DotProduct]] expression. The HOF form is
  * what a user naturally writes (and what Spark's docs suggest); it
  * allocates an intermediate array and interprets two lambdas per
  * element. The rewrite is exact: DotProduct accumulates in the same
  * left-to-right order, so results are bit-identical.
  *
  * Registered via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations` on a live session. This is
  * the `Rule[LogicalPlan]` tier of the extension ladder (SURVEY.md
  * §7.3) applied where it genuinely pays: hot vector math.
  */
object VectorizeDotProduct extends Rule[LogicalPlan] {

  /** Only rewrite null-free arrays: for arrays CONTAINING null elements
    * the HOF form returns NULL while DotProduct would read null slots as
    * 0.0 — the rewrite must be provably semantics-preserving. */
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _                                   => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc1: NamedLambdaVariable, v1: NamedLambdaVariable, _),
              Seq(acc2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            finish @ LambdaFunction(fin: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
          if x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            acc1.exprId == acc2.exprId && v1.exprId == v2.exprId &&
            fin.exprId == fin2.exprId &&
            isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
