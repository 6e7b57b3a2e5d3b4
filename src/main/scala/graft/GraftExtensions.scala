package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Cast, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.IntersectCount
import graft.plans.AsOfStrategy

/** Optimizer rule: `size(array_intersect(a, b))` on string arrays →
  * the single-pass IntersectCount expression. The built-in pair
  * materializes the intersection array only to take its length — and
  * the optimizer happily duplicates that pair into join conditions
  * (observed 3× evaluation in pushed-down predicates). The rewrite is
  * purely an expression-level strength reduction, safe anywhere the
  * pattern appears.
  */
object RewriteIntersectCount extends Rule[LogicalPlan] {
  private def isStringArray(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(l, r), legacy @ false)
        if isStringArray(l) && isStringArray(r) =>
      Cast(IntersectCount(l, r), IntegerType)
  }
}

/** Deploy-time wiring: `--conf spark.sql.extensions=graft.GraftExtensions`
  * registers the as-of join strategy and graft optimizer rules on every
  * session of the cluster. [[Graft.install]] is the runtime equivalent
  * for an already-built session (what the specs and Verify/Bench use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfStrategy)
    e.injectOptimizerRule(_ => RewriteIntersectCount)
    SqlSurface.injectable.foreach(e.injectTableFunction)
  }
}

object Graft {
  // once-per-session guard: registries are per-session state, so key on
  // the session INSTANCE (weakly — a stopped session must not be pinned)
  private val installedSessions =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  /** Install graft's strategy, optimizer rule, SQL functions and
    * table-valued functions into a live session. Once per session:
    * registered entries (q63) install on first use with 8 bench queries
    * in flight, and a per-invocation re-register both races (the
    * experimental-methods check-then-append is not atomic) and spams
    * "replaced a previously registered function" warnings for every
    * scalar/TVF on every call. The first caller registers; everyone
    * else returns immediately. */
  def install(spark: SparkSession): Unit = synchronized {
    if (installedSessions.containsKey(spark)) return
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    if (!spark.experimental.extraOptimizations.contains(RewriteIntersectCount))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteIntersectCount
    graft.functions.VectorExprs.register(spark)
    SqlSurface.register(spark)
    installedSessions.put(spark, java.lang.Boolean.TRUE)
  }
}
