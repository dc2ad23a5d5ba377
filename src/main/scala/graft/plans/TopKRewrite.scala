package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, ExprId, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite (SURVEY §7.3 ladder step: custom `Rule[LogicalPlan]`,
  * completing Expression → Aggregator → Rule → Strategy+Exec): the
  * idiomatic window top-k pattern
  *
  *   df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *     .filter($"rn" <= n).drop("rn")
  *
  * is recognized in the optimized plan and substituted with the native
  * [[TopKPerKey]] heap operator — users keep writing the textbook
  * formulation and the engine silently drops the per-partition SORT the
  * window form forces (see [[TopKPerKey]] for the cost argument). This
  * is the same rewrite family as Spark's own `InferWindowGroupLimit`,
  * taken one step further: group-limit still sorts the survivors through
  * WindowExec; the heap operator never sorts more than k rows per key.
  *
  * Fires only when ALL of:
  *   - the window computes EXACTLY ONE expression, a `row_number()`
  *     (rank/dense_rank admit >n rows on ties — different semantics);
  *   - the filter is a simple bound on it (`rn <= n`, `rn < n`,
  *     `n >= rn`, `n > rn`, `rn = 1`) with n a positive int literal;
  *   - the enclosing projection DROPS the rank column (the operator does
  *     not produce it).
  *
  * Tie semantics: with a non-total per-key order, which tied rows the
  * window form keeps is already engine-internal nondeterminism; the heap
  * keeps a (possibly different) equally-valid subset. Orders with a
  * unique tiebreak — every oracle-checked query here — are unaffected.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or imperatively with [[GraftOpt.enable]]
  * (`experimental.extraOptimizations`, which Spark runs as a final
  * optimizer batch — AFTER `InferWindowGroupLimit`, so the matcher also
  * unwraps an inferred [[WindowGroupLimit]] under the window).
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** `cond` as an inclusive top-k bound on the rank attribute, if it is one. */
  private def boundOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType))
      if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(out, Filter(cond,
        Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), _)),
        _, _, wchild, _)))
        if order.nonEmpty && part.nonEmpty &&
          !out.exists(_.references.exists(_.exprId == alias.exprId)) =>
      boundOf(cond, alias.exprId) match {
        case Some(k) if k > 0 =>
          val child = wchild match {
            // an inferred group-limit is a weaker form of the same cut —
            // the heap subsumes it
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          Project(out, TopKPerKey(k, part, order, child))
        case _ => p
      }
  }
}

/** Imperative enablement for sessions not built with
  * [[graft.functions.GraftExtensions]] (e.g. driver-supplied): adds the
  * rewrite rule AND the planner strategy that executes its output.
  * Idempotent.
  */
object GraftOpt {
  def enable(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.Bridge.addStrategy(spark, TopKPerKeyStrategy)
    if (!spark.experimental.extraOptimizations.contains(RewriteRankFilterToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankFilterToTopK
  }

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteRankFilterToTopK)
}
