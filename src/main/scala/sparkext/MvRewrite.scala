package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, ExprId, KnownNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view rewrite — an optimizer `Rule[LogicalPlan]` that
  * redirects an aggregate over a REGISTERED base relation to a
  * pre-aggregated parquet MV, re-aggregating the MV when the query
  * groups by a SUBSET of the MV's dimensions (the classic rollup
  * property: sum-of-sums, sum-of-counts, min-of-mins, max-of-maxes).
  * The "pay the layout once" family's third member: q104 buckets the
  * JOIN shuffle away, q267 prunes the FILTER's directories, this one
  * removes the AGGREGATE's base scan entirely — the nightly-dashboard
  * pattern where a 100 TB fact table answers grouped rollups from a
  * few thousand MV rows.
  *
  * Matching is conservative (fire only when provably correct):
  *  - the aggregate's child must be the registered base relation —
  *    a `LogicalRelation` over the same file paths, optionally under
  *    a pure column-pruning `Project` (what the optimizer leaves
  *    under an Aggregate);
  *  - every grouping expression must be a bare column of the MV's
  *    dimension set;
  *  - every aggregate must be Sum/Min/Max over an expression the MV
  *    registered (compared structurally with exprIds neutralized —
  *    the query's attributes carry different ids than the
  *    registration's), or Count(*)/Count(lit) mapped to the MV's
  *    count column. Anything else → no rewrite, the query runs
  *    against the base (correctness never depends on the rule).
  *
  * The rewrite keeps every output `exprId` (aliases re-issued with
  * the original ids), so parent operators re-bind without a fixup
  * pass. DISTINCT aggregates and filter clauses disqualify. Installed
  * through `spark.experimental.extraOptimizations` (public API,
  * per-session, idempotent) — the [[AsOfJoinNative]] convention. */
object MvRewrite {

  /** sumMap: canonical-ized Sum/Min/Max child expression (from the
    * registration call) → MV column name. */
  private final case class MvDef(
      basePaths: Seq[String],
      dims: Set[String],
      mvPlan: LogicalPlan,
      sumMap: Seq[(Expression, String)],
      minMap: Seq[(Expression, String)],
      maxMap: Seq[(Expression, String)],
      countCol: Option[String])

  @volatile private var defs: Vector[MvDef] = Vector.empty

  /** Neutralize exprIds/qualifiers so structurally-identical
    * expressions over same-named columns compare equal regardless of
    * which analysis run produced them. */
  private def norm(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      AttributeReference(a.name, a.dataType, a.nullable)(
        exprId = ExprId(0), qualifier = Nil)
  }

  private def rootPaths(plan: LogicalPlan): Option[Seq[String]] =
    plan match {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        Some(h.location.rootPaths.map(_.toString))
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        rootPaths(child)
      case _ => None
    }

  /** Register `mv` (a parquet-backed pre-aggregate of `base`) for
    * rewriting. `sumCols`/`minCols`/`maxCols`: base-side expression →
    * MV column holding its per-group aggregate; `countCol`: MV column
    * holding the per-group row count. */
  def register(base: DataFrame, dims: Seq[String], mv: DataFrame,
               sumCols: Seq[(org.apache.spark.sql.Column, String)] = Nil,
               minCols: Seq[(org.apache.spark.sql.Column, String)] = Nil,
               maxCols: Seq[(org.apache.spark.sql.Column, String)] = Nil,
               countCol: Option[String] = None): Unit = {
    val ss = base.sparkSession
    if (!ss.experimental.extraOptimizations.exists(_ eq MvRewriteRule))
      ss.experimental.extraOptimizations ++= Seq(MvRewriteRule)
    val analyzedBase = base.queryExecution.analyzed
    val paths = rootPaths(analyzedBase).getOrElse(throw
      new IllegalArgumentException(
        "MvRewrite.register: base must be a plain file relation"))
    def bind(c: org.apache.spark.sql.Column): Expression =
      norm(base.select(c).queryExecution.analyzed
        .asInstanceOf[Project].projectList.head match {
        case Alias(child, _) => child
        case other => other
      })
    defs :+= MvDef(paths, dims.toSet,
      mv.queryExecution.analyzed,
      sumCols.map { case (c, m) => (bind(c), m) },
      minCols.map { case (c, m) => (bind(c), m) },
      maxCols.map { case (c, m) => (bind(c), m) },
      countCol)
  }

  /** Drop all registrations (spec hygiene). */
  def clear(): Unit = { defs = Vector.empty }

  object MvRewriteRule extends Rule[LogicalPlan] {
    private def mvAttr(m: MvDef, name: String): Option[AttributeReference] =
      m.mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }

    private def rewriteAgg(agg: Aggregate, m: MvDef): Option[Aggregate] = {
      // global aggregates (no grouping) are NOT rewritten: over an
      // empty base, count(*) is 0 but the MV-side sum(cnt) is NULL
      if (agg.groupingExpressions.isEmpty) return None
      // groupings: bare MV dimension columns only
      val groupOk = agg.groupingExpressions.forall {
        case a: AttributeReference => m.dims.contains(a.name)
        case _ => false
      }
      if (!groupOk) return None
      val newAggExprs = agg.aggregateExpressions.map { ne =>
        rewriteNamed(ne, m).getOrElse(return None)
      }
      val newGroups = agg.groupingExpressions.map {
        case a: AttributeReference => mvAttr(m, a.name).getOrElse(return None)
      }
      Some(Aggregate(newGroups, newAggExprs, m.mvPlan))
    }

    private def rewriteNamed(ne: NamedExpression,
                             m: MvDef): Option[NamedExpression] = ne match {
      case a: AttributeReference if m.dims.contains(a.name) =>
        // group column in the output: re-alias the MV's attribute
        // under the ORIGINAL exprId so parents re-bind unchanged
        mvAttr(m, a.name).map(mva => Alias(mva, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val inner: Option[Expression] = ae.aggregateFunction match {
          case Sum(child, mode) =>
            m.sumMap.collectFirst { case (e, col) if e == norm(child) =>
              ae.copy(aggregateFunction =
                Sum(mvAttr(m, col).getOrElse(return None), mode))
            }
          case Min(child) =>
            m.minMap.collectFirst { case (e, col) if e == norm(child) =>
              ae.copy(aggregateFunction =
                Min(mvAttr(m, col).getOrElse(return None)))
            }
          case Max(child) =>
            m.maxMap.collectFirst { case (e, col) if e == norm(child) =>
              ae.copy(aggregateFunction =
                Max(mvAttr(m, col).getOrElse(return None)))
            }
          case Count(children)
              if children.forall(_.isInstanceOf[Literal]) =>
            // count(*) / count(1): sum of the MV's per-group counts
            m.countCol.map(col => ae.copy(aggregateFunction =
              Sum(mvAttr(m, col).getOrElse(return None))))
          case _ => None
        }
        inner.map { e =>
          // the alias keeps the ORIGINAL exprId, so it must also keep
          // the original dataType/nullability — parents bound to the
          // attribute would otherwise see a different type
          // mid-optimization: Sum over an already-widened decimal MV
          // column re-widens precision, and Count(*) -> Sum(cnt) swaps
          // a non-nullable long for a nullable one. Cast back (lossless:
          // same logical total, narrower only by the spurious
          // re-widening) and re-assert non-nullability (sound: grouping
          // is non-empty, so every group has >= 1 MV row with a
          // non-null cnt).
          val retyped =
            if (e.dataType != ae.dataType)
              Cast(e, ae.dataType, Option(conf.sessionLocalTimeZone))
            else e
          val renulled =
            if (!ae.nullable && retyped.nullable) KnownNotNull(retyped)
            else retyped
          Alias(renulled, name)(exprId = al.exprId)
        }
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg: Aggregate =>
        defs.view
          .filter(m => rootPaths(agg.child).contains(m.basePaths))
          .flatMap(m => rewriteAgg(agg, m))
          .headOption.getOrElse(agg)
    }
  }
}
