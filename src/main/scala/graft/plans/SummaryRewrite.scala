package graft.plans

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent aggregate navigation — the warehouse "summary table"
  * rewrite (Gray et al., Data Cube; every OLAP server's aggregate
  * navigator): when a maintained summary exists at a grain at least as
  * fine as a query's grouping, answer the query from the summary
  * instead of the fact table.
  *
  * The reference's dashboard recomputes the same fact-table aggregates
  * on every page interaction (streamlit.py:52–131 metric cards and
  * per-type/per-period rollups over the full transaction table); at
  * 100 TB that workload is exactly what summary navigation exists for:
  * the rewrite turns a full fact scan into a scan of a
  * days×types-sized table — orders of magnitude less IO — at plan
  * time, with zero per-query runtime cost and no query rewrite by the
  * user.
  *
  * Spark-first shape: this is a logical [[Rule]] injected via
  * `SparkSessionExtensions.injectOptimizerRule` (see
  * [[graft.GraftExtensions]]), running inside the operator-optimization
  * fixed-point batch — so it composes with (and benefits from) the
  * built-in normal form: by the time it matches, casts are simplified,
  * filters are pushed toward the scan, and after it fires, column
  * pruning and AQE apply to the summary scan like any other.
  *
  * Soundness gate (ALL must hold, else the plan is left untouched):
  *  - the aggregate's child is a Project/Filter chain over exactly the
  *    registered base relation (matched by scan root paths);
  *  - every grouping expression lowers (through the Projects) to a
  *    plain base column that is a registered summary key;
  *  - every filter references only summary-key columns (so it can run
  *    against the summary's verbatim key values);
  *  - every aggregate is one of count(*) / sum(m) / min(m) / max(m)
  *    with no DISTINCT and no FILTER clause, where `m` lowers to a
  *    registered measure expression (matched structurally modulo
  *    attribute ids) — rewritten to the re-aggregable partials
  *    sum(cnt) / sum(sum_m) / min(min_m) / max(max_m);
  *  - the rewritten output carries the original attribute ids, names
  *    and types (asserted), so parent operators are untouched.
  *
  * Staleness: a registered summary is trusted for the JVM's lifetime —
  * the same immutable-input assumption [[graft.io.Tables]] documents
  * for its compaction memo (the engine's inputs are read-only snapshot
  * dirs). A deployment with mutating base tables refreshes the summary
  * and re-registers, or keys registration on a snapshot version.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** A/B switch (used by the spec to pin result-equality and plan shape
    * with the rule on vs off). */
  val EnabledKey = "spark.graft.summaryRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SummaryRegistry.isEmpty ||
      conf.getConfString(EnabledKey, "true") != "true") plan
    else plan.transformDown {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] =
    for {
      (rel, filters, lower) <- unwrap(agg.child)
      paths <- scanPaths(rel)
      d <- SummaryRegistry.lookup(paths)
      rewritten <- rewrite(agg, d, filters, lower)
    } yield rewritten

  /** Walk a Project/Filter chain down to its scan, returning the scan,
    * the filter conditions lowered to scan scope, and a `lower`
    * function mapping any expression phrased over `plan`'s output to
    * one phrased over the scan's output (Project aliases substituted).
    * Any other operator in the chain → no match. */
  private def unwrap(plan: LogicalPlan)
      : Option[(LogicalRelation, Seq[Expression], Expression => Expression)] =
    plan match {
      case r: LogicalRelation => Some((r, Nil, identity))
      case Filter(cond, child) =>
        unwrap(child).map { case (r, fs, lower) => (r, lower(cond) +: fs, lower) }
      case Project(list, child) =>
        unwrap(child).map { case (r, fs, lowerChild) =>
          val subst: Map[ExprId, Expression] = list.map {
            case a: Alias => a.exprId -> lowerChild(a.child)
            case ne => ne.exprId -> lowerChild(ne.toAttribute)
          }.toMap
          val lower: Expression => Expression = e => e.transform {
            case ar: AttributeReference if subst.contains(ar.exprId) => subst(ar.exprId)
          }
          (r, fs, lower)
        }
      case _ => None
    }

  private def scanPaths(rel: LogicalRelation): Option[Set[String]] =
    rel.relation match {
      case h: HadoopFsRelation => Some(h.location.rootPaths.map(_.toString).toSet)
      case _ => None
    }

  private def rewrite(agg: Aggregate, d: SummaryDef, filters: Seq[Expression],
      lower: Expression => Expression): Option[Aggregate] = {
    // Fresh attribute ids for this use of the summary scan, so two
    // rewritten aggregates in one plan can't collide.
    val fresh = d.summaryRelation.newInstance()
    val freshByName: Map[String, Attribute] = fresh.output.map(a => a.name -> a).toMap

    def keyAttr(e: Expression): Option[AttributeReference] = lower(e) match {
      case ar: AttributeReference if d.keyCols(ar.name) => Some(ar)
      case _ => None
    }
    def onlyKeys(e: Expression): Boolean =
      e.references.forall(a => d.keyCols(a.name))
    def toSummary(e: Expression): Expression = e.transform {
      case ar: AttributeReference => freshByName(ar.name)
    }

    val groupKeys: Option[Seq[AttributeReference]] =
      traverse(agg.groupingExpressions.map(keyAttr))
    val loweredFilters = filters.map(lower)

    val aggsRewritten: Option[Seq[NamedExpression]] =
      traverse(agg.aggregateExpressions.map {
        // grouping passthrough: keep the original id so parents resolve
        case ar: AttributeReference =>
          keyAttr(ar).map(k =>
            Alias(freshByName(k.name), ar.name)(exprId = ar.exprId))
        case a @ Alias(child, _) if keyAttr(child).isDefined =>
          keyAttr(child).map(k =>
            Alias(freshByName(k.name), a.name)(exprId = a.exprId))
        case a @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
          reAgg(fn, d, lower, freshByName).map(newFn =>
            Alias(AggregateExpression(newFn, Complete, isDistinct = false),
              a.name)(exprId = a.exprId))
        case _ => None
      })

    for {
      gks <- groupKeys
      aggs <- aggsRewritten
      if loweredFilters.forall(onlyKeys)
      newFilters = loweredFilters.map(toSummary)
      child = newFilters.reduceOption(And).map(Filter(_, fresh)).getOrElse(fresh)
      out = Aggregate(gks.map(k => freshByName(k.name)), aggs, child)
      // belt-and-braces: the rewrite must be output-transparent
      if out.output.map(a => (a.name, a.dataType)) ==
        agg.output.map(a => (a.name, a.dataType))
    } yield out
  }

  /** Map a base-table aggregate function to its re-aggregation over the
    * summary's partial columns, or None if it isn't covered. */
  private def reAgg(fn: AggregateFunction, d: SummaryDef,
      lower: Expression => Expression,
      freshByName: Map[String, Attribute]): Option[AggregateFunction] = fn match {
    case c: Count if c.children.forall(_.foldable) =>
      Some(Sum(freshByName(d.cntCol)))
    case Sum(e, ctx) =>
      d.sums.collectFirst {
        case (col, t) if t == SummaryRegistry.normalize(lower(e)) =>
          Sum(freshByName(col), ctx)
      }
    case Min(e) =>
      d.mins.collectFirst {
        case (col, t) if t == SummaryRegistry.normalize(lower(e)) =>
          Min(freshByName(col))
      }
    case Max(e) =>
      d.maxs.collectFirst {
        case (col, t) if t == SummaryRegistry.normalize(lower(e)) =>
          Max(freshByName(col))
      }
    case _ => None
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}

/** One registered summary: which base scan it covers, where its parquet
  * lives, and how query-side expressions map onto its columns.
  * Measure templates are stored in [[SummaryRegistry.normalize]]d form
  * (attribute ids erased) so they compare structurally against lowered
  * query expressions. */
final case class SummaryDef(
    basePaths: Set[String],
    summaryPath: String,
    keyCols: Set[String],
    cntCol: String,
    sums: Seq[(String, Expression)],
    mins: Seq[(String, Expression)],
    maxs: Seq[(String, Expression)],
    summaryRelation: LogicalRelation)

/** JVM-wide summary registry, keyed by the base scan's root paths.
  * Registration is idempotent; [[clear]] exists for specs. */
object SummaryRegistry {

  private val defs =
    new java.util.concurrent.ConcurrentHashMap[Set[String], SummaryDef]()

  def isEmpty: Boolean = defs.isEmpty
  def lookup(paths: Set[String]): Option[SummaryDef] = Option(defs.get(paths))
  def register(d: SummaryDef): Unit = { defs.put(d.basePaths, d); () }
  def clear(): Unit = defs.clear()

  /** Erase attribute identity (ids, qualifiers, case, nullability) so
    * two expressions over different resolutions of the same table
    * compare structurally by column NAME. */
  private[plans] def normalize(e: Expression): Expression = e.transform {
    case ar: AttributeReference =>
      AttributeReference(ar.name.toLowerCase(Locale.ROOT), ar.dataType,
        nullable = true)(exprId = ExprId(0L), qualifier = Seq.empty)
  }

  /** Build a [[SummaryDef]] from the base DataFrame (its scan paths are
    * extracted from the analyzed plan), the summary parquet path, and
    * the measure definitions as Columns over the base table. Measure
    * templates are resolved+optimized through a throwaway projection so
    * they sit in the optimizer's normal form — the same form the
    * rewrite rule sees query expressions in. */
  def define(base: DataFrame, summaryPath: String, keyCols: Seq[String],
      cntCol: String, sumCols: Seq[(String, Column)],
      minCols: Seq[(String, Column)], maxCols: Seq[(String, Column)]): SummaryDef = {
    val spark = base.sparkSession
    val basePaths = base.queryExecution.analyzed.collectFirst {
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString).toSet
      }
    }.getOrElse(throw new IllegalArgumentException(
      "summary base must be a single file-source scan"))
    val sumRel = spark.read.parquet(summaryPath).queryExecution.analyzed
      .collectFirst { case r: LogicalRelation => r }
      .getOrElse(throw new IllegalArgumentException(
        s"summary at $summaryPath did not analyze to a file-source scan"))
    def template(c: Column): Expression = {
      val p = base.select(c.as("__m")).queryExecution.optimizedPlan
      p.collectFirst { case pr: Project =>
        pr.projectList.collectFirst { case a: Alias if a.name == "__m" => a.child }
      }.flatten.map(normalize).getOrElse(throw new IllegalArgumentException(
        s"measure $c did not resolve to a projection over the base scan"))
    }
    SummaryDef(basePaths, summaryPath, keyCols.toSet, cntCol,
      sumCols.map { case (n, c) => n -> template(c) },
      minCols.map { case (n, c) => n -> template(c) },
      maxCols.map { case (n, c) => n -> template(c) },
      sumRel)
  }
}
