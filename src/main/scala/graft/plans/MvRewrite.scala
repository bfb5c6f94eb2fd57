package graft.plans

import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** A registered materialized pre-aggregate: answers fact-table rollups
  * whose grouping keys are a SUBSET of `keys` and whose aggregates are
  * all derivable from the stored partial states.
  *
  * - `srcPathTag`: identifies the fact scan — a substring of the
  *   relation's root path (e.g. "/lineitem").
  * - `keys`: MV grouping columns, SAME NAMES as the fact columns.
  * - `sums`: fact measure name → MV column holding SUM(measure) at MV
  *   grain. SUM re-aggregates by summing partials.
  * - `countCol`: MV column holding COUNT(*) at MV grain. COUNT(*)
  *   re-aggregates as SUM(countCol).
  * - `freshView`: the analyzed logical plan of the MV contents. The
  *   REGISTRANT owns freshness: the view must equal the fact rollup at
  *   registration grain (the classic MV contract).
  *
  * Exactness: rollup equivalence is exact for integer partials. For
  * double partials the rewrite re-associates the addition (the usual
  * floating-point MV caveat) — register integer/decimal-backed sums
  * where bit-reproducibility matters (the repo's parity queries use
  * exact decimal sums, which this rule deliberately does NOT match).
  */
final case class MvDef(
    srcPathTag: String,
    keys: Set[String],
    sums: Map[String, String],
    countCol: Option[String],
    freshView: () => LogicalPlan)

/** Aggregate navigator (the classic materialized-view rewrite —
  * Goldstein & Larson, SIGMOD 2001 shape, scoped to rollups): an
  * optimizer rule that retargets `Aggregate` over the registered fact
  * scan onto a pre-aggregated view when every output is derivable —
  * grouping keys ⊆ MV keys, aggregates ∈ {SUM(measure), COUNT(*)}
  * over registered partials, residual filters referencing key columns
  * only (they re-state verbatim on the MV). The reference's
  * `vista_agregada_mensual` exists precisely to serve coarser
  * queries (`sql/CreacionDeUsuariosyVistas.sql:21-196`); this rule is
  * the Spark-native rendition — the user keeps writing queries
  * against the fact, and a 100 TB scan becomes an MV-sized one.
  *
  * Output schema is preserved exactly: every rewritten aggregate
  * expression keeps its original name and `exprId`, so parent
  * operators' references bind unchanged. Any non-derivable output —
  * a different aggregate function, a distinct, an uncovered measure,
  * a type mismatch between the original aggregate and the stored
  * partial — vetoes the rewrite for that Aggregate (fail-open: the
  * fact plan stands).
  */
object MvRewrite extends Rule[LogicalPlan] {

  private val registry = new CopyOnWriteArrayList[MvDef]()

  def register(d: MvDef): Unit = registry.add(d)
  def clear(): Unit = registry.clear()

  /** Root paths of all V1 file relations in `plan` — lets callers
    * assert a rewrite actually happened (no fact path left).
    */
  def scanPaths(plan: LogicalPlan): Seq[String] = plan.collect {
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
      case _ => Nil
    }
  }.flatten

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        val it = registry.iterator()
        var out: LogicalPlan = agg
        var done = false
        while (it.hasNext && !done) {
          tryRewrite(agg, it.next()) match {
            case Some(r) => out = r; done = true
            case None =>
          }
        }
        out
    }

  /** Strip column-pruning Projects and collect Filters down to the
    * fact scan. Only attribute-only Projects and deterministic filter
    * conditions qualify; anything else vetoes.
    */
  private def unwrap(
      p: LogicalPlan, tag: String): Option[(Seq[Expression], LogicalRelation)] =
    p match {
      case l: LogicalRelation =>
        val isFact = l.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.exists(_.toString.contains(tag))
          case _ => false
        }
        if (isFact) Some((Nil, l)) else None
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, tag)
      case Filter(cond, child) if cond.deterministic =>
        unwrap(child, tag).map { case (cs, rel) => (cond +: cs, rel) }
      case _ => None
    }

  private def tryRewrite(agg: Aggregate, d: MvDef): Option[LogicalPlan] = try {
    val (conds, _) = unwrap(agg.child, d.srcPathTag).getOrElse(return None)

    // grouping keys: plain attributes, all covered by the MV grain
    val grpAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) => a
      case _ => return None
    }
    // residual filters may reference key columns only
    val condRefs = conds.flatMap(_.references.toSeq)
    if (!condRefs.forall(r => d.keys.contains(r.name))) return None

    lazy val mv = d.freshView()
    // missing MV column ⇒ veto: thrown as a plain exception, landing in
    // the fail-open NonFatal catch below
    def mvAttr(name: String): Attribute =
      mv.output.find(_.name == name).getOrElse(
        throw new NoSuchElementException(s"MV lacks column $name"))

    def underlying(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case Cast(a: AttributeReference, _, _, _) => Some(a)
      case _ => None
    }

    val rewritten: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if d.keys.contains(a.name) =>
        Alias(mvAttr(a.name), name)(exprId = al.exprId)
      case al @ Alias(
          ae @ AggregateExpression(s @ Sum(ch, _), _, false, None, _), name) =>
        val fact = underlying(ch).getOrElse(return None)
        val mvCol = d.sums.get(fact.name).map(mvAttr).getOrElse(return None)
        // the stored partial must carry the exact type the original
        // SUM accumulated, and re-summing must not change the result
        // type (Long and Double are closed under SUM; decimal widens
        // precision, so it is deliberately not matched)
        if (mvCol.dataType != ch.dataType) return None
        if (ch.dataType != LongType && ch.dataType != DoubleType) return None
        Alias(ae.copy(aggregateFunction = s.withNewChildren(Seq(mvCol))
          .asInstanceOf[AggregateFunction]), name)(exprId = al.exprId)
      case al @ Alias(
          ae @ AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _),
          name) =>
        val cnt = d.countCol.map(mvAttr).getOrElse(return None)
        if (cnt.dataType != LongType) return None
        Alias(ae.copy(aggregateFunction = Sum(cnt)), name)(exprId = al.exprId)
      case _ => return None
    }

    val newGroupings = grpAttrs.map(g => mvAttr(g.name))
    val mvKeyFor = grpAttrs.map(g => g.exprId -> mvAttr(g.name)).toMap ++
      condRefs.map(r => r.exprId -> mvAttr(r.name)).toMap
    val newChild = conds.foldLeft(mv) { (c, cond) =>
      Filter(cond.transform {
        case a: AttributeReference => mvKeyFor.getOrElse(a.exprId, a)
      }, c)
    }
    Some(Aggregate(newGroupings, rewritten, newChild))
  } catch {
    case scala.util.control.NonFatal(_) => None // fail-open: keep the fact plan
  }
}
