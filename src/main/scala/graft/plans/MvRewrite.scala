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
  * - `valueCounts`: fact measure name → MV column holding
  *   COUNT(measure) (non-null count) at MV grain. AVG(measure)
  *   derives as SUM(sumPartial) / SUM(valueCountPartial) for
  *   long-backed measures — exact integer partials, one final IEEE
  *   division, provided the long sum stays below 2^53 (the repo-wide
  *   decimal→double rule; the fact-side Average accumulates a double,
  *   identical in that range). COUNT(*) partials are NOT a substitute:
  *   a nullable measure would divide by the wrong denominator.
  * - `mins` / `maxs`: fact measure name → MV column holding
  *   MIN/MAX(measure) at MV grain. Directly rollable (min of mins,
  *   max of maxs) — exact for every ordered type.
  * - `countCol`: MV column holding COUNT(*) at MV grain. COUNT(*)
  *   re-aggregates as SUM(countCol), coalesced to 0 for the global
  *   (no-grouping) case where an empty rewritten child must still
  *   yield count 0, not NULL.
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
    freshView: () => LogicalPlan,
    mins: Map[String, String] = Map.empty,
    maxs: Map[String, String] = Map.empty,
    valueCounts: Map[String, String] = Map.empty)

/** Aggregate navigator (the classic materialized-view rewrite —
  * Goldstein & Larson, SIGMOD 2001 shape, scoped to rollups): an
  * optimizer rule that retargets `Aggregate` over the registered fact
  * scan onto a pre-aggregated view when every output is derivable —
  * grouping keys ⊆ MV keys, aggregates ∈ {SUM(measure), COUNT(*),
  * MIN/MAX(measure), AVG(measure)} over registered partials, residual
  * filters referencing key columns only (they re-state verbatim on
  * the MV). The reference's `vista_agregada_mensual` exists precisely
  * to serve coarser queries (`sql/CreacionDeUsuariosyVistas.sql:21-196`);
  * this rule is the Spark-native rendition — the user keeps writing
  * queries against the fact, and a 100 TB scan becomes an MV-sized one.
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
  def deregister(d: MvDef): Unit = registry.remove(d)
  def clear(): Unit = registry.clear()

  /** Run `body` with `d` registered, then ALWAYS deregister exactly
    * `d` (not the whole registry) — scopes the rewrite to one query so
    * the global registry can't serve a later query (or a different
    * fixture dir in the same JVM) stale MV data, while composing with
    * nested/concurrent `withMv` blocks registering other MVs.
    */
  def withMv[T](d: MvDef)(body: => T): T = {
    register(d)
    try body finally deregister(d)
  }

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

  /** Derivability veto: aborts [[tryRewrite]] into its fail-open
    * catch. A dedicated ControlThrowable-free exception (not Scala's
    * deprecated non-local return, whose NonLocalReturnControl only
    * survived the NonFatal catch by accident of being a
    * ControlThrowable).
    */
  private final class Veto extends RuntimeException {
    override def fillInStackTrace(): Throwable = this // cheap: control flow only
  }
  private def veto(): Nothing = throw new Veto

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
    val (conds, _) = unwrap(agg.child, d.srcPathTag).getOrElse(veto())

    // grouping keys: plain attributes, all covered by the MV grain
    val grpAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) => a
      case _ => veto()
    }
    val isGlobal = grpAttrs.isEmpty
    // residual filters may reference key columns only
    val condRefs = conds.flatMap(_.references.toSeq)
    if (!condRefs.forall(r => d.keys.contains(r.name))) veto()

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

    // SUM(countCol) re-states COUNT(*); the global (no-grouping) case
    // must coalesce to 0L — an empty MV after residual filters yields
    // SUM = NULL where the fact plan's COUNT yields 0.
    // fresh resultIds throughout: the AVG path emits TWO aggregate
    // expressions derived from one original — sharing its resultId
    // would collide in physical aggregation (the Alias keeps the
    // original exprId, so parent references still bind unchanged)
    def countAsSum(ae: AggregateExpression): Expression = {
      val cnt = d.countCol.map(mvAttr).getOrElse(veto())
      if (cnt.dataType != LongType) veto()
      val sum = ae.copy(aggregateFunction = Sum(cnt),
        resultId = NamedExpression.newExprId)
      if (isGlobal) Coalesce(Seq(sum, Literal(0L))) else sum
    }

    def mvPartial(part: Map[String, String], ch: Expression): Attribute = {
      val fact = underlying(ch).getOrElse(veto())
      val mvCol = part.get(fact.name).map(mvAttr).getOrElse(veto())
      if (mvCol.dataType != ch.dataType) veto()
      mvCol
    }

    val rewritten: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if d.keys.contains(a.name) =>
        Alias(mvAttr(a.name), name)(exprId = al.exprId)
      case al @ Alias(
          ae @ AggregateExpression(s @ Sum(ch, _), _, false, None, _), name) =>
        // the stored partial must carry the exact type the original
        // SUM accumulated, and re-summing must not change the result
        // type (Long and Double are closed under SUM; decimal widens
        // precision, so it is deliberately not matched)
        if (ch.dataType != LongType && ch.dataType != DoubleType) veto()
        val mvCol = mvPartial(d.sums, ch)
        Alias(ae.copy(aggregateFunction = s.withNewChildren(Seq(mvCol))
          .asInstanceOf[AggregateFunction]), name)(exprId = al.exprId)
      case al @ Alias(
          ae @ AggregateExpression(m @ Min(ch), _, false, None, _), name) =>
        // min of per-group mins — exact for every ordered type
        val mvCol = mvPartial(d.mins, ch)
        Alias(ae.copy(aggregateFunction = m.withNewChildren(Seq(mvCol))
          .asInstanceOf[AggregateFunction]), name)(exprId = al.exprId)
      case al @ Alias(
          ae @ AggregateExpression(m @ Max(ch), _, false, None, _), name) =>
        val mvCol = mvPartial(d.maxs, ch)
        Alias(ae.copy(aggregateFunction = m.withNewChildren(Seq(mvCol))
          .asInstanceOf[AggregateFunction]), name)(exprId = al.exprId)
      case al @ Alias(
          ae @ AggregateExpression(Average(ch, _), _, false, None, _), name) =>
        // AVG = SUM(sumPartial)/SUM(valueCountPartial): exact for
        // long-backed measures (integer partials, ONE final IEEE
        // division — the fact-side Average's double accumulation is
        // identical below 2^53). Double sums re-associate ⇒ veto; a
        // measure without a registered non-null count ⇒ veto (COUNT(*)
        // would be the wrong denominator for a nullable measure).
        if (ch.dataType != LongType) veto()
        val fact = underlying(ch).getOrElse(veto())
        val mvSum = mvPartial(d.sums, ch)
        val vCnt = d.valueCounts.get(fact.name).map(mvAttr).getOrElse(veto())
        if (vCnt.dataType != LongType) veto()
        val sumExpr = ae.copy(aggregateFunction = Sum(mvSum),
          resultId = NamedExpression.newExprId)
        val cntExpr = ae.copy(aggregateFunction = Sum(vCnt),
          resultId = NamedExpression.newExprId)
        Alias(Divide(Cast(sumExpr, DoubleType), Cast(cntExpr, DoubleType)),
          name)(exprId = al.exprId)
      case al @ Alias(
          ae @ AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _),
          name) =>
        Alias(countAsSum(ae), name)(exprId = al.exprId)
      case _ => veto()
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
