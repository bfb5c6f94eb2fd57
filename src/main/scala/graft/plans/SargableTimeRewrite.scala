package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule making `year(d)`-style predicates sargable.
  *
  * `WHERE year(d) = 1997` is opaque to the parquet reader: a function
  * call never reaches `PushedFilters`, so every row group of a 100 TB
  * time-ordered fact is read and decoded just to evaluate a predicate
  * that row-group min/max stats could have answered. The reference
  * leans on exactly this shape (`dt.anio = p.anio`,
  * `sql/ConsultasAlDataWarehouse.sql:13`) — its PostgreSQL planner
  * has an index on the dimension column; Spark's analog is scan
  * pruning, which needs the predicate stated on the raw column.
  *
  * This rule rewrites, inside every `Filter` condition:
  *
  *   - `year(d) = y`      → `d >= 'y-01-01' AND d < '(y+1)-01-01'`
  *   - `year(d) >/>=/</<= y` (both operand orders) → one-sided range
  *   - `year(d) IN (y1..yn)` (n ≤ 8) → OR of per-year ranges
  *
  * for `d` of DateType, TimestampNTZType, or TimestampType (boundary
  * instants computed in the cast's session time zone — the analyzer
  * plans `year(ts)` as `Year(Cast(ts, DateType, tz))`). The rewrite
  * is exact under three-valued logic: a null `d` makes both forms
  * NULL, so equivalence holds even under `NOT`. `year(d) <=> y` is
  * NOT rewritten (it is FALSE, not NULL, on null input). Rows-level
  * semantics never change — only what the scan can see.
  *
  * [[graft.functions.TimePred]] is the explicit DataFrame-side
  * spelling of the same ranges; this rule covers the SQL surface and
  * any plan composed without it.
  */
object SargableTimeRewrite extends Rule[LogicalPlan] {

  // stay well inside Spark's proleptic date range so y+1 never overflows
  private val MinYear = 1
  private val MaxYear = 9000

  private def dateLit(y: Int): Literal =
    Literal(java.time.LocalDate.of(y, 1, 1).toEpochDay.toInt, DateType)

  private def ntzLit(y: Int): Literal =
    Literal(
      java.time.LocalDateTime.of(y, 1, 1, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L,
      TimestampNTZType)

  private def tzLit(zone: String)(y: Int): Literal = {
    val inst = java.time.ZonedDateTime
      .of(y, 1, 1, 0, 0, 0, 0, java.time.ZoneId.of(zone)).toInstant
    Literal(inst.getEpochSecond * 1000000L + inst.getNano / 1000L, TimestampType)
  }

  /** The sargable column + year→boundary-literal builder, when `e` is
    * `year(...)` of a supported column. Deterministic children only —
    * the rewrite states the child twice.
    */
  private def yearOf(e: Expression): Option[(Expression, Int => Literal)] = e match {
    case Year(c) if c.dataType == DateType && c.deterministic =>
      Some((c, dateLit))
    case Year(Cast(c, DateType, _, _)) if c.dataType == TimestampNTZType && c.deterministic =>
      Some((c, ntzLit))
    case Year(Cast(c, DateType, tz, _)) if c.dataType == TimestampType && c.deterministic =>
      Some((c, tzLit(tz.getOrElse(conf.sessionLocalTimeZone))))
    case _ => None
  }

  private def yearLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) if v >= MinYear && v < MaxYear => Some(v)
    case _ => None
  }

  private def yearRange(c: Expression, mk: Int => Literal, y: Int): Expression =
    And(GreaterThanOrEqual(c, mk(y)), LessThan(c, mk(y + 1)))

  private val rewrite: PartialFunction[Expression, Expression] = {
    case e @ EqualTo(l, r) =>
      (yearOf(l), yearLit(r), yearOf(r), yearLit(l)) match {
        case (Some((c, mk)), Some(y), _, _) => yearRange(c, mk, y)
        case (_, _, Some((c, mk)), Some(y)) => yearRange(c, mk, y)
        case _ => e
      }
    case e @ GreaterThanOrEqual(l, r) =>
      (yearOf(l), yearLit(r), yearOf(r), yearLit(l)) match {
        case (Some((c, mk)), Some(y), _, _) => GreaterThanOrEqual(c, mk(y))
        case (_, _, Some((c, mk)), Some(y)) => LessThan(c, mk(y + 1)) // y >= year(d)
        case _ => e
      }
    case e @ GreaterThan(l, r) =>
      (yearOf(l), yearLit(r), yearOf(r), yearLit(l)) match {
        case (Some((c, mk)), Some(y), _, _) => GreaterThanOrEqual(c, mk(y + 1))
        case (_, _, Some((c, mk)), Some(y)) => LessThan(c, mk(y)) // y > year(d)
        case _ => e
      }
    case e @ LessThanOrEqual(l, r) =>
      (yearOf(l), yearLit(r), yearOf(r), yearLit(l)) match {
        case (Some((c, mk)), Some(y), _, _) => LessThan(c, mk(y + 1))
        case (_, _, Some((c, mk)), Some(y)) => GreaterThanOrEqual(c, mk(y)) // y <= year(d)
        case _ => e
      }
    case e @ LessThan(l, r) =>
      (yearOf(l), yearLit(r), yearOf(r), yearLit(l)) match {
        case (Some((c, mk)), Some(y), _, _) => LessThan(c, mk(y))
        case (_, _, Some((c, mk)), Some(y)) => GreaterThanOrEqual(c, mk(y + 1)) // y < year(d)
        case _ => e
      }
    case e @ In(v, list) if list.nonEmpty && list.size <= 8 =>
      (yearOf(v), list.map(yearLit)) match {
        case (Some((c, mk)), ys) if ys.forall(_.isDefined) =>
          ys.flatten.distinct.sorted
            .map(y => yearRange(c, mk, y))
            .reduceLeft[Expression](Or)
        case _ => e
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformWithPruning(
    _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.FILTER)) {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformDown(rewrite)
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }
}
