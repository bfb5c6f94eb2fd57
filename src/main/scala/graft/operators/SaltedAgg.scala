package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-stage aggregation: partial-aggregate on (key, salt),
  * then finish on key. When one group key carries a disproportionate
  * share of rows (the 100 TB failure mode: one reducer runs for hours
  * while 999 idle), the salt spreads that group's *partial* aggregation
  * over `salt` reducers; the second stage combines `salt` sub-rows per
  * key — bounded work regardless of skew.
  *
  * Spark's own map-side partial aggregation usually makes this
  * unnecessary — partials already shrink per-task input before the
  * shuffle. It earns its keep when partial aggregation is defeated:
  * high-cardinality-then-skewed composite keys, or aggregates with
  * large intermediate state (collect-style, exact distincts) where
  * map-side combine can't compress the hot key's stream.
  *
  * Only decomposable aggregates are offered (sum/count/min/max):
  * two-stage results are bit-identical to the direct groupBy for these
  * (integer-valued or decimal inputs; float sums reorder like any
  * parallel aggregation).
  */
object SaltedAgg {

  sealed trait Agg { def col: String; def alias: String }
  final case class Sum(col: String, alias: String) extends Agg
  final case class Count(alias: String) extends Agg { val col = "*" }
  final case class Min(col: String, alias: String) extends Agg
  final case class Max(col: String, alias: String) extends Agg

  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg], salt: Int = 16): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty && salt > 0)
    def partial(a: Agg): Column = a match {
      case Sum(c, al) => sum(col(c)).as(al)
      case Count(al) => count(lit(1)).as(al)
      case Min(c, al) => min(col(c)).as(al)
      case Max(c, al) => max(col(c)).as(al)
    }
    def merge(a: Agg): Column = a match {
      case Sum(_, al) => sum(col(al)).as(al)
      case Count(al) => sum(col(al)).as(al)
      case Min(_, al) => min(col(al)).as(al)
      case Max(_, al) => max(col(al)).as(al)
    }
    val stage1 = df
      .withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial(aggs.head), aggs.tail.map(partial): _*)
    val counted = stage1.groupBy(keys.map(col): _*)
      .agg(merge(aggs.head), aggs.tail.map(merge): _*)
    // Count() merged via sum(long) yields long, matching direct count()
    aggs.foldLeft(counted) {
      case (d, Count(al)) => d.withColumn(al, col(al).cast("long"))
      case (d, _) => d
    }
  }
}
