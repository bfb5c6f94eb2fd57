package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MvMaintain

/** Self-maintainability of rollup partials under insert batches:
  * fold(mv(F), mv(B)) must equal mv(F ∪ B) exactly — including groups
  * that exist only in the delta, only in the store, or in both.
  */
class MvMaintainSpec extends SparkSuite {
  import spark.implicits._

  private def partial(df: DataFrame) = df
    .groupBy(col("k"))
    .agg(sum(col("v")).as("s"), count(lit(1)).as("c"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))

  test("fold of split partials equals the one-shot rollup") {
    val rows = (1L to 200L).map(i => (s"g${i % 7}", i * 31 % 97))
    val (a, b) = rows.splitAt(83)
    val full = partial(rows.toDF("k", "v"))
      .orderBy("k").collect().toSeq
    val folded = MvMaintain.fold(
        partial(a.toDF("k", "v")), partial(b.toDF("k", "v")),
        keys = Seq("k"), sums = Seq("s"), counts = Seq("c"),
        mins = Seq("mn"), maxs = Seq("mx"))
      .orderBy("k").collect().toSeq
    assert(folded == full)
  }

  test("delta-only and store-only groups both survive the fold") {
    val stored = partial(Seq(("old", 5L), ("both", 1L)).toDF("k", "v"))
    val delta = partial(Seq(("new", 9L), ("both", 2L)).toDF("k", "v"))
    val r = MvMaintain.fold(stored, delta, keys = Seq("k"),
        sums = Seq("s"), counts = Seq("c"), mins = Seq("mn"), maxs = Seq("mx"))
      .orderBy("k").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq(("both", 3L, 2L, 1L, 2L), ("new", 9L, 1L, 9L, 9L),
      ("old", 5L, 1L, 5L, 5L)))
  }
}
