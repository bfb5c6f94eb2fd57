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

  test("joinDelta over insert-only deltas equals the full join, row for row") {
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("ka", "pa")
    val da = Seq((4L, "a4"), (2L, "a2b")).toDF("ka", "pa")
    val b = Seq((1L, "b1"), (2L, "b2"), (5L, "b5")).toDF("kb", "pb")
    val db = Seq((3L, "b3"), (4L, "b4")).toDF("kb", "pb")
    val vOld = a.join(b, org.apache.spark.sql.functions.col("ka") ===
      org.apache.spark.sql.functions.col("kb"))
    val got = MvMaintain.joinDelta(vOld, a, da, b, db, "ka", "kb")
      .collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
    val want = a.unionByName(da).join(b.unionByName(db),
        org.apache.spark.sql.functions.col("ka") ===
          org.apache.spark.sql.functions.col("kb"))
      .collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
    assert(got == want && got.nonEmpty)
    // every delta term is exercised: ΔA⋈B (4→nothing old... 2 matches b2),
    // ΔA⋈ΔB (4↔4), A⋈ΔB (3↔3)
    assert(got.size == vOld.count() + 3)
  }
}
