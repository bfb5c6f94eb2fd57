package graft

import org.apache.spark.sql.functions._

/** Approx-sketch operators are verified by error bounds vs the exact
  * answer (they can't be hash-compared against DuckDB).
  */
class SketchSpec extends SparkSuite {

  private lazy val sfDir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, sfDir)

  test("approx_count_distinct within 5% of exact per event type") {
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("percentile_approx(acc=10000) matches exact percentile on this data") {
    val approx = events
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.9)), lit(10000)).as("p"))
      .collect()(0).getSeq[Double](0)
    val exact = events
      .agg(expr("percentile(value, array(0.5, 0.9))").as("p"))
      .collect()(0).getSeq[Double](0)
    // percentile_approx returns actual data values; with accuracy 10000
    // over ~10k rows the rank error is ≤ 1 value — allow 2% of range
    val range = events.agg(max(col("value")) - min(col("value"))).collect()(0).getDouble(0)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 0.02 * range, s"approx $a vs exact $e (range $range)")
    }
  }
}
