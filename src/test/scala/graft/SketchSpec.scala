package graft

import org.apache.spark.sql.functions._

/** Approx-sketch operators are verified by error bounds vs the exact
  * answer (they can't be hash-compared against DuckDB).
  */
class SketchSpec extends SparkSuite {

  private lazy val sfDir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, sfDir)

  test("sketch event profile error bounded by exact_event_profile twin") {
    val defs = queries.IncrementalQueries.defs
    // The sketch profile itself (HLL distinct + approx quantiles) —
    // spec-only: approx cells have no DuckDB twin, so it must not
    // appear in the driver gate's query map.
    val pcts = percentile_approx(col("value"), array(lit(0.5), lit(0.9)), lit(10000))
    val sk = events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        pcts.getItem(0).as("value_p50"),
        pcts.getItem(1).as("value_p90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val ex = defs("exact_event_profile").fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(sk.keySet == ex.keySet)
    val range = events.agg(max(col("value")) - min(col("value"))).collect()(0).getDouble(0)
    ex.foreach { case (k, (nUsers, p50, p90)) =>
      val (aUsers, a50, a90) = sk(k)
      assert(math.abs(aUsers - nUsers).toDouble / nUsers <= 0.05, s"$k users: $aUsers vs $nUsers")
      assert(math.abs(a50 - p50) <= 0.02 * range, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) <= 0.02 * range, s"$k p90: $a90 vs $p90")
    }
  }

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

  test("CountMinSketch: overestimate property + layout-independent merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    // tiny width forces collisions so the ≥-property is non-trivial
    val agg = udaf(new graft.functions.CountMinSketch(3, 16))
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
    val sk1 = toks.agg(agg(col("t"))).as[Seq[Long]].head()
    val sk2 = toks.repartition(13).agg(agg(col("t"))).as[Seq[Long]].head()
    assert(sk1 == sk2, "merge order must not change the sketch")
    val truth = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val total = truth.map(_._2).sum
    truth.foreach { case (t, c) =>
      val est = (0 until 3).map { j =>
        sk1(j * 16 + (graft.functions.Md5Hash.lower63(s"$j:$t") % 16).toInt)
      }.min
      assert(est >= c, s"CMS underestimated '$t': $est < $c")
      assert(est <= total, "estimate bounded by stream length")
    }
    // every row's counters sum to the full stream length
    (0 until 3).foreach(j => assert(sk1.slice(j * 16, j * 16 + 16).sum == total))
  }
}
