package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingTopK

/** Space-Saving streaming top-k: the classic guarantees vs exact
  * counts, and bit-equality with the host-side fold replay.
  */
class StreamingTopKSpec extends SparkSuite {
  import spark.implicits._

  private val M = 8
  // zipf-ish: token t_i appears ~ 60/i times, plus a long tail of
  // singletons that forces evictions
  private def batch(seed: Int): Seq[(String, String)] = {
    val heavy = (1 to 10).flatMap(i => Seq.fill(60 / i)(s"t$i"))
    val tail = (0 until 40).map(j => s"rare_${seed}_$j")
    (heavy ++ tail).map(t => ("g", t))
  }

  test("summary == host fold replay; heavy-hitter and error bounds hold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamingTopK.toMemorySink(
      StreamingTopK.topK(mem.toDS().toDF("grp", "item"), "grp", "item", m = M, k = M),
      "hh")
    try {
      val batches = Seq(batch(1), batch(2), batch(3))
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // host replay with the operator's own canonical order
      val replay = batches.foldLeft(Map.empty[String, (Long, Long)]) { (s, b) =>
        StreamingTopK.fold(s, b.map(_._2).sorted, M)
      }
      val want = replay.toSeq.map { case (i, (c, e)) => (i, c, e) }
        .sortBy { case (i, c, _) => (-c, i) }.take(M)
        .zipWithIndex.map { case ((i, c, e), r) => ("g", i, c, e, r + 1) }.toSet
      // Update-mode sink accumulates per-batch emissions; the final
      // state's rows are exactly the last batch's emission, which the
      // distinct-set of the FINAL replay must be contained in
      val rows = spark.table("hh").as[StreamingTopK.TopRow].collect()
        .map(t => (t.grp, t.item, t.est, t.err, t.rnk)).toSet
      assert(want.subsetOf(rows), s"missing ${want.diff(rows)}")

      // guarantees vs exact counts over the whole stream
      val all = batches.flatten.map(_._2)
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = all.size.toLong
      exact.filter(_._2 > n / M).keys.foreach { hh =>
        assert(replay.contains(hh), s"guaranteed heavy hitter $hh evicted")
      }
      replay.foreach { case (item, (est, err)) =>
        val t = exact.getOrElse(item, 0L)
        assert(t <= est && est <= t + err, s"$item: true=$t est=$est err=$err")
      }
    } finally q.stop()
  }
}
