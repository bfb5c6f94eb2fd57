package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{HashSample, SaltedAgg, Scd2, SnapshotDiff}

class IncrementalOpsSpec extends SparkSuite {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("scd2: collapses unchanged re-observations, intervals chain, last is current") {
    val log = Seq(
      (1L, d("2024-01-01"), "A"),
      (1L, d("2024-02-01"), "A"), // re-observed unchanged -> collapsed
      (1L, d("2024-03-01"), "B"),
      (1L, d("2024-04-01"), "A"), // back to A: a NEW interval, not merged
      (2L, d("2024-01-15"), "X")
    ).toDF("k", "ts", "attr")
    val got = Scd2.fromChangeLog(log, Seq("k"), Seq("attr"), "ts")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString).orNull, r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "A", "2024-01-01", "2024-03-01", false),
      (1L, "B", "2024-03-01", "2024-04-01", false),
      (1L, "A", "2024-04-01", null, true),
      (2L, "X", "2024-01-15", null, true)))
  }

  test("scd2: null attribute values compare null-safely") {
    val log = Seq(
      (1L, d("2024-01-01"), Option.empty[String]),
      (1L, d("2024-02-01"), Option.empty[String]), // null == null: collapsed
      (1L, d("2024-03-01"), Some("A"))
    ).toDF("k", "ts", "attr")
    val got = Scd2.fromChangeLog(log, Seq("k"), Seq("attr"), "ts").collect()
    assert(got.length == 2)
  }

  test("snapshot diff: classifies I/U/D, omits unchanged, null-safe compare") {
    val old = Seq(
      (1L, Some(10.0), "keep"),
      (2L, Some(20.0), "update"),
      (3L, Some(30.0), "delete"),
      (5L, Option.empty[Double], "nullsame")
    ).toDF("k", "price", "status")
    val neu = Seq(
      (1L, Some(10.0), "keep"),      // unchanged -> omitted
      (2L, Some(21.0), "update"),    // U
      (4L, Some(40.0), "insert"),    // I
      (5L, Option.empty[Double], "nullsame") // null <=> null: unchanged
    ).toDF("k", "price", "status")
    val got = SnapshotDiff.diff(old, neu, Seq("k"), Seq("price", "status"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "U"), (3L, "D"), (4L, "I")))
  }

  test("hash sample: deterministic, distributive over union, fraction ballpark") {
    val df = spark.range(10000).select(col("id"))
    val s1 = HashSample.sample(df, Seq("id"), 0.2).collect().map(_.getLong(0)).toSet
    val s2 = HashSample.sample(df, Seq("id"), 0.2).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same key set must select identically across runs")
    // distributive: sampling a partition of the data selects the same rows
    val a = HashSample.sample(df.filter(col("id") < 5000), Seq("id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    val b = HashSample.sample(df.filter(col("id") >= 5000), Seq("id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    assert((a union b) == s1)
    // md5 uniformity: 20% ± 2 points on 10k keys
    assert(math.abs(s1.size / 10000.0 - 0.2) < 0.02, s"got ${s1.size}")
    // monotone in fraction: a 10% sample is a subset of a 20% sample
    val s01 = HashSample.sample(df, Seq("id"), 0.1).collect().map(_.getLong(0)).toSet
    assert(s01.subsetOf(s1))
  }

  test("assignSplits: total, append-stable, fractions ballpark, sample-coherent") {
    val cuts = Seq("train" -> 0.8, "val" -> 0.9)
    def splits(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), HashSample.assignSplits(col("id"), cuts, "test").as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val all = splits(spark.range(10000).toDF("id"))
    assert(all.values.toSet == Set("train", "val", "test"), "every split populated")
    // append stability: assignment over a subset is the restriction
    val head = splits(spark.range(5000).toDF("id"))
    assert(head.forall { case (k, v) => all(k) == v })
    // fractions within 2 points
    val frac = all.values.groupBy(identity).view.mapValues(_.size / 10000.0)
    assert(math.abs(frac("train") - 0.8) < 0.02, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.02, s"val ${frac("val")}")
    // coherent with sample(): the 0.8-fraction accept set IS the train split
    val s80 = HashSample.sample(spark.range(10000).toDF("id"), Seq("id"), 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(all.filter(_._2 == "train").keySet == s80)
  }

  test("hash sample: fraction edge cases") {
    val df = spark.range(100).select(col("id"))
    assert(HashSample.sample(df, Seq("id"), 0.0).count() == 0)
    assert(HashSample.sample(df, Seq("id"), 1.0).count() == 100)
  }

  test("dense id: equals global row_number, invariant to input partitioning") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    val expected = orders
      .withColumn("rid", row_number().over(Window.orderBy(col("o_orderkey"))).cast("long"))
      .orderBy(col("rid")).collect()
    for (parts <- Seq(1, 7, 32)) {
      val got = graft.operators.DenseId
        .withDenseId(orders.repartition(parts), Seq(col("o_orderkey")), "rid")
        .orderBy(col("rid")).collect()
      assert(got.length == expected.length)
      got.zip(expected).foreach { case (g, e) =>
        assert(g.getLong(g.fieldIndex("rid")) == e.getLong(e.fieldIndex("rid")))
        assert(g.getAs[Long]("o_orderkey") == e.getAs[Long]("o_orderkey"))
      }
    }
  }

  test("dense id: duplicate keys stay dense and sort-consistent") {
    import spark.implicits._
    val df = Seq("b", "a", "a", "c", "b", "a").toDF("k")
    val got = graft.operators.DenseId.withDenseId(df, Seq(col("k")), "rid")
      .orderBy(col("rid")).collect()
    assert(got.map(_.getLong(1)).toSeq == (1L to 6L), "dense 1..N")
    assert(got.map(_.getString(0)).toSeq == Seq("a", "a", "a", "b", "b", "c"),
      "ids follow sort order across duplicate groups")
  }

  test("salted agg equals direct groupBy for decomposable aggregates") {
    val df = Seq(
      ("a", 1L, 5), ("a", 2L, 3), ("a", 3L, 9), ("b", 4L, 1), ("b", 5L, 2)
    ).toDF("k", "v", "w")
    val salted = SaltedAgg.saltedAgg(df, Seq("k"),
      Seq(SaltedAgg.Sum("v", "sv"), SaltedAgg.Count("n"),
        SaltedAgg.Min("w", "mn"), SaltedAgg.Max("w", "mx")), salt = 4)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(salted.toSeq == Seq(("a", 6L, 3L, 3, 9), ("b", 9L, 2L, 1, 2)))
  }
}
