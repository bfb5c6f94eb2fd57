package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.exprs
import graft.operators.{Contamination, ExactNtile, Funnel, Spearman}

/** Round-3 analytics/curation operators: exact-ntile vs the window
  * builtin (remainder tiles!), funnel edge ordering, contamination
  * overlap accounting, repetition + quantization kernels.
  */
class AnalyticsOpsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------ spearman
  test("Spearman: matches rank-window Pearson, partition-invariant, signs") {
    import org.apache.spark.sql.types.DecimalType
    // deterministic discrete data with ties: x in 0..9, y correlated
    val rows = (1 to 400).map { i =>
      val x = i * 7 % 10
      val y = if (i % 3 == 0) 9 - x else x // mostly monotone up
      (if (i % 2 == 0) "a" else "b", x.toLong, y.toLong)
    }
    val df = rows.toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) = Spearman.byGroup(
        d, "g",
        col("x").cast(DecimalType(4, 0)), col("y").cast(DecimalType(4, 0)))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val got = run(df)
    // reference: average-rank windows + exact moment Pearson per group
    val w = Window.partitionBy(col("g"))
    def rk(c: String) = (count(lit(1)).over(
        w.orderBy(col(c)).rangeBetween(Window.unboundedPreceding, -1)) +
      (count(lit(1)).over(w.orderBy(col(c)).rangeBetween(0, 0)) + 1)
        .cast(DecimalType(20, 1)) / 2).cast(DecimalType(12, 1))
    val ranked = df.select(col("g"), rk("x").as("rx"), rk("y").as("ry"))
    val want = ranked.groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rx")).cast("double").as("sx"),
        sum(col("ry")).cast("double").as("sy"),
        sum(col("rx") * col("ry")).cast("double").as("sxy"),
        sum(col("rx") * col("rx")).cast("double").as("sxx"),
        sum(col("ry") * col("ry")).cast("double").as("syy"))
      .select(col("g"), ((col("n").cast("double") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n").cast("double") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n").cast("double") * col("syy") - col("sy") * col("sy")))).as("rho"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, v) => assert(v == want(g), s"group $g: $v vs ${want(g)}") }
    // bit-identical under different physical layouts
    assert(run(df.repartition(13)) == got)
    assert(run(df.repartition(1)) == got)
    // perfect monotone association → 1 (to sqrt(z)·sqrt(z) ulp); reversed → -1
    val mono = (1 to 50).map(i => ("m", (i % 7).toLong, (i % 7).toLong)).toDF("g", "x", "y")
    assert(math.abs(run(mono)("m") - 1.0) < 1e-15)
    val anti = (1 to 50).map(i => ("m", (i % 7).toLong, (6 - i % 7).toLong)).toDF("g", "x", "y")
    assert(math.abs(run(anti)("m") + 1.0) < 1e-15)
  }

  // ---------------------------------------------------------------- ntile
  test("ExactNtile matches ntile() window for remainder and even splits") {
    for ((n, tiles) <- Seq((25, 10), (7, 3), (100, 10), (9, 10), (1, 4))) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % n).toLong)).toDF("id", "v")
      val got = ExactNtile.withNtile(df, Seq(col("v").desc, col("id")), tiles, "tile")
        .select(col("id"), col("tile"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val want = df.withColumn(
          "tile", ntile(tiles).over(Window.orderBy(col("v").desc, col("id"))))
        .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
      assert(got == want, s"n=$n tiles=$tiles")
    }
  }

  test("ExactNtile is partition-layout invariant") {
    val df = (1 to 50).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      ExactNtile.withNtile(d, Seq(col("v"), col("id")), 6, "tile")
        .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(run(df) == run(df.repartition(17)))
  }

  // --------------------------------------------------------------- funnel
  test("Funnel.firstConversion: strict-after semantics and exclusions") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val events = Seq(
      // user 1: converts (view@10, purchase@50; later purchase ignored)
      (1L, ts(10), "view"), (1L, ts(50), "purchase"), (1L, ts(60), "purchase"),
      // user 2: purchase strictly BEFORE first view — no conversion
      (2L, ts(10), "purchase"), (2L, ts(20), "view"),
      // user 3: purchase exactly AT first view — strict >, no conversion
      (3L, ts(10), "view"), (3L, ts(10), "purchase"),
      // user 4: view only
      (4L, ts(5), "view"),
      // user 5: second view earlier than first purchase: min(view) wins
      (5L, ts(30), "view"), (5L, ts(20), "view"), (5L, ts(25), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.firstConversion(events, "user_id", "ts", "event_type", "view", "purchase")
      .select("user_id", "us_to_convert")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 40000000L, 5L -> 5000000L))
  }

  // -------------------------------------------------------- contamination
  test("Contamination.overlap: full, zero, and short-doc accounting") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // identical: 2 grams, both hit
      (2L, "one two three four five"),  // disjoint: 3 grams, 0 hits
      (3L, "beta gamma delta epsilon"), // partial: grams bgd hit, gde miss
      (4L, "too short")                 // < n tokens: zero grams
    ).toDF("doc_id", "text")
    val got = Contamination.overlap(docs, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1)),
      2L -> ((3L, 0L, 0)),
      3L -> ((2L, 1L, 1)),
      4L -> ((0L, 0L, 0))))
  }

  // ----------------------------------------------------- word ngrams
  test("WordNgrams kernel == HOF shingle composition, incl. edge shapes") {
    val docs = Seq(
      "alpha beta gamma delta beta gamma delta",   // repeated gram → distinct
      "  Mixed  CASE\ttokens \n split  here  ",
      "one two",                                   // shorter than n
      "exact three toks",
      ""
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val toks = filter(split(lower(coalesce(col("text"), lit(""))), "\\s+"),
        t => length(t) > 0)
      val hof = array_distinct(
        when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .otherwise(array().cast("array<string>")))
      val got = docs.select(col("id"), graft.operators.Dedup.shingles(col("text"), n).as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
      val want = docs.select(col("id"), hof.as("g"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
      assert(got == want, s"n=$n")
    }
  }

  // ----------------------------------------------------- token repetition
  test("TokenRepetition: counts, modal bigram, whitespace and case") {
    def rep(s: String) = Seq(Tuple1(s)).toDF("text")
      .select(exprs.tokenRepetition(col("text")).as("r"))
      .select("r.n_tokens", "r.n_distinct", "r.n_bigrams", "r.top_bigram_count")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).head
    assert(rep("") == ((0, 0, 0, 0)))
    assert(rep("solo") == ((1, 1, 0, 0)))
    assert(rep("a a a") == ((3, 1, 2, 2)))               // "a a" twice
    assert(rep("A  a\t a") == ((3, 1, 2, 2)))            // lowercase + ws runs
    assert(rep("x y x y z") == ((5, 3, 4, 2)))           // "x y" twice
    assert(rep("  lead trail  ") == ((2, 2, 1, 1)))
  }

  // ----------------------------------------------------------- quantizer
  test("QuantizeStats: range endpoints, constant vector, null handling") {
    def q(v: Seq[java.lang.Float]) = Seq(Tuple1(v)).toDF("vec")
      .select(exprs.quantizeStats(col("vec")).as("q"))
      .select("q.q_min", "q.q_max", "q.q_sum", "q.scale")
      .collect().headOption.filter(!_.isNullAt(0))
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // [0,1,2]: codes floor(x*255/2) = 0, 127, 255
    assert(q(Seq(0f, 1f, 2f)) == Some((0, 255, 382L, 2.0 / 255)))
    // constant vector: all codes 0, zero scale
    assert(q(Seq(3f, 3f, 3f)) == Some((0, 0, 0L, 0.0)))
    // null element is skipped everywhere
    assert(q(Seq(0f, null, 2f)) == Some((0, 255, 255L, 2.0 / 255)))
    // empty / all-null vector: whole struct is null
    val empty = Seq(Tuple1(Seq.empty[java.lang.Float])).toDF("vec")
      .select(exprs.quantizeStats(col("vec")).as("q")).collect().head
    assert(empty.isNullAt(0))
  }
}
