package graft

import org.apache.spark.sql.functions._

import graft.functions.{HllRegisters, KmvSketch, Md5Hash}
import graft.operators.WordPiece

/** Unit behavior of the distinct sketches (KMV, HLL) and the rank
  * statistics / WordPiece queries — the bit-exact engine-vs-oracle
  * compare rides the driver gate; here we pin the algebraic laws the
  * oracles can't see: merge semantics, layout independence, and
  * hand-computed ground truth on toy inputs.
  */
class SketchStatsSpec extends SparkSuite {
  import spark.implicits._

  test("KmvSketch keeps the k smallest DISTINCT hashes, sorted") {
    val agg = new KmvSketch(4)
    var b = agg.zero
    Seq(50L, 10L, 50L, 30L, 20L, 40L, 5L, 10L).foreach { h => b = agg.reduce(b, h) }
    assert(agg.finish(b) == Seq(5L, 10L, 20L, 30L))
  }

  test("KmvSketch merge == sketch of concatenation; MaxValue tail preserved") {
    val agg = new KmvSketch(4)
    val xs = Seq(9L, 3L, 7L)
    val ys = Seq(3L, 1L, 8L, 12L, 15L)
    var a = agg.zero; xs.foreach(h => a = agg.reduce(a, h))
    var c = agg.zero; ys.foreach(h => c = agg.reduce(c, h))
    val m = agg.merge(a, c)
    var ref = agg.zero; (xs ++ ys).foreach(h => ref = agg.reduce(ref, h))
    assert(m.toSeq == ref.toSeq)
    // under-full merge keeps sentinels at the tail
    var u = agg.zero; u = agg.reduce(u, 2L)
    val um = agg.merge(u, agg.zero)
    assert(agg.finish(um) == Seq(2L) && um(3) == Long.MaxValue)
  }

  test("KMV sketch via udaf is layout-independent") {
    val kmv = udaf(new KmvSketch(8))
    val data = (1L to 500L).map(i => Md5Hash.lower63(i.toString))
    def run(parts: Int) = data.toDF("h").repartition(parts)
      .agg(kmv(col("h"))).as[Seq[Long]].collect()(0)
    assert(run(1) == run(13) && run(13).size == 8)
    assert(run(13) == data.distinct.sorted.take(8))
  }

  test("HllRegisters rank matches the bin-length formula; merge is max") {
    val agg = new HllRegisters(8)
    // hand-picked hashes: bucket = top 8 of 63 bits, w = low 55 bits
    val cases = Seq(
      (3L << 55 | 1L, 3, 55), // w=1 → bitlen 1 → rank 55
      (3L << 55 | (1L << 54), 3, 1), // top w bit set → rank 1
      (7L << 55, 7, 56)) // w=0 → rank wBits+1 = 56
    cases.foreach { case (h, bucket, rank) =>
      val b = agg.reduce(agg.zero, h)
      assert(b(bucket) == rank.toLong, s"h=$h")
      assert(b.sum == rank.toLong) // only that bucket touched
    }
    val x = agg.reduce(agg.zero, cases(0)._1)
    val y = agg.reduce(agg.zero, cases(1)._1)
    assert(agg.merge(x.clone(), y)(3) == 55L)
  }

  test("HLL registers via udaf are layout-independent") {
    val hll = udaf(new HllRegisters(8))
    val data = (1L to 2000L).map(i => Md5Hash.lower63(i.toString))
    def run(parts: Int) = data.toDF("h").repartition(parts)
      .agg(hll(col("h"))).as[Seq[Long]].collect()(0)
    assert(run(1) == run(17))
  }

  test("KS and Mann-Whitney queries match brute-force on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("f"), col("l_quantity").cast("long").as("q"))
      .filter(col("f").isin("R", "N")).as[(String, Long)].collect()
    val a = li.collect { case ("R", q) => q }
    val b = li.collect { case ("N", q) => q }
    // brute KS numerator over the merged support
    val dNum = (a ++ b).distinct.map { x =>
      math.abs(b.length.toLong * a.count(_ <= x) - a.length.toLong * b.count(_ <= x))
    }.max
    // brute 2·U_A: wins ×2 + ties
    val u2 = a.map(x => 2L * b.count(_ < x) + b.count(_ == x)).sum
    val ks = queries.SketchStatsQueries.defs("ks_two_sample_qty").fn(spark, dir).collect()(0)
    assert(ks.getAs[Long]("n_a") == a.length.toLong && ks.getAs[Long]("n_b") == b.length.toLong)
    assert(ks.getAs[Long]("d_num") == dNum)
    val mw = queries.SketchStatsQueries.defs("mannwhitney_qty").fn(spark, dir).collect()(0)
    assert(mw.getAs[Long]("u2_a") == u2, s"got ${mw.getAs[Long]("u2_a")} want $u2")
  }

  test("quality classifier weight is md5-derived and bounded") {
    val w = Md5Hash.lower63("w:the") % 17 - 8
    assert(w >= -8 && w <= 8)
    val one = Seq((1L, "the")).toDF("doc_id", "t")
      .select(sum(Md5Hash.lower63Col(concat(lit("w:"), col("t"))) % 17 - 8).as("s"))
      .as[Long].collect()(0)
    assert(one == w)
  }

  test("WordPiece prefers exclusive pairs over frequent ones (vs BPE)") {
    // 'ab' appears twice but a,b are frequent; 'cd' once with c,d
    // occurring nowhere else: likelihood picks c+d (1/(1·1)=1 > 2/4)
    val docs = Seq("ab ab cd", "ab ab").toDF("text")
    val wp = WordPiece.train(docs, "text", numMerges = 1).collect()(0)
    assert((wp.getString(1), wp.getString(2)) == ("c", "d"))
    val bpe = operators.Bpe.train(docs, "text", numMerges = 1).collect()(0)
    assert((bpe.getString(1), bpe.getString(2)) == ("a", "b"))
  }

  test("property: KMV/HLL merge laws hold on generated streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val streams = Gen.listOfN(40,
      Gen.listOf(Gen.choose(0L, 500L).map(u => Md5Hash.lower63(u.toString))))
      .apply(Gen.Parameters.default, Seed(11L)).getOrElse(Nil)
    val kmv = new KmvSketch(16)
    val hll = new HllRegisters(8)
    streams.sliding(2, 2).foreach {
      case Seq(xs, ys) =>
        // merge of per-stream sketches == sketch of concatenation
        var a = kmv.zero; xs.foreach(h => a = kmv.reduce(a, h))
        var b = kmv.zero; ys.foreach(h => b = kmv.reduce(b, h))
        var whole = kmv.zero; (xs ++ ys).foreach(h => whole = kmv.reduce(whole, h))
        assert(kmv.merge(a.clone(), b).toSeq == whole.toSeq)
        // KMV finish == brute k smallest distinct
        assert(kmv.finish(whole) == (xs ++ ys).distinct.sorted.take(16))
        // HLL: same laws, max-merge
        var ha = hll.zero; xs.foreach(h => ha = hll.reduce(ha, h))
        var hb = hll.zero; ys.foreach(h => hb = hll.reduce(hb, h))
        var hw = hll.zero; (ys ++ xs).foreach(h => hw = hll.reduce(hw, h)) // order-insensitive
        assert(hll.merge(ha.clone(), hb).toSeq == hw.toSeq)
      case _ => ()
    }
  }

  test("KMV Jaccard estimate tracks the exact overlap on the fixture") {
    val r = queries.SketchStatsQueries.defs("kmv_jaccard_flags")
      .fn(spark, "/root/testdata/sf0.001").collect()(0)
    val est = r.getAs[Double]("jaccard_est")
    val exact = r.getAs[Double]("jaccard_exact")
    assert(r.getAs[Long]("inter_sketch") <= r.getAs[Long]("k_union"))
    assert(math.abs(est - exact) < 0.12, s"est=$est exact=$exact")
  }

  test("rendezvous sharding: adding a shard only moves docs TO the new shard") {
    val dir = "/root/testdata/sf0.001"
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long].collect()
    def hrw(id: Long, n: Int): Long =
      (0 until n).map(s => (Md5Hash.lower63(s"$id:$s"), s.toLong)).max._2
    val moved = ids.filter(id => hrw(id, 16) != hrw(id, 17))
    assert(moved.nonEmpty && moved.forall(id => hrw(id, 17) == 16L))
    // ~1/17 expected; generous bounds for md5 noise on 500 docs
    assert(moved.length > ids.length / 60 && moved.length < ids.length / 6)
    // the query's per-shard n_moved sums to the same total
    val q = queries.SketchStatsQueries.defs("rendezvous_sharding").fn(spark, dir)
      .agg(sum(col("n_moved")), sum(col("n_docs"))).as[(Long, Long)].collect()(0)
    assert(q == ((moved.length.toLong, ids.length.toLong)))
  }

  test("PageRank: hubs outrank leaves; result is layout-independent") {
    // star graph: node 0 connected to 1..10, plus an isolated pair 20-21
    val star = ((1L to 10L).flatMap(i => Seq((0L, i), (i, 0L))) ++
      Seq((20L, 21L), (21L, 20L))).toDF("u", "v")
    val r = operators.PageRank.run(star, 5).as[(Long, Long)].collect().toMap
    assert(r(0L) > r(1L) && r(1L) == r(10L), s"got $r")
    assert(r(20L) == r(21L))
    val r2 = operators.PageRank.run(star.repartition(7), 5)
      .as[(Long, Long)].collect().toMap
    assert(r == r2)
  }

  test("fuzzy pairs: levenshtein agrees with the classic DP; blocking finds planted near-names") {
    val d = Seq(("cold widget", "gold widget"), ("cold widget", "cold bolt"))
      .toDF("a", "b").select(levenshtein(col("a"), col("b"))).as[Int].collect()
    assert(d.toSeq == Seq(1, 5)) // substitution=1; 'widget'→'bolt' = 5 edits
    val rows = queries.SketchStatsQueries.defs("fuzzy_name_pairs")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("dist") <= 6L))
    // blocking soundness: every emitted pair shares a token
    assert(rows.forall { r =>
      r.getAs[String]("name_a").split(" ").toSet
        .intersect(r.getAs[String]("name_b").split(" ").toSet).nonEmpty
    })
  }

  test("WordPiece merge table is layout-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val t1 = WordPiece.train(docs, "text", 3).collect().toSeq
    val t2 = WordPiece.train(docs.repartition(11), "text", 3).collect().toSeq
    assert(t1 == t2 && t1.size == 3)
  }

  test("personalized PageRank: seeds dominate, proximity decays, layout-invariant") {
    import org.apache.spark.sql.functions._
    // path graph 0—1—2—3—4—5 (symmetric edges), seed {0}
    val e0 = (0L to 4L).map(i => (i, i + 1))
    val edges = (e0 ++ e0.map(_.swap)).toDF("u", "v")
    val seeds = Seq(0L).toDF("node")
    def run(ed: org.apache.spark.sql.DataFrame) =
      graft.operators.PageRank.runPersonalized(ed, seeds, rounds = 5)
        .as[(Long, Long)].collect().toMap
    val r = run(edges)
    assert(r.keySet == (0L to 5L).toSet)
    // exact plain-Scala replay of the integer recursion
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var ref = (0L to 5L).map(n => n -> (if (n == 0L) 1000000L else 0L)).toMap
    (0 until 5).foreach { _ =>
      ref = (0L to 5L).map { n =>
        val contrib = adj.collect {
          case (u, vs) if vs.contains(n) => ref(u) / deg(u)
        }.sum
        n -> ((if (n == 0L) 150000L else 0L) + 85L * contrib / 100L)
      }.toMap
    }
    assert(r == ref, s"got $r want $ref")
    // far node reachable but with less mass than the seed's neighbor
    assert(r(5L) > 0L && r(5L) < r(1L))
    assert(run(edges.repartition(7)) == r)
  }

  test("AMS sign sums merge by addition across any data split") {
    // the property that lets per-shard sketches roll up with no rescan:
    // S_r(A ∪ B) = S_r(A) + S_r(B) for multisets
    import org.apache.spark.sql.functions._
    val evens = Seq("0", "2", "4", "6", "8", "a", "c", "e")
    def signSums(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val digest = md5(concat(lit("ams:"), col("t")))
      val sums = (0 until 9).map { r =>
        sum(when(substring(digest, r + 1, 1).isin(evens: _*), 1L)
          .otherwise(-1L)).as(s"s$r")
      }
      val row = df.agg(sums.head, sums.tail: _*).head()
      (0 until 9).map(row.getLong)
    }
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.operators.TextOps.tokens($"text")).as("t"),
        $"doc_id")
    val whole = signSums(toks)
    val a = signSums(toks.filter($"doc_id" % 2 === 0))
    val b = signSums(toks.filter($"doc_id" % 2 =!= 0))
    assert(whole == a.zip(b).map { case (x, y) => x + y })
    assert(whole.exists(_ != 0L))
  }
}
