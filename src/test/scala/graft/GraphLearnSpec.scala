package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs
import graft.operators.{GraphOps, Perceptron}

/** Unit evidence for the round-8 governance/graph/learning operators:
  * the Aho–Corasick kernel against a brute-force position scan, the
  * k-core peel and BFS on hand graphs with known answers, and the
  * batch perceptron's convergence on a separable concept.
  */
class GraphLearnSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------ AC kernel

  private def bruteCount(text: String, pat: String): Long =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length)).toLong

  test("multiPatternCount: overlapping occurrences are all counted") {
    val out = Seq("a a a a").toDF("t")
      .select(exprs.multiPatternCount($"t", Seq("a a")).as("c"))
      .head().getSeq[Long](0)
    assert(out == Seq(3L), "'a a' occurs at offsets 0,2,4")
  }

  test("multiPatternCount: suffix patterns count via output links") {
    val out = Seq("the hash value of a value").toDF("t")
      .select(exprs.multiPatternCount($"t", Seq("hash value", "value", "val"))
        .as("c"))
      .head().getSeq[Long](0)
    assert(out == Seq(1L, 2L, 2L))
  }

  test("multiPatternCount: empty text, null, pattern at both ends") {
    val rows = Seq(null, "", "ab", "abab", "xxabxx")
      .toDF("t")
      .select(exprs.multiPatternCount($"t", Seq("ab", "xx")).as("c"))
      .collect()
    assert(rows(0).isNullAt(0), "null in, null out")
    assert(rows(1).getSeq[Long](0) == Seq(0L, 0L))
    assert(rows(2).getSeq[Long](0) == Seq(1L, 0L))
    assert(rows(3).getSeq[Long](0) == Seq(2L, 0L))
    assert(rows(4).getSeq[Long](0) == Seq(1L, 2L))
  }

  test("multiPatternCount: non-ASCII input chars reset to root, never crash") {
    val out = Seq("abéab 世ab").toDF("t")
      .select(exprs.multiPatternCount($"t", Seq("ab", "b a")).as("c"))
      .head().getSeq[Long](0)
    assert(out == Seq(3L, 0L), "é/世 break any in-flight match")
  }

  test("multiPatternCount matches brute-force scan on fixture docs") {
    val pats = Seq("a a", "value", "hash value", "spark", "t")
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(60)
      .select(col("text"), exprs.multiPatternCount(col("text"), pats).as("c"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val counts = r.getSeq[Long](1)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(counts(i) == bruteCount(text, p), s"pattern '$p' on '$text'")
      }
    }
  }

  test("multiPatternCount rejects bad pattern lists") {
    intercept[IllegalArgumentException] {
      functions.MultiPatternCount(null, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      functions.MultiPatternCount(null, Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      functions.MultiPatternCount(null, Seq("café"))
    }
  }

  // ------------------------------------------------------------ k-core

  test("kcoreTruncated peels a tail off a triangle and cascades") {
    // triangle 1-2-3 plus a path 3-4-5: 2-core = the triangle, but
    // only after TWO peel rounds (5 falls first, then 4).
    val und = Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 5))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val r1 = GraphOps.kcoreTruncated(edges, k = 2, rounds = 1)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(r1.keySet == Set(1, 2, 3, 4), "one round only drops node 5")
    val r2 = GraphOps.kcoreTruncated(edges, k = 2, rounds = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1 -> 2L, 2 -> 2L, 3 -> 2L), "second round drops 4")
    val r3 = GraphOps.kcoreTruncated(edges, k = 2, rounds = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(r3 == r2, "converged: extra rounds are no-ops")
  }

  test("kcoreTruncated: whole graph below k empties out") {
    val und = Seq((1, 2), (2, 3))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    assert(GraphOps.kcoreTruncated(edges, k = 3, rounds = 2).count() == 0L)
  }

  // ------------------------------------------------------------ BFS

  test("bfsHops: path graph hop levels, bounded by rounds") {
    val und = Seq((1, 2), (2, 3), (3, 4), (4, 5))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val seeds = Seq(1).toDF("node")
    val hops = GraphOps.bfsHops(edges, seeds, rounds = 2)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(hops == Map(1 -> 0, 2 -> 1, 3 -> 2), "nodes 4,5 beyond 2 rounds")
  }

  test("bfsHops: multiple seeds take the min hop; cycles don't revisit") {
    val und = Seq((1, 2), (2, 3), (3, 1), (3, 4))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val seeds = Seq(1, 4).toDF("node")
    val hops = GraphOps.bfsHops(edges, seeds, rounds = 3)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(hops == Map(1 -> 0, 4 -> 0, 2 -> 1, 3 -> 1))
  }

  // ------------------------------------------------------------ LPA

  test("lpaCommunities: two disjoint stars become two communities") {
    // bipartite convention: even = one side, odd = the other.
    val und = Seq((0L, 1L), (2L, 1L), (4L, 5L), (6L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val lab = GraphOps.lpaCommunities(edges, maxRounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab.keySet == Set(0L, 1L, 2L, 4L, 5L, 6L))
    assert(Set(lab(0L), lab(1L), lab(2L)).size == 1, "star 1 is one community")
    assert(Set(lab(4L), lab(5L), lab(6L)).size == 1, "star 2 is one community")
    assert(lab(0L) != lab(4L), "stars stay separate")
  }

  test("lpaCommunities: frequency beats label value; ties take min label") {
    // node 7's neighbors: 0,2 (which settle to label L1) and 4 (label
    // L2) — frequency 2 vs 1 picks the majority community.
    val und = Seq((0L, 1L), (2L, 1L), (0L, 7L), (2L, 7L), (4L, 7L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val lab = GraphOps.lpaCommunities(edges, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab(7L) == lab(0L), "7 joins the majority (two-vote) community")
  }

  test("lpaCommunities rejects an unsymmetrized (directed) edge frame") {
    // (0,1) without its (1,0) twin: votes would silently drop and node
    // 1 would never be labeled — the guard must throw instead
    val edges = Seq((0L, 1L), (2L, 1L), (1L, 2L)).toDF("u", "v")
    intercept[IllegalArgumentException] {
      GraphOps.lpaCommunities(edges, maxRounds = 4)
    }
  }

  test("lpaCommunities throws when the round budget is too small") {
    val und = Seq((0L, 1L), (2L, 1L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    intercept[IllegalArgumentException] {
      // labels still move in round 1, so a 1-round budget cannot PROVE
      // the fixed point — the probe must throw, never silently truncate
      GraphOps.lpaCommunities(edges, maxRounds = 1)
    }
  }

  // ------------------------------------------------------------ perceptron

  test("perceptron learns a separable 2-D concept exactly") {
    // y = sign(x0 - x1): four points, integer grid.
    val pts = Seq(
      (1L, Seq((0, 5L), (1, 1L)), 1L),
      (2L, Seq((0, 4L), (1, 0L)), 1L),
      (3L, Seq((0, 1L), (1, 5L)), -1L),
      (4L, Seq((0, 0L), (1, 4L)), -1L))
    val fl = pts.flatMap { case (id, fs, y) =>
        fs.map { case (d, x) => (id, d, x, y) }
      }.toDF("id", "dim", "x", "y")
    val (hist, stats) = Perceptron.train(fl, dims = 2, rounds = 4)
    assert(stats.head.nMisPos + stats.head.nMisNeg == 4L,
      "zero model misclassifies everything")
    val w = hist.last
    pts.foreach { case (_, fs, y) =>
      val margin = fs.map { case (d, x) => w(d) * x }.sum
      assert(y * margin > 0, s"final weights separate: $y vs $margin")
    }
    assert(stats.last.nMisPos + stats.last.nMisNeg == 0L,
      "converged before the last round")
  }

  test("perceptron teacher concept converges on the embeddings fixture") {
    val feats = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"),
        posexplode(exprs.quantizeVec(col("embedding"), 1000)))
      .toDF("id", "dim", "x")
    val labels = feats.groupBy(col("id"))
      .agg(sum(when(col("dim") % 2 === 0, col("x")).otherwise(-col("x")))
        .as("m0"))
      .select(col("id").as("lid"), when(col("m0") > 0, 1L).otherwise(-1L).as("y"))
    val fl = feats.join(labels, col("id") === col("lid")).drop("lid")
      .localCheckpoint()
    val (_, stats) = Perceptron.train(fl, dims = 64, rounds = 5)
    val curve = stats.map(st => st.nMisPos + st.nMisNeg)
    assert(curve.head == 500L, "round 1 sees the zero model")
    assert(curve.last < 50L, s"teacher concept is learned: $curve")
  }

  test("scc resolves cycles, singletons, and multi-peel chains") {
    // two 3-cycles bridged one-way, plus a pure source and a pure
    // sink: {1,2,3} and {4,5,6} are SCCs; 0 (source into 1) and 9
    // (sink from 6) are singletons
    val e = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L), // one-way bridge: the two cycles must NOT merge
      (0L, 1L), (6L, 9L)).toDF("u", "v")
    val r = GraphOps.scc(e, maxPeels = 8, maxRounds = 20)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 9L -> 9L))
  }

  test("scc needs multiple peels on an ascending id chain") {
    // 1 -> 2 -> 3 -> 4: all singleton SCCs, but node k's min ancestor
    // is 1 while its min descendant is k, so only the head resolves
    // per peel — the worst-case one-SCC-per-peel chain
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = GraphOps.scc(e, maxPeels = 8, maxRounds = 20)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // and a too-small peel budget throws instead of truncating
    intercept[IllegalArgumentException] {
      GraphOps.scc(e, maxPeels = 1, maxRounds = 20).collect()
    }
  }

  // ------------------------------------------------------------ Luby MIS

  private def symmetrize(pairs: Seq[(Long, Long)]) = {
    val d = pairs.toDF("u", "v")
    d.unionByName(d.select($"v".as("u"), $"u".as("v")))
  }

  test("lubyMis returns a maximal independent set (path graph)") {
    // path 1-2-3-4-5-6: any MIS has no adjacent pair and every
    // non-member has a member neighbor
    val edges = symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    val mis = GraphOps.lubyMis(edges, maxRounds = 10)
      .select($"node").as[Long].collect().toSet
    val adj = Map(1L -> Set(2L), 2L -> Set(1L, 3L), 3L -> Set(2L, 4L),
      4L -> Set(3L, 5L), 5L -> Set(4L, 6L), 6L -> Set(5L))
    assert(mis.nonEmpty)
    // independence: no edge inside the set
    for (n <- mis) assert(adj(n).intersect(mis).isEmpty, s"$n has a neighbor in the MIS")
    // maximality: every outsider is dominated
    for (n <- adj.keySet -- mis)
      assert(adj(n).intersect(mis).nonEmpty, s"$n could be added — not maximal")
  }

  test("lubyMis on a star: either the hub alone or all leaves") {
    val edges = symmetrize((2L to 8L).map(l => (1L, l)))
    val mis = GraphOps.lubyMis(edges, maxRounds = 10)
      .select($"node").as[Long].collect().toSet
    assert(mis == Set(1L) || mis == (2L to 8L).toSet)
  }

  test("lubyMis throws when the round budget is too small") {
    // a triangle needs at least one full round; budget honored, and an
    // impossible budget on a larger random-ish graph must throw rather
    // than return a partial set
    val edges = symmetrize(for {
      i <- 1L to 30L; j <- (i + 1) to 30L
      if (i * 31 + j) % 7 == 0
    } yield (i, j))
    val full = GraphOps.lubyMis(edges, maxRounds = 10)
    assert(full.count() > 0)
    // rounds=... find actual rounds used, then starve by one if > 1
    val used = full.agg(max($"round")).as[Int].head()
    if (used > 1)
      assertThrows[IllegalArgumentException] {
        GraphOps.lubyMis(edges, maxRounds = used - 1).collect()
      }
  }

  // ------------------------------------------------------- greedy matching

  test("greedyMatching returns a maximal matching (path + isolated pair)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val m = GraphOps.greedyMatching(pairs.toDF("u", "v"), maxRounds = 10)
      .select($"u", $"v").as[(Long, Long)].collect().toSeq
    // valid: every matched edge is a real edge
    assert(m.forall(pairs.contains), s"non-edges matched: $m")
    // matching: no node appears twice
    val nodes = m.flatMap { case (u, v) => Seq(u, v) }
    assert(nodes.distinct.size == nodes.size, "shared endpoint")
    // maximal: no remaining edge has both endpoints unmatched
    val free = Set(1L, 2L, 3L, 4L, 5L, 10L, 11L) -- nodes
    assert(!pairs.exists { case (u, v) => free(u) && free(v) },
      "an addable edge remains")
    // the isolated pair can always be matched
    assert(m.contains((10L, 11L)))
  }

  test("greedyMatching: triangle matches exactly one edge") {
    val m = GraphOps.greedyMatching(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v"), maxRounds = 10)
    assert(m.count() == 1L)
  }

  // ---------------------------------------- property tests (random graphs)

  /** Deterministic Erdős–Rényi-ish graphs: edge (i,j) present iff an
    * integer hash of (seed,i,j) clears the density gate.
    */
  private def randomGraph(seed: Long, n: Int, density: Int): Seq[(Long, Long)] =
    for {
      i <- 1L to n.toLong; j <- (i + 1) to n.toLong
      if ((i * 2654435761L + j * 40503L + seed) % 97) < density
    } yield (i, j)

  test("lubyMis invariants hold on 8 random graphs") {
    for (seed <- 1L to 8L) {
      val pairs = randomGraph(seed, n = 24, density = (seed % 4 + 1).toInt * 8)
      if (pairs.nonEmpty) {
        val adj = (pairs ++ pairs.map(_.swap))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val mis = GraphOps.lubyMis(symmetrize(pairs), maxRounds = 20)
          .select($"node").as[Long].collect().toSet
        for (v <- mis)
          assert(adj(v).intersect(mis).isEmpty, s"seed=$seed: $v not independent")
        for (v <- adj.keySet -- mis)
          assert(adj(v).intersect(mis).nonEmpty, s"seed=$seed: $v addable — not maximal")
      }
    }
  }

  test("greedyMatching invariants hold on 8 random graphs") {
    for (seed <- 11L to 18L) {
      val pairs = randomGraph(seed, n = 24, density = (seed % 4 + 1).toInt * 8)
      if (pairs.nonEmpty) {
        val edgeSet = pairs.toSet
        val m = GraphOps.greedyMatching(pairs.toDF("u", "v"), maxRounds = 20)
          .select($"u", $"v").as[(Long, Long)].collect().toSeq
        assert(m.forall(e => edgeSet(e) || edgeSet(e.swap)), s"seed=$seed: non-edge matched")
        val nodes = m.flatMap { case (u, v) => Seq(u, v) }
        assert(nodes.distinct.size == nodes.size, s"seed=$seed: shared endpoint")
        val free = (1L to 24L).toSet -- nodes
        assert(!pairs.exists { case (u, v) => free(u) && free(v) },
          s"seed=$seed: an addable edge remains — not maximal")
      }
    }
  }
}
