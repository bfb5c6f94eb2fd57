package graft

import graft.operators.SuffixArray

/** Prefix-doubling suffix array vs a host-side suffix sort — repeated
  * substrings force multiple refinement rounds; the doc separator and
  * proper-prefix suffixes exercise the -1 missing-lookahead rule.
  */
class SuffixArraySpec extends SparkSuite {
  import spark.implicits._

  private def hostSa(s: String): Map[Long, Long] =
    (1 to s.length).sortBy(p => s.substring(p - 1)).zipWithIndex
      .map { case (p, i) => (p.toLong, (i + 1).toLong) }.toMap

  test("banana-family corpus: equals the host suffix sort") {
    // 'ban'/'bana'/'ana' repeats need rank refinement past round 1;
    // "ban" is a proper prefix of "banana"'s suffix start
    val s = "bananabandanaban"
    val chars = s.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toInt) }.toDF("gpos", "code")
    val sa = SuffixArray.prefixDoubling(chars)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sa == hostSa(s))
  }

  test("adjacentLcp equals host common-prefix lengths; max is the LRS") {
    val s = "bananabandanaban"
    val chars = s.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toInt) }.toDF("gpos", "code")
    val got = SuffixArray.adjacentLcp(chars)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("lcp"))).toSet
    def lcp(a: Int, b: Int): Long = {
      val (x, y) = (s.substring(a - 1), s.substring(b - 1))
      x.zip(y).takeWhile { case (p, q) => p == q }.size.toLong
    }
    val order = (1 to s.length).sortBy(p => s.substring(p - 1))
    val expect = order.sliding(2).map { case Seq(a, b) =>
      (a.toLong, b.toLong, lcp(a, b))
    }.toSet
    assert(got == expect)
    // LRS of this corpus is "anaban" (pos 4 and 11) — max adjacent LCP 6
    assert(got.map(_._3).max == 6L)
  }

  test("generator-driven: random small-alphabet corpora equal the host sort") {
    // small alphabet maximizes repeated substrings (the hard case for
    // rank refinement); deterministic seed so failures reproduce
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 48)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpora = Gen.listOfN(6, gen)
      .apply(Gen.Parameters.default, Seed(11L)).getOrElse(Nil)
    assert(corpora.nonEmpty)
    corpora.foreach { s =>
      val chars = s.zipWithIndex
        .map { case (c, i) => ((i + 1).toLong, c.toInt) }.toDF("gpos", "code")
      val sa = SuffixArray.prefixDoubling(chars)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(sa == hostSa(s), s"mismatch on corpus '$s'")
    }
  }

  test("periodic corpus (worst case for doubling rounds)") {
    val s = "ab" * 24 + "" // long shared prefixes everywhere
    val chars = s.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toInt) }.toDF("gpos", "code")
    val sa = SuffixArray.prefixDoubling(chars)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sa == hostSa(s))
  }
}
