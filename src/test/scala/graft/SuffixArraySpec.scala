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

  test("periodic corpus (worst case for doubling rounds)") {
    val s = "ab" * 24 + "" // long shared prefixes everywhere
    val chars = s.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toInt) }.toDF("gpos", "code")
    val sa = SuffixArray.prefixDoubling(chars)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sa == hostSa(s))
  }
}
