package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{PpJoin, TextOps}

/** PPJoin prefix-filtered set-similarity join: losslessness vs the
  * naive all-pairs join (the theorem under test), planted-near-dup
  * recovery, pruning effectiveness, and layout invariance.
  */
class PpJoinSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** originals ∪ drop-first-token copies at id+1000, as token sets. */
  private lazy val corpus: DataFrame = {
    val d = Tables.documents(spark, dir)
      .select($"doc_id", $"text").filter($"doc_id" < 150)
    d.unionAll(d.select(
      ($"doc_id" + 1000).as("doc_id"),
      regexp_replace($"text", "^\\S+\\s*", "").as("text")))
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
  }

  /** Naive all-pairs reference with identical integer semantics. */
  private def naivePairs(num: Int, den: Int): Set[(Long, Long, Long, Long, Long)] = {
    val dt = corpus.select($"doc_id", explode($"toks").as("tok")).distinct()
    val sizes = dt.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    dt.as("a").join(dt.as("b"),
        $"a.tok" === $"b.tok" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"doc_id".as("id_a"), $"sz".as("size_a")), "id_a")
      .join(sizes.select($"doc_id".as("id_b"), $"sz".as("size_b")), "id_b")
      .filter(expr(s"$den * inter >= $num * (size_a + size_b - inter)"))
      .select($"id_a", $"id_b", $"inter", $"size_a", $"size_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("prefix filtering is lossless: result equals the naive all-pairs join") {
    val got = PpJoin.jaccardPairs(corpus, "doc_id", "toks", num = 3, den = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = naivePairs(3, 5)
    assert(want.nonEmpty, "fixture must produce at least the planted pairs")
    assert(got == want)
  }

  test("planted drop-one-token copies are recovered at Jaccard >= 3/5") {
    val got = PpJoin.jaccardPairs(corpus, "doc_id", "toks", 3, 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val hits = (0L until 150L).count(i => got.contains((i, i + 1000)))
    assert(hits >= 140, s"planted recall $hits/150")
  }

  test("prefix index is smaller than the full index") {
    // the effectiveness claim: candidate generation reads strictly
    // fewer (doc, token) rows than the naive join would
    val dt = corpus.select($"doc_id", explode($"toks").as("tok")).distinct()
    val full = dt.count()
    val dfreq = dt.groupBy($"tok").agg(count(lit(1)).as("df"))
    val prefix = dt.join(dfreq, "tok")
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"df", $"tok")))
      .withColumn("size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .filter($"pos" <= $"size" - expr("((3 * size) + 5 - 1) div 5") + 1)
      .count()
    assert(prefix < full / 2, s"prefix $prefix not < half of full $full")
  }

  test("result is layout-invariant") {
    def run(c: DataFrame) =
      PpJoin.jaccardPairs(c, "doc_id", "toks", 3, 5)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(run(corpus) == run(corpus.repartition(7, $"doc_id")))
  }
}
