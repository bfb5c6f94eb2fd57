package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs
import graft.operators.{Dedup, TextOps}

/** Edge cases + cross-implementation equivalence for the custom
  * expressions.
  */
class ExpressionEdgeSpec extends SparkSuite {
  import spark.implicits._

  test("ngramHashes: cardinality equals the string-shingle formulation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val both = docs.select(
      size(exprs.ngramHashes(col("text"), 3)).as("h"),
      size(Dedup.shingles(col("text"), 3)).as("s")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("ngramHashes edge cases: empty, short, whitespace-only, null") {
    val rows = Seq(null, "", "   ", "one", "one two", "one two three", "a\tb\nc")
      .toDF("t")
      .select(exprs.ngramHashes($"t", 3).as("h")).collect()
    assert(rows(0).isNullAt(0), "null in → null out")
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).getSeq[Long](0).isEmpty)
    assert(rows(3).getSeq[Long](0).isEmpty)
    assert(rows(4).getSeq[Long](0).isEmpty)
    assert(rows(5).getSeq[Long](0).length == 1)
    assert(rows(6).getSeq[Long](0).length == 1, "any whitespace splits")
  }

  test("simhashText ≡ simhash64(tokens) on lowercase text") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val both = docs.select(
      exprs.simhashText(col("text")).as("a"),
      exprs.simhash64(TextOps.tokens(col("text"))).as("b")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("winnowFingerprint: shorter than k → empty; identical text → identical set") {
    val rows = Seq("abc", "abcdefgh", "abcdefghijkl").toDF("t")
      .select(exprs.winnowFingerprint($"t", 8, 4).as("f")).collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).getSeq[Long](0).length == 1)
    val two = Seq("same text here padded out", "same text here padded out").toDF("t")
      .select(exprs.winnowFingerprint($"t", 8, 4).as("f")).collect()
    assert(two(0).getSeq[Long](0) == two(1).getSeq[Long](0))
  }

  test("vecDot: nulls, length mismatch, empty") {
    GraftExtensions.register(spark)
    val d = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D, 3.0D), array(1.0D, 1.0D)) AS mismatch,
        |  vec_dot(array(CAST(NULL AS DOUBLE), 2.0D), array(3.0D, 4.0D)) AS withnull,
        |  vec_dot(array(CAST(1.0 AS DOUBLE)), array(CAST(2.0 AS DOUBLE))) AS one
        |""".stripMargin)
    val r = d.collect()(0)
    assert(r.getDouble(0) == 3.0, "min-length semantics")
    assert(r.getDouble(1) == 8.0, "null element skipped")
    assert(r.getDouble(2) == 2.0)
  }
}
