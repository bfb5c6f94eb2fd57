package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Content-defined chunking: determinism, reconstruction, and the
  * re-alignment property that is the whole point — a prefix insertion
  * shifts every byte, yet most chunks survive because boundaries are
  * content-addressed.
  */
class CdcChunksSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Plain-Scala reference: identical window/cut rule. */
  private def refChunks(s: String, w: Int = 16, b: Int = 31,
      m: Long = 1000000007L, d: Int = 64): Seq[String] = {
    val pow = Array.iterate(1L, w)(x => x * b % m)
    val cuts = (w to s.length).filter { p =>
      var h = 0L
      (0 until w).foreach(j => h = (h + s.charAt(p - 1 - j).toLong * pow(j)) % m)
      h % d == 0
    }
    val bounds = (0 +: cuts) :+ s.length
    bounds.sliding(2).collect {
      case Seq(a, bb) if bb > a => s.substring(a, bb)
    }.toSeq
  }

  test("kernel chunks equal the reference; chunks reconstruct the text") {
    val rows = Tables.documents(spark, dir).filter($"doc_id" < 50)
      .select(coalesce($"text", lit("")).as("t"),
        exprs.cdcChunks(coalesce($"text", lit(""))).as("cs"))
      .as[(String, Seq[(String, Int)])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, cs) =>
      val ref = refChunks(t)
      assert(cs.map(_._2) == ref.map(_.length), "chunk lengths diverge")
      assert(cs.map(_._2).sum == t.length, "chunks must cover the text")
      // hashes equal md5 of the reference substrings
      val md = java.security.MessageDigest.getInstance("MD5")
      val refH = ref.map(c =>
        md.digest(c.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString)
      assert(cs.map(_._1) == refH)
    }
  }

  test("prefix insertion re-aligns: most chunks shared with the shifted copy") {
    val docs = Tables.documents(spark, dir).filter($"doc_id" < 100)
      .select($"doc_id", coalesce($"text", lit("")).as("t"))
      .filter(length($"t") >= 200)
    val orig = docs.select($"doc_id", explode(exprs.cdcChunks($"t")).as("c"))
      .select($"doc_id", $"c.h".as("h"))
    val shifted = docs
      .select($"doc_id", concat(lit("INSERTED PREFIX "), $"t").as("t"))
      .select($"doc_id", explode(exprs.cdcChunks($"t")).as("c"))
      .select($"doc_id", $"c.h".as("h"))
    val stats = orig.groupBy($"doc_id").agg(count(lit(1)).as("n_orig"))
      .join(
        orig.join(shifted, Seq("doc_id", "h"), "left_semi")
          .groupBy($"doc_id").agg(count(lit(1)).as("n_shared")),
        Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce($"n_shared", lit(0L)))
      .as[(Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    // aggregate survival: insertions cost the chunks they touch, the
    // rest re-align — fixed blocks would share ~nothing
    val shared = stats.map(_._3).sum.toDouble
    val total = stats.map(_._2).sum.toDouble
    assert(shared / total >= 0.5, s"only $shared/$total chunks survived the shift")
  }

  test("chunking is layout-invariant") {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", coalesce($"text", lit("")).as("t"))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", explode(exprs.cdcChunks($"t")).as("c"))
        .select($"doc_id", $"c.h".as("h"))
        .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(docs) == run(docs.repartition(7, $"doc_id")))
  }
}
