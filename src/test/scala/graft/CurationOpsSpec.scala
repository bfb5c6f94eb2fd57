package graft

import org.apache.spark.sql.functions._

import graft.operators.{StratifiedSample, TextOps}

/** Stratified sampling + vocabulary: determinism, invariance, edges. */
class CurationOpsSpec extends SparkSuite {
  import spark.implicits._

  test("capPerStratum: exact cap, partition-invariant, deterministic") {
    val df = (1L to 300L).map(i => (i, s"class${i % 3}")).toDF("id", "cls")
    val a = StratifiedSample.capPerStratum(df, Seq("cls"), "id", 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a.size == 60, "3 strata x cap 20")
    assert(a.groupBy(_._2).forall(_._2.size == 20))
    // same selection regardless of input partitioning
    val b = StratifiedSample.capPerStratum(df.repartition(13), Seq("cls"), "id", 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "selection must be a pure function of the keys")
    // under-cap strata pass through whole
    val small = StratifiedSample.capPerStratum(df, Seq("cls"), "id", 1000)
    assert(small.count() == 300)
  }

  test("capPerStratum selection == HashSample-style md5 order") {
    val df = (1L to 50L).map(i => (i, "one")).toDF("id", "cls")
    val got = StratifiedSample.capPerStratum(df, Seq("cls"), "id", 5)
      .collect().map(_.getLong(0)).toSet
    val expected = (1L to 50L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .take(5).toSet
    assert(got == expected)
  }

  test("vocabulary: counts, min-df cut, deterministic order, empty docs") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "THE  dog"),
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v = TextOps.vocabulary(docs, "doc_id", "text", minDf = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 'the' in 3 docs (case-folded), 'cat' in 2; everything else df=1
    assert(v.toSeq == Seq(("the", 3L, 3L), ("cat", 2L, 2L)))
    // repeated token inside one doc: df counts docs, occurrences count tokens
    val rep = Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text")
    val vr = TextOps.vocabulary(rep, "doc_id", "text", minDf = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vr.toSeq == Seq(("a", 2L, 3L), ("b", 2L, 2L)))
  }

  test("redactPii: emails, IPs, phones -> typed placeholders; clean text untouched") {
    val rows = Seq(
      (1L, "write to alice.o-neil+spam@sub.example.co.uk today"),
      (2L, "server at 192.168.0.1 and 10.255.3.77, version 1.2 intact"),
      (3L, "call +51 987 654 321 or 4471234567890 now"),
      (4L, "bob@site.io then 8.8.8.8 then +1 800-555-0199"),
      (5L, "no pii here, just words and 42 digits")
    ).toDF("id", "t")
    val got = rows.select(col("id"),
      graft.operators.TextOps.redactPii(col("t")).as("r"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      1L -> "write to <EMAIL> today",
      // "version 1.2" must survive: not a dotted quad
      2L -> "server at <IP> and <IP>, version 1.2 intact",
      3L -> "call <PHONE> or <PHONE> now",
      4L -> "<EMAIL> then <IP> then <PHONE>",
      5L -> "no pii here, just words and 42 digits"))
  }
}
