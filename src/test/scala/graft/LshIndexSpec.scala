package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.LshIndex

/** Persisted LSH index: probe finds planted cross-corpus near-dups
  * without re-reading corpus text, append is idempotent, and the probe
  * plan never shuffles the index (broadcast joins only).
  */
class LshIndexSpec extends SparkSuite {
  import spark.implicits._

  // deterministic "documents": long word sequences so 3-gram shingle
  // sets are rich; near-dups perturb one word in the middle
  private def words(seed: Long, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * i * 7) % 211}").mkString(" ")

  private def corpus = (0L until 40L)
    .map(i => (i, words(i, 60)))
    .toDF("doc_id", "text")

  // batch: ids 1000+; docs 1000..1003 near-duplicate corpus docs
  // 0..3 (one word replaced), the rest are fresh
  private def batch = ((0L until 4L).map { i =>
    val t = words(i, 60).split(" ").updated(30, "CHANGED").mkString(" ")
    (1000L + i, t)
  } ++ (4L until 10L).map(i => (1000L + i, words(500L + i, 60))))
    .toDF("doc_id", "text")

  test("probe finds planted near-dups of the corpus, and only those") {
    val path = Files.createTempDirectory("lshindex").toString + "/idx"
    // non-default hash params: probe/append must pick them up from the
    // index's persisted meta, not from call-site defaults
    LshIndex.build(corpus, "doc_id", "text", path, numHashes = 32, bands = 8)
    assert(LshIndex.params(spark, path) == LshIndex.Params(3, 32, 8))
    val hits = LshIndex.probe(spark, path, batch, "doc_id", "text",
      threshold = 0.5)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert((0L until 4L).forall(i => hits.contains((1000L + i, i))),
      s"missing planted matches in $hits")
    assert(hits.forall { case (b, ix) => b - 1000L == ix },
      s"false matches in $hits")
  }

  test("append is idempotent and makes the batch findable") {
    val path = Files.createTempDirectory("lshindex_app").toString + "/idx"
    LshIndex.build(corpus, "doc_id", "text", path)
    LshIndex.append(spark, path, batch, "doc_id", "text")
    val once = spark.read.parquet(s"$path/sigs").count()
    LshIndex.append(spark, path, batch, "doc_id", "text") // re-delivery
    assert(spark.read.parquet(s"$path/sigs").count() == once,
      "re-delivered append must be a no-op")

    // a probe of the same batch now matches the indexed copies of the
    // corpus docs AND excludes identical-id self-matches
    val hits = LshIndex.probe(spark, path, batch, "doc_id", "text",
      threshold = 0.5)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert((0L until 4L).forall(i => hits.contains((1000L + i, i))))
    assert(hits.forall { case (b, ix) => b != ix }, "self-matches leaked")
  }

  test("compact preserves the index exactly: probe rows identical, meta verbatim") {
    val base = Files.createTempDirectory("lshindex_cmp").toString
    val raw = s"$base/idx"
    val out = s"$base/compacted"
    // build + 3 appends (one re-delivered) under a NON-default family,
    // then compact — the appended small files become one artifact
    LshIndex.build(corpus.filter($"doc_id" < 20), "doc_id", "text", raw,
      family = graft.operators.MinHashLsh.Family.Md5Mod(7L))
    LshIndex.append(spark, raw, corpus.filter($"doc_id" >= 20 && $"doc_id" < 30), "doc_id", "text")
    LshIndex.append(spark, raw, corpus.filter($"doc_id" >= 30), "doc_id", "text")
    LshIndex.append(spark, raw, corpus.filter($"doc_id" >= 20 && $"doc_id" < 30), "doc_id", "text")
    LshIndex.compact(spark, raw, out)

    assert(LshIndex.params(spark, out) == LshIndex.params(spark, raw))
    assert(spark.read.parquet(s"$out/sigs").count() == corpus.count())
    // row sets identical dataset-by-dataset (compaction re-lays bytes only)
    Seq("sigs", "buckets").foreach { d =>
      val a = spark.read.parquet(s"$raw/$d")
      val b = spark.read.parquet(s"$out/$d")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$d diverged")
    }
    // probing the compacted index == probing the uncompacted one
    val pa = LshIndex.probe(spark, raw, batch, "doc_id", "text", 0.5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val pb = LshIndex.probe(spark, out, batch, "doc_id", "text", 0.5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(pa == pb && pa.nonEmpty)
  }

  test("RTBF delete hides victims, re-delivery no-ops, compact drops rows, re-ingest unmasks") {
    val base = Files.createTempDirectory("lshindex_rtbf").toString
    val raw = s"$base/idx"
    val out = s"$base/compacted"
    LshIndex.build(corpus, "doc_id", "text", raw)
    val victims = Seq(0L, 1L).toDF("doc_id")
    LshIndex.delete(spark, raw, victims)
    LshIndex.delete(spark, raw, victims) // re-delivered purge request
    assert(spark.read.parquet(s"$raw/tombstones").count() == 2,
      "re-delivered delete must be a no-op")
    val hits = LshIndex.probe(spark, raw, batch, "doc_id", "text", 0.5)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert(!hits.exists { case (_, ix) => ix == 0L || ix == 1L },
      s"victims leaked: $hits")
    assert((2L until 4L).forall(i => hits.contains((1000L + i, i))),
      s"non-victims lost: $hits")
    // compact: victim rows physically gone, no tombstones, probe identical
    LshIndex.compact(spark, raw, out)
    assert(spark.read.parquet(s"$out/sigs").filter($"doc_id" < 2).count() == 0)
    assert(spark.read.parquet(s"$out/buckets").filter($"doc_id" < 2).count() == 0)
    assert(!new java.io.File(s"$out/tombstones").exists())
    val hc = LshIndex.probe(spark, out, batch, "doc_id", "text", 0.5)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert(hc == hits)
    // re-ingest after purge is a NEW record: un-tombstoned, findable
    LshIndex.append(spark, raw, corpus.filter($"doc_id" < 2), "doc_id", "text")
    assert(spark.read.parquet(s"$raw/tombstones").count() == 0)
    val hb = LshIndex.probe(spark, raw, batch, "doc_id", "text", 0.5)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert((0L until 4L).forall(i => hb.contains((1000L + i, i))))
  }

  test("compact into the same directory is refused even via an aliased path") {
    val path = Files.createTempDirectory("lshindex_alias").toString + "/idx"
    LshIndex.build(corpus, "doc_id", "text", path)
    intercept[IllegalArgumentException] {
      LshIndex.compact(spark, path, path + "/") // trailing-slash alias
    }
  }

  test("params reads a pre-family 3-column meta tolerantly (defaults to XxChain)") {
    val path = Files.createTempDirectory("lshindex_meta").toString + "/idx"
    LshIndex.build(corpus, "doc_id", "text", path, numHashes = 32, bands = 8)
    // simulate an index persisted before the family columns existed
    Seq((3, 32, 8)).toDF("shingle_n", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    assert(LshIndex.params(spark, path) == LshIndex.Params(3, 32, 8))
    // and the old index stays probe-able end to end (it WAS XxChain)
    val hits = LshIndex.probe(spark, path, batch, "doc_id", "text", 0.5)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert((0L until 4L).forall(i => hits.contains((1000L + i, i))))
  }

  test("probe plan never shuffles the index: broadcast joins, no SMJ") {
    val path = Files.createTempDirectory("lshindex_plan").toString + "/idx"
    LshIndex.build(corpus, "doc_id", "text", path)
    val plan = LshIndex.probe(spark, path, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"index side fell into a shuffle join:\n$plan")
  }
}
