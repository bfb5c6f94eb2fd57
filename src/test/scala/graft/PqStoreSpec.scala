package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, PqStore}

/** Persisted PQ index: probe-from-codes must equal the in-memory ADC
  * search, appends must be idempotent under re-delivery, and the probe
  * plan must never shuffle or re-encode the corpus.
  */
class PqStoreSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val cbs = PqIndex.seededCodebooks(dim = 64, m = 8, ksub = 8, seed = 7L)
  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val probes = emb.filter(col("vec_id") < 5)

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("pqstore").toString

  test("probe from stored codes equals in-memory PqIndex.topK") {
    val path = freshPath()
    PqStore.build(emb, "vec_id", "embedding", path, cbs)
    assert(PqStore.codebooks(spark, path) == cbs)
    val got = PqStore.probe(spark, path, probes, "vec_id", "embedding", k = 5)
      .orderBy($"query_id", $"rank").collect().toSeq
    val want = PqIndex.topK(emb, probes, "vec_id", "embedding", k = 5, codebooks = cbs)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("append is idempotent; new vectors become probeable") {
    val path = freshPath()
    PqStore.build(emb.filter($"vec_id" < 400), "vec_id", "embedding", path, cbs)
    val n0 = spark.read.parquet(s"$path/codes").count()
    // re-deliver a slice already present: no growth, no code change
    PqStore.append(spark, path, emb.filter($"vec_id" < 100), "vec_id", "embedding")
    assert(spark.read.parquet(s"$path/codes").count() == n0)
    val before = PqStore.probe(spark, path, probes, "vec_id", "embedding", 5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(2)))
    // append the held-out tail; the index must now serve it
    PqStore.append(spark, path, emb.filter($"vec_id" >= 400), "vec_id", "embedding")
    assert(spark.read.parquet(s"$path/codes").count() == emb.count())
    val after = PqStore.probe(spark, path, probes, "vec_id", "embedding", 5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(2)))
    val full = PqIndex.topK(emb, probes, "vec_id", "embedding", 5, codebooks = cbs)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(2)))
    assert(after == full && before.nonEmpty)
    // a vector that only exists post-append serves as a probe against
    // the full index
    val newProbe = PqStore.probe(
      spark, path, emb.filter($"vec_id" === 450), "vec_id", "embedding", 5)
      .collect()
    assert(newProbe.length == 5 && newProbe.forall(_.getLong(0) == 450L))
  }

  test("probe plan broadcasts the probe tables and scans codes only") {
    val path = freshPath()
    PqStore.build(emb, "vec_id", "embedding", path, cbs)
    val plan = PqStore.probe(spark, path, probes, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    // the CORPUS side is the stored codes scan; embeddings.parquet may
    // appear once (the probe batch itself), never as the corpus side
    assert(plan.contains("/codes"), "probe must scan the stored codes")
    assert(plan.split("embeddings\\.parquet").length - 1 <= 1,
      "corpus vectors must not be rescanned")
  }
}
