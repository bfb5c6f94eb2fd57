package graft

import org.apache.spark.sql.functions._

import graft.operators.MixtureSample

/** Training-mixture operators: exact budgets, determinism across
  * partition layouts, and the covariance aggregator's merge law.
  */
class TrainingMixSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs =
    Tables.documents(spark, dir).select(col("doc_id"), col("source"))

  test("MixtureSample hits each group's budget exactly and is layout-invariant") {
    val budgets = (0 until 20).map(i => s"src$i" -> (if (i < 5) 15 else 5)).toMap
    val sel = MixtureSample.toCounts(docs, "doc_id", "source", budgets)
    val counts = sel.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    budgets.foreach { case (g, b) => assert(counts(g) == b.toLong, s"$g: ${counts(g)} != $b") }

    val ids = sel.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    Seq(1, 7, 32).foreach { n =>
      val again = MixtureSample
        .toCounts(docs.repartition(n), "doc_id", "source", budgets)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(again == ids, s"selection changed under $n partitions")
    }
  }

  test("MixtureSample: unknown groups and zero budgets select nothing") {
    val sel = MixtureSample.toCounts(docs, "doc_id", "source",
      Map("src0" -> 3, "src1" -> 0, "no_such_source" -> 10))
    val bySrc = sel.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("src0" -> 3L))
  }

  test("MixtureSample: growing the corpus never reshuffles a selection, only displaces") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def expected(ids: Seq[Long], budget: Int): Set[Long] =
      ids.sortBy(id => (md5hex(id.toString), id)).take(budget).toSet

    val budgets = Map("src0" -> 10)
    val base = docs.filter(col("source") === "src0")
    val allIds = base.select("doc_id").collect().map(_.getLong(0)).toSeq
    val oldIds = allIds.filter(_ < 400)

    val before = MixtureSample.toCounts(base.filter(col("doc_id") < 400), "doc_id", "source", budgets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val after = MixtureSample.toCounts(base, "doc_id", "source", budgets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // both selections are exactly the budget-lowest md5 of their corpus
    assert(before == expected(oldIds, 10))
    assert(after == expected(allIds, 10))
    // append-stability: every previously-picked doc survives unless a
    // NEW doc hashes lower — old picks never displace each other
    val newcomers = after -- oldIds.toSet
    assert((before -- after).size == newcomers.intersect(after).size,
      "picks lost must equal new lower-hash docs admitted")
    assert(newcomers.nonEmpty || before == after)
  }

  test("large-budget threshold path selects the IDENTICAL rows as the heap path") {
    val budgets = (0 until 20).map(i => s"src$i" -> (if (i < 5) 15 else 5)).toMap
    val heap = MixtureSample.toCounts(docs, "doc_id", "source", budgets)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val thresh = MixtureSample.toCountsViaThreshold(docs, "doc_id", "source", budgets)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(thresh == heap, "threshold path diverged from heap path")
    // auto-switch: heapCap below maxBudget must route to the threshold path
    val auto = MixtureSample.toCounts(docs, "doc_id", "source", budgets, heapCap = 10)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(auto == heap)
    // a margin so small the preselection must fall short forces the
    // verification agg to escalate — result still exact
    val tiny = MixtureSample.toCountsViaThreshold(
      docs, "doc_id", "source", budgets, margin = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(tiny == heap, "margin escalation lost exactness")
  }

  test("threshold path: group domain above the ceiling fails loudly, not OOM") {
    // docs has 20 distinct sources; a ceiling of 4 must throw before
    // the driver materializes the per-group map…
    val budgets = (0 until 20).map(i => s"src$i" -> 5).toMap
    val ex = intercept[IllegalArgumentException] {
      MixtureSample.toCountsViaThreshold(
        docs, "doc_id", "source", budgets, maxGroups = 4)
    }
    assert(ex.getMessage.contains("distinct values"))
    // …and the auto-switch from toCounts threads the ceiling through
    intercept[IllegalArgumentException] {
      MixtureSample.toCounts(
        docs, "doc_id", "source", budgets, heapCap = 1, maxGroups = 4)
    }
    // a ceiling at the domain size passes and still selects exactly
    val ok = MixtureSample.toCountsViaThreshold(
      docs, "doc_id", "source", budgets, maxGroups = 20)
    assert(ok.count() == 100L)
  }

  test("perceptron dims above the driver ceiling fails loudly") {
    import spark.implicits._
    val f = Seq((1L, 1L, 0, 1L)).toDF("id", "y", "dim", "x")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Perceptron.train(f, dims = (1 << 20) + 1, rounds = 1)
    }
    assert(ex.getMessage.contains("driver-side"))
  }

  test("threshold path: budget above group size takes the whole group") {
    val sel = MixtureSample.toCountsViaThreshold(
      docs, "doc_id", "source", Map("src0" -> 1000))
    assert(sel.count() == 25) // src0 has 25 docs at sf0.001
  }

  test("CovarianceSketch: bit-identical across partition layouts; matches direct compute") {
    val emb = Tables.embeddings(spark, dir).select(col("embedding"))
    val agg = udaf(new graft.functions.CovarianceSketch(64))
    def run(n: Int): Seq[Long] =
      emb.repartition(n).agg(agg(col("embedding")).as("s"))
        .collect()(0).getSeq[Long](0)
    val one = run(1)
    assert(run(8) == one && run(32) == one, "aggregation order changed the matrix")

    // direct reference on a small slice: first 50 vectors, dim pair (0, 1)
    val vecs = Tables.embeddings(spark, dir).orderBy("vec_id").limit(50)
      .collect().map(_.getSeq[Float](1))
    val expect01 = vecs.map { v =>
      math.floor(v(0).toDouble * 1024.0).toLong * math.floor(v(1).toDouble * 1024.0).toLong
    }.sum
    val small = Tables.embeddings(spark, dir).orderBy("vec_id").limit(50)
      .agg(agg(col("embedding")).as("s")).collect()(0).getSeq[Long](0)
    assert(small(0) == expect01)
  }
}
