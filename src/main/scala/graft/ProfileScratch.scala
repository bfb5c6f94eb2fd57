package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (contents vary by investigation). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val corpus = e.unionAll(e.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.5f)).as("embedding")))
    t("corpus.count")(corpus.count())
    val buck = corpus.select(col("vec_id"),
      graft.functions.exprs.hyperplaneBuckets(col("embedding"), 64, 8, 12, 42L).as("b"))
    t("buckets.count")(buck.count())
    t("buckets again")(buck.count())
    val pairs = graft.operators.Similarity.nearDupPairs(corpus, "vec_id", "embedding", dim = 64, threshold = 0.99)
    t("nearDupPairs full")(println("rows=" + pairs.count()))
    t("nearDupPairs again")(pairs.count())
    spark.stop()
  }
}
