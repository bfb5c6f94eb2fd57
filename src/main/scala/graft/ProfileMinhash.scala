package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main for the minhash pipeline stages. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.select((col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s*", "").as("text")))
    t("corpus.count")(corpus.count())
    t("corpus.count again")(corpus.count())
    val sigs = graft.operators.MinHashLsh.signatures(corpus, "doc_id", "text")
    t("signatures.count")(sigs.count())
    t("full nearDupPairs")(graft.operators.MinHashLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5).count())
    t("full again")(graft.operators.MinHashLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5).count())
    spark.stop()
  }
}
