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
    import graft.operators._
    val docs = Tables.documents(spark, sfDir)
    println("[profile] partitions = " + docs.rdd.getNumPartitions + ", rows = " + docs.count())
    val lang = docs.select(col("doc_id"), TextOps.langId(col("text")).as("lang"))
    t("lang only, forced")(lang.agg(count(col("lang"))).collect())
    val qual = docs.select(TextOps.qualityScore(col("text")).as("q"))
    t("quality only, forced")(qual.agg(count(col("q"))).collect())
    val both = docs.select(TextOps.langId(col("text")).as("lang"), TextOps.qualityScore(col("text")).as("q"))
    t("both, forced")(both.agg(count(col("lang")), count(col("q"))).collect())
    val repart = docs.repartition(32).select(TextOps.langId(col("text")).as("lang"), TextOps.qualityScore(col("text")).as("q"))
    t("both after repartition(32)")(repart.agg(count(col("lang")), count(col("q"))).collect())
    spark.stop()
  }
}
