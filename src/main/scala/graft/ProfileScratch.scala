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
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    t("lineitem scan.count")(li.count())
    t("one count_distinct")(li.agg(count_distinct(col("l_orderkey"))).collect())
    t("three count_distinct")(li.agg(count_distinct(col("l_orderkey")), count_distinct(col("l_quantity")), count_distinct(col("l_returnflag"))).collect())
    t("full mixed agg (Profiler shape)")(graft.operators.Profiler.profile(li).collect())
    t("full again")(graft.operators.Profiler.profile(li).collect())
  spark.stop()
  }
}
