package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
    import graft.functions.TimePred
    import graft.mef.{Analytics, Normalize, Star, Transform}
    val li = Tables.lineitem(spark, sfDir)
      .filter(TimePred.inYearMonths(col("l_shipdate"), 1997, 1, 6))
    val typed0 = Transform(
      li.join(broadcast(Tables.supplier(spark, sfDir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
        .select(
          (year(col("l_shipdate")) + 20).cast("string").as("ANO_EJE"),
          month(col("l_shipdate")).cast("string").as("MES_EJE"),
          lit("E").as("NIVEL_GOBIERNO"),
          lit("GOBIERNO NACIONAL").as("NIVEL_GOBIERNO_NOMBRE"),
          col("s_suppkey").cast("string").as("SEC_EJEC"),
          col("s_suppkey").cast("string").as("EJECUTORA"),
          col("s_name").as("EJECUTORA_NOMBRE"),
          col("n_name").as("SECTOR"),
          col("r_name").as("SECTOR_NOMBRE"),
          col("l_quantity").cast("string").as("MONTO_DEVENGADO"),
          col("l_extendedprice").cast("string").as("MONTO_COMPROMETIDO")))
    val typed = t("transform checkpoint")(typed0.localCheckpoint())
    val star1 = t("star1 build (m1-3)")(
      Star.build(spark, Normalize(typed.filter(col("MES_EJE") <= 3))))
    val inc = t("append (m4-6)")(
      Star.append(spark, star1, Normalize(typed.filter(col("MES_EJE") > 3))))
    t("ytd query")(
      Analytics.ytdDevengadoPorSector(inc, 2017, 6).count())
    spark.stop()
  }
}
