package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiling main (contents vary by investigation). */
object ProfileScratch {
  def raw(spark: SparkSession, dir: String, fan: Boolean): DataFrame = {
    val li0 = Tables.lineitem(spark, dir)
    val li = if (fan) graft.Par.fanOut(li0) else li0
    li.join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
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
        col("l_extendedprice").cast("string").as("MONTO_COMPROMETIDO"))
  }

  def grainOf(df: DataFrame): DataFrame = {
    val grainCols = ("ano_eje" +: "mes_eje" +: graft.mef.MefSchema.dims.flatMap(_.allCols)).distinct
    val preAggs = graft.mef.MefSchema.measures.map(m => sum(col(m)).as(m))
    graft.mef.Normalize(graft.mef.Transform(df))
      .groupBy(grainCols.map(col): _*).agg(preAggs.head, preAggs.tail: _*)
  }

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
    t("grain no-fan cold")(grainOf(raw(spark, sfDir, fan = false)).count())
    t("grain no-fan warm")(grainOf(raw(spark, sfDir, fan = false)).count())
    t("grain fan cold")(grainOf(raw(spark, sfDir, fan = true)).count())
    t("grain fan warm")(grainOf(raw(spark, sfDir, fan = true)).count())
    spark.stop()
  }
}
