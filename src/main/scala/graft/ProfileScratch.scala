package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiling main (contents vary by investigation). */
object ProfileScratch {
  def raw(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
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
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

    val r0 = raw(spark, sfDir)
    t("raw force (scan+joins+casts)")(force(r0))
    t("raw force again")(force(r0))

    val norm = graft.mef.Normalize(graft.mef.Transform(r0))
    t("transform+normalize force")(force(norm))
    t("transform+normalize force again")(force(norm))

    // same shape but limpiarTexto → plain coalesce-cast (no regexp/trim)
    val numSet = graft.mef.MefSchema.colsNum.toSet
    val conformed = graft.functions.Clean.conformar(
      graft.functions.Clean.normalizarCabeceras(r0), graft.mef.MefSchema.colsClave)
    val noRegex = conformed.select(graft.mef.MefSchema.colsClave.map { c =>
      if (numSet.contains(c)) col(c).try_cast("double").as(c)
      else coalesce(col(c).cast("string"), lit("")).as(c)
    }: _*)
    t("conform+nocleankernel force")(force(noRegex))

    // trim only (no regexp)
    val trimOnly = conformed.select(graft.mef.MefSchema.colsClave.map { c =>
      if (numSet.contains(c)) col(c).try_cast("double").as(c)
      else trim(coalesce(col(c).cast("string"), lit(""))).as(c)
    }: _*)
    t("conform+trimonly force")(force(trimOnly))

    // grain groupBy over the full normalized plan (clean included)
    val grainCols = ("ano_eje" +: "mes_eje" +: graft.mef.MefSchema.dims.flatMap(_.allCols)).distinct
    val preAggs = graft.mef.MefSchema.measures.map(m => sum(col(m)).as(m))
    val grain = norm.groupBy(grainCols.map(col): _*).agg(preAggs.head, preAggs.tail: _*)
    t("grain groupBy cold")(grain.count())
    t("grain groupBy warm")(grain.count())
    spark.stop()
  }
}
