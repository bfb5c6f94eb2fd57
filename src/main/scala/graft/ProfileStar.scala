package graft

import org.apache.spark.sql.functions._

/** Local profiling scratch main: stage-by-stage timings of the MEF
  * star pipeline on SPARK_GRAFT_SF_DIR. Not part of the driver
  * contract; kept for perf work.
  */
object ProfileStar {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val raw = graft.queries.MefStarQueriesProfileHook.syntheticRaw(spark, sfDir)
    t("raw.count")(raw.count())
    val transformed = graft.mef.Transform(raw)
    val normalized = graft.mef.Normalize(transformed)
    // persist → count forces the FULL clean/normalize projection (a bare
    // count() would prune every expensive column away)
    val matNorm = normalized.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("normalize materialized")(println(s"  normalized rows = ${matNorm.count()}"))

    val grainCols = ("ano_eje" +: "mes_eje" +: graft.mef.MefSchema.dims.flatMap(_.allCols)).distinct
    val preAggs = graft.mef.MefSchema.measures.map(m => sum(col(m)).as(m))
    val grain = matNorm.groupBy(grainCols.map(col): _*).agg(preAggs.head, preAggs.tail: _*)
    t("grain groupBy (cached in)")(println(s"  grain rows = ${grain.count()}"))
    matNorm.unpersist()

    val star = t("Star.build + fact.count") {
      val s = graft.mef.Star.build(spark, normalized)
      println(s"  fact rows = ${s.fact.count()}")
      s
    }
    t("annual view (1st)")(graft.mef.Views.vwGastoAgregadoAnual(star).count())
    t("annual view (2nd)")(graft.mef.Views.vwGastoAgregadoAnual(star).count())
    t("ytd analytics")(
      graft.mef.Analytics.ytdDevengadoPorSector(star, 2017, 6).count())
    spark.stop()
  }
}
