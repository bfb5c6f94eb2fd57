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
    import graft.mef.{MefSchema, Normalize, Star, Transform}
    val raw = graft.queries.MefStarQueriesProfileHook.syntheticRaw(spark, sfDir)
    val normalized = Normalize(Transform(raw))
    val grainCols = ("ano_eje" +: "mes_eje" +: MefSchema.dims.flatMap(_.allCols)).distinct
    val preAggs = MefSchema.measures.map(m => sum(col(m)).as(m))
    val grain = t("grain groupBy + checkpoint")(
      normalized.groupBy(grainCols.map(col): _*).agg(preAggs.head, preAggs.tail: _*)
        .localCheckpoint())
    val tiempo = Star.dimTiempo(spark)
    val dims = t("7 dims concurrent checkpoints") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      Await.result(
        Future.traverse(MefSchema.dims) { spec =>
          Future { spec.name -> Star.buildDim(grain, spec).localCheckpoint() }
        },
        Duration.Inf).toMap
    }
    t("7 dims SEQUENTIAL checkpoints") {
      MefSchema.dims.foreach { spec => Star.buildDim(grain, spec).localCheckpoint() }
    }
    spark.stop()
  }
}
