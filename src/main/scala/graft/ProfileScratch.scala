package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag"), col("l_quantity"),
      col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val sortCols = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val dense = t("withDenseId (checkpoint+offsets)")(
      graft.operators.DenseId.withDenseId(li, sortCols, "__rank"))
    t("dense count")(dense.count())
    val bucketed = t("withNtile build")(
      graft.operators.ExactNtile.withNtile(li, sortCols, 20, "pbucket"))
    val joint = t("joint agg + checkpoint")(
      bucketed.select(col("l_returnflag").as("g"),
          col("pbucket").cast(DecimalType(4, 0)).as("x"),
          col("l_quantity").cast(DecimalType(4, 0)).as("y"))
        .groupBy(col("g"), col("x"), col("y")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint())
    t("rest of spearman")(graft.operators.Spearman.byGroup(
      bucketed, "l_returnflag",
      col("pbucket").cast(DecimalType(4, 0)),
      col("l_quantity").cast(DecimalType(4, 0)),
      outName = "r").collect())
    spark.stop()
  }
}
