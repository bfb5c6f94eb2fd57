package graft
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("ytd_by_region", "monthly_star_rollup", "top5_suppliers", "grain_consolidation")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
