package graft

import java.nio.file.{Files, Paths}

/** r14 optimization-round evidence: dump `.explain("formatted")` of one
  * or more queries to files — `plans/r14/<query>_{before,after}.txt`.
  *
  * Usage: runMain graft.PlanDump <suffix> <query> [query ...]
  *   writes plans/r14/<query>_<suffix>.txt for each query at sf0.1
  *   (the bench scale — the plans the optimization claims are about).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query> [query ...]")
    val suffix = args.head
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get("plans/r14"))
    args.tail.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val plan = fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r14/${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote plans/r14/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
