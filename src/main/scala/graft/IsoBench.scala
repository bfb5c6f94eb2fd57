package graft

/** Isolated single-query timing: `runMain graft.IsoBench <query> [sfDir]`.
  *
  * The full Bench sweep shares one JVM across 145 queries, so late
  * entries inherit earlier entries' garbage and JIT state — CLAUDE.md
  * records 3-18 s swings on identical code. When a sweep number looks
  * like a regression, THIS is the arbiter: one query, warmed once,
  * then three GC-separated timed runs against the noop sink.
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IsoBench <queryName> [sfDir]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val q = SparkEntry.queries.getOrElse(args(0),
      throw new IllegalArgumentException(
        s"unknown query ${args(0)}; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    q(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    (1 to 3).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[iso] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
