package graft

/** Strong-scaling (parallel-efficiency) harness — r13 verdict item 1.
  *
  * SCALE.md's ScaleBench curves measure how WORK grows with data size;
  * this main measures how the plans use CORES: a fixed representative
  * query per class, timed at the session's thread count, so a driver
  * script can sweep `SPARK_GRAFT_CPUS=4/8/16/32` on the SAME fixture
  * and the same day (the iso protocol) and fit per-class speedups.
  *
  * Interpretation contract (recorded with the results in SCALE.md):
  * a query flat from 8→32 cores at sf0.1 is fixture-floor-bound (the
  * per-job scheduling floor dominates — fine, document it); a query
  * that DEGRADES with more cores has a serialization point the local
  * box was hiding (a 1-partition stage, a driver loop) — a found bug.
  *
  * Usage: SPARK_GRAFT_CPUS=N SPARK_GRAFT_SF_DIR=dir \
  *          sbt "runMain graft.CoreBench [runsPerQuery]"
  * Prints one JSON line:
  *   {"metric":"core_bench","cpus":N,"sf":dir,
  *    "queries":{name:medianSec,…}}
  *
  * Artifacts (IVF quantizer, LPA partition, SA rounds) pre-warm
  * untimed exactly as in the full Bench, so every CPU setting measures
  * the same consumer-side work.
  */
object CoreBench {

  /** One representative per query class (names = SparkEntry keys):
    * scan+agg star view, TPC-H join pipeline, rollup, window
    * sessionize, ETL e2e, iterative graph ×2, LSH dedup ×2, kNN+CC,
    * IVF probe, suffix array, tokenizer training, LM vocab, sketch,
    * mixture sampling.
    */
  val Representatives: Seq[String] = Seq(
    "ytd_by_region",
    "tpch_q3_shipping_priority",
    "monthly_star_rollup",
    "events_sessionize",
    // the e2e ETL representative is the INCREMENTAL pipeline: it
    // builds its own star per call (Star.build + append), so the
    // measurement stays a real build at every core count — the
    // starCache-backed mef_star_pipeline_* queries would measure only
    // the post-build view query after their first run (r14)
    "mef_star_incremental_ytd",
    "pagerank_supplier_customer",
    "kcore_decomposition",
    "dedup_minhash_lsh",
    "dedup_winnow_pairs",
    "semdedup_knn_clusters",
    "ann_ivf_topk",
    "suffix_array_build",
    "bpe_merges",
    "unigram_lm_vocab",
    "hll_distinct_orders",
    "mixture_temperature_sample")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local(cpus)

    // untimed warm-up + shared artifacts (the Bench convention)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).collect()
    spark.range(100).toDF("h").stat.bloomFilter("h", 1000L, 0.01)
    queries.IvfArtifacts.warm(spark, sfDir)
    queries.GraphLearnQueries.warmArtifacts(spark, sfDir)
    queries.CurationQueries.warmArtifacts(spark, sfDir)
    queries.PipelineQueries.warmArtifacts(spark, sfDir)
    // r15: pagerank rep reads the prepared (deg, ed) artifact — warm
    // it so the rep measures the iterative rounds at every core count
    queries.SketchStatsQueries.warmArtifacts(spark, sfDir)

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val results = Representatives.map { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        System.gc() // inter-run hygiene, outside the timers
        sec
      }
      name -> median(ts)
    }
    val qjson = results
      .map { case (n, t) => f""""$n":$t%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"core_bench","cpus":$cpus,"sf":"$sfDir","runs":$runs,"queries":$qjson}""")
    spark.stop()
  }
}
