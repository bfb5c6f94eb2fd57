package graft

import org.apache.spark.sql.functions._

/** Evidence that AQE's skew-join mitigation actually FIRES on a
  * skewed shuffle join — StarSkewSpec proves correctness under the
  * hot key and A/Bs salting, but (until r13) no plan asserted the
  * runtime split itself. Thresholds are scaled to fixture bytes
  * (production keeps the 256MB/64MB defaults); the mechanism is
  * byte-threshold-relative, so the assertion transfers to 100 TB
  * unchanged. The mef_star_dpp_prune require() pattern, applied to
  * the executed adaptive plan.
  */
class AqeSkewJoinSpec extends SparkSuite {

  test("AQE splits the skewed partition in a sort-merge join (skew=true in the executed plan)") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.flatMap(Option(_)))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // hot key 1 carries ~90% of the probe side; the build side is
      // uniform and too big to broadcast under the disabled threshold
      val left = spark.range(200000).select(
        when(pmod(col("id"), lit(10)) =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = spark.range(100000)
        .select(col("id").as("k"), (col("id") * 2).as("r"))
      val joined = left.join(right, "k")
      // correctness first: 180k hot rows (k=1) + the 10k uniform keys
      // below the right side's 100k bound. collect() (not count())
      // so THIS queryExecution finalizes — the skew split is a
      // runtime re-plan and only exists on the executed plan.
      assert(joined.collect().length == 190000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join split did not fire — executed plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
