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
    val docs = Tables.documents(spark, sfDir)
    t("docs count")(println("  rows=" + docs.count()))
    val existing = docs.filter(col("doc_id") < 250)
    val norm = xxhash64(lower(regexp_replace(coalesce(col("text"), lit("")), "\\s+", " ")))
    val hashed = existing.select(norm.as("h"))
    val bloom = t("bloom build")(hashed.stat.bloomFilter("h", 100000L, 0.01))
    t("bloom build 2nd")(hashed.stat.bloomFilter("h", 100000L, 0.01))
    t("bloom build 3rd, 1M items")(hashed.stat.bloomFilter("h", 1000000L, 0.01))
    t("plain agg same scan")(println("  n=" + hashed.agg(count(lit(1))).collect()(0).getLong(0)))
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
    println("  bloom bytes=" + bytes.length)
    val fh = t("hash+probe checkpoint")(
      docs.withColumn("_h", norm)
        .withColumn("_might", graft.functions.exprs.bloomMightContainLong(col("_h"), bytes))
        .localCheckpoint())
    t("split+antijoin+union count")({
      val dn = fh.filter(!col("_might"))
      val tp = fh.filter(col("_might")).join(hashed.select(col("h").as("_h")).distinct(), Seq("_h"), "left_anti")
      println("  result=" + dn.unionByName(tp).drop("_h", "_might").select(col("doc_id")).orderBy(col("doc_id")).count())
    })
    t("full query 2nd run")({
      val r = graft.operators.IncrementalDedup.newDocuments(existing, docs, "text", 100000L)
      println("  rows=" + r.select(col("doc_id")).orderBy(col("doc_id")).count())
    })
    spark.stop()
  }
}
