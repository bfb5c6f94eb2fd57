package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ClusteredWrite

/** Range-clustered layout: files must carry pairwise-disjoint key
  * ranges (the property footer-stat pruning depends on), rows must
  * survive the rewrite intact, and the contrast case — an unclustered
  * hash layout — must show overlapping ranges.
  */
class ClusteredWriteSpec extends SparkSuite {

  private def dfIn = spark.range(0, 10000).select(
    (col("id") * 37 % 10000).as("k"), col("id").as("payload"))

  test("clustered files have pairwise-disjoint key ranges; rows survive") {
    val out = Files.createTempDirectory("clustered").toString + "/t"
    ClusteredWrite.write(dfIn, out, nFiles = 8, clusterCols = Seq("k"))

    val ranges = ClusteredWrite.fileRanges(spark, out, "k")
      .map { case (f, lo, hi) => (f, lo.toLong, hi.toLong) }
      .sortBy(_._2)
    assert(ranges.size >= 2, "expected a multi-file layout")
    ranges.foreach { case (f, lo, hi) => assert(lo <= hi, s"$f: [$lo,$hi]") }
    ranges.sliding(2).foreach {
      case Seq((fa, _, hiA), (fb, loB, _)) =>
        assert(hiA <= loB, s"overlap: $fa ends at $hiA, $fb starts at $loB")
      case _ =>
    }

    val got = spark.read.parquet(out)
    assert(got.count() == 10000)
    assert(got.agg(sum("payload")).head().getLong(0) ==
      dfIn.agg(sum("payload")).head().getLong(0))
  }

  test("contrast: a hash-partitioned write overlaps on nearly every file") {
    val out = Files.createTempDirectory("unclustered").toString + "/t"
    dfIn.repartition(8, col("k"))
      .write.parquet(out)
    val ranges = ClusteredWrite.fileRanges(spark, out, "k")
      .map { case (_, lo, hi) => (lo.toLong, hi.toLong) }
    // every hash partition spans nearly the whole key domain — a range
    // predicate can prune nothing
    assert(ranges.forall { case (lo, hi) => lo < 1000 && hi > 9000 })
  }
}
