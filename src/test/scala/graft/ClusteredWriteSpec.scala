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

  test("z-ordered layout prunes 2-D box predicates where 1-D clustering can't") {
    import graft.sources.ClusteredWrite.fileRanges
    // two independent uniform dims in [0, 4096)
    val pts = spark.range(0, 20000).select(
      (col("id") * 37 % 4096).as("x"),
      (col("id") * 101 % 4096).as("y"),
      col("id").as("payload"))
    val zOut = Files.createTempDirectory("zorder").toString + "/t"
    val xOut = Files.createTempDirectory("xclustered").toString + "/t"
    ClusteredWrite.writeZOrdered(pts, zOut, nFiles = 16, col("x"), col("y"))
    ClusteredWrite.write(pts, xOut, nFiles = 16, clusterCols = Seq("x"))

    // files whose [min,max] box intersects the query box on a given dim
    def touched(path: String, dim: String, lo: Long, hi: Long): Int =
      fileRanges(spark, path, dim)
        .map { case (_, a, b) => (a.toLong, b.toLong) }
        .count { case (a, b) => a <= hi && b >= lo }

    // predicate on Y only: x-clustered files all span full y-range →
    // every file touched; z-ordered cells bound y → most files skipped
    val zTouchY = touched(zOut, "y", 0, 255)
    val xTouchY = touched(xOut, "y", 0, 255)
    assert(xTouchY == 16, s"1-D layout should touch all files on y, got $xTouchY")
    assert(zTouchY <= 8, s"z-order should skip most files on y, got $zTouchY")
    // and the z layout still prunes on X too (both dims bounded)
    assert(touched(zOut, "x", 0, 255) <= 8)
    // rows survive
    assert(spark.read.parquet(zOut).count() == 20000)
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
