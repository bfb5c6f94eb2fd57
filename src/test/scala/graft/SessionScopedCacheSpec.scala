package graft

import java.nio.file.Files

import graft.queries.SessionScopedCache

/** The per-(session, corpus) artifact memo must serve cached values
  * only while the dir's file tree is unchanged: round-4 ADVICE flagged
  * that entries never evicted within a live session, going stale if
  * the dir's data changed.
  */
class SessionScopedCacheSpec extends SparkSuite {

  test("changed dir contents re-build; unchanged dir serves the cached value") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cache_fp").toString
    Seq(1, 2, 3).toDF("x").write.mode("overwrite").parquet(s"$dir/t.parquet")

    val cache = new SessionScopedCache[Long]
    var builds = 0
    def load(): Long = cache.getOrElseUpdate(spark, dir) {
      builds += 1
      spark.read.parquet(s"$dir/t.parquet").count()
    }

    assert(load() == 3 && builds == 1)
    assert(load() == 3 && builds == 1, "unchanged dir must hit the cache")

    // rewrite with different data (parquet part files get fresh
    // names/sizes/mtimes, so the tree fingerprint moves)
    Seq(1, 2, 3, 4, 5).toDF("x").write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(load() == 5, "changed dir must re-read fresh results")
    assert(builds == 2)
    assert(load() == 5 && builds == 2, "new fingerprint is cached in turn")
  }
}
