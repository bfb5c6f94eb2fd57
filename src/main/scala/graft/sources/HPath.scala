package graft.sources

import org.apache.spark.sql.SparkSession

/** Hadoop-path helpers shared by the persisted-index stores. Path
  * identity in this codebase is a STRING comparison unless it goes
  * through [[qualified]] — trailing slashes, relative segments, and
  * scheme defaults all alias the same directory, which is exactly how
  * a compact-into-itself guard gets bypassed (r12 ADVICE).
  */
object HPath {

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Fully-qualified canonical form (scheme + authority + absolute
    * path) — the comparison key for "are these the same directory".
    */
  def qualified(spark: SparkSession, path: String): org.apache.hadoop.fs.Path = {
    val (fs, p) = hfs(spark, path)
    fs.makeQualified(p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = hfs(spark, path)
    fs.exists(p)
  }

  /** Recursive delete; absent path is a no-op. */
  def deleteIfExists(spark: SparkSession, path: String): Unit = {
    val (fs, p) = hfs(spark, path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
