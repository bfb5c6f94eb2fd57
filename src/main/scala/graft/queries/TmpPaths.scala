package graft.queries

/** Per-JVM temp roots for persisted index/lake artifacts built by
  * queries. The caches that guard these builds are session-scoped, so
  * a path keyed only by the fixture dir lets two concurrent JVMs
  * sweeping the same fixture race each other's build/append/compact
  * (ParquetMerge's two-rename swap leaves the target briefly absent —
  * spurious probe failures, cross-contamination). The PID makes the
  * artifact private to the JVM whose cache guards it.
  */
private[queries] object TmpPaths {

  private val pid = ProcessHandle.current().pid()

  def perJvm(prefix: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/${prefix}_$pid/" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
}
