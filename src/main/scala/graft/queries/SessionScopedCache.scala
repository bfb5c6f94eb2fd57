package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Memo for expensive per-(session, corpus) shared artifacts (the
  * star schema, dedup cluster labels, basket pair counts — the
  * load-once/query-many warehouse contract).
  *
  * A bare TrieMap keyed by (SparkSession, dir) retains stopped
  * sessions' checkpointed frames for process lifetime (round-3
  * ADVICE): long-lived JVMs hosting many short-lived sessions — a
  * notebook server, a test suite — would leak every session's
  * artifacts. Each session therefore registers ONE listener whose
  * applicationEnd evicts all of that session's entries; the
  * checkpoint blocks themselves are then GC-reclaimed with the
  * frames.
  *
  * Staleness (round-4 ADVICE): each entry stores a fingerprint of the
  * dir's file tree (paths, sizes, mtimes) taken at build time; a
  * lookup whose current fingerprint differs rebuilds instead of
  * serving the stale artifact. The walk is a few dozen stat calls on
  * a corpus dir — noise next to any query it fronts. [[invalidate]]
  * remains for callers that KNOW they changed data out from under a
  * running build.
  */
final class SessionScopedCache[V] {
  private val entries = TrieMap.empty[(SparkSession, String), (Long, V)]
  private val hooked = TrieMap.empty[SparkSession, Unit]
  // Per-key build guard (round-5 ADVICE): the fingerprint check made
  // the miss path a non-atomic get/build/put, so two concurrent
  // callers could both run an expensive star/corpus build. Builds for
  // a given (session, dir) now serialize on this lock; distinct keys
  // still build concurrently.
  private val buildLocks = TrieMap.empty[(SparkSession, String), Object]

  private def fingerprint(dir: String): Long = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dir)
    if (!Files.exists(root)) 0L
    else {
      val stream = Files.walk(root)
      try {
        var h = 1125899906842597L
        stream.sorted().forEach { p =>
          val f = p.toFile
          h = h * 31 + p.toString.hashCode
          h = h * 31 + f.length()
          h = h * 31 + f.lastModified()
        }
        h
      } finally stream.close()
    }
  }

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V = {
    hooked.getOrElseUpdate(s, {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          entries.filterInPlace { case ((sess, _), _) => sess ne s }
          buildLocks.filterInPlace { case ((sess, _), _) => sess ne s }
          hooked.remove(s)
          ()
        }
      })
    })
    val fp = fingerprint(key)
    entries.get((s, key)) match {
      case Some((cachedFp, v)) if cachedFp == fp => v
      case _ =>
        val lock = buildLocks.getOrElseUpdate((s, key), new Object)
        lock.synchronized {
          // Re-check under the lock (and re-fingerprint: the dir may
          // have changed while we waited on another caller's build).
          val fp2 = fingerprint(key)
          entries.get((s, key)) match {
            case Some((cachedFp, v)) if cachedFp == fp2 => v
            case _ =>
              val v = build
              entries.put((s, key), (fp2, v))
              v
          }
        }
    }
  }

  def invalidate(s: SparkSession, key: String): Unit = {
    entries.remove((s, key))
    buildLocks.remove((s, key))
    ()
  }

  private[queries] def size: Int = entries.size
}
