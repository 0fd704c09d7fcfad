package graft.core

import java.nio.file.{Files, Path}
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** Per-JVM cache for session-scoped materialized artifacts — built indexes,
  * fitted quantizer models, normalized streaming copies. A real deployment
  * separates BUILD (offline: fit the quantizer, write the partitioned index)
  * from SERVE (probe the written index); within one driver session this cache
  * is that separation: the first request builds and every later request only
  * probes. Round-3 measurements motivated it — `ivf_topk` was re-fitting
  * MLlib k-means (~4 s) on every invocation, and the streaming gate rewrote
  * the events table into a fresh never-deleted temp dir per run
  * (VERDICT.md round 3, "What's wrong" #3/#4).
  *
  * Temp directories handed out by [[newTempDir]] are deleted recursively on
  * JVM exit, so repeated Verify/Bench runs don't leak disk.
  */
object SessionCache {
  private val cache = new ConcurrentHashMap[String, AnyRef]()
  private val tempDirs = new ConcurrentLinkedQueue[Path]()

  sys.addShutdownHook {
    tempDirs.forEach { p =>
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => Files.deleteIfExists(q))
    }
  }

  /** Get-or-build an artifact under `key` (include the sfDir in the key —
    * artifacts are per-dataset). `build` runs at most once per JVM per key.
    */
  def getOrCreate[T <: AnyRef](key: String)(build: => T): T =
    cache.computeIfAbsent(key, _ => build).asInstanceOf[T]

  /** A fresh temp directory that is removed on JVM exit. */
  def newTempDir(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    tempDirs.add(dir)
    dir.toString
  }
}
