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
      if (Files.exists(p)) {
        val st = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        try st.forEach(q => Files.deleteIfExists(q)) finally st.close()
      }
    }
  }

  private val locks = new ConcurrentHashMap[String, Object]()

  /** Get-or-build an artifact under `key` (include the sfDir in the key —
    * artifacts are per-dataset).
    *
    * RE-ENTRANT by design (round-13): cached builders nest — a parity
    * artifact's builder calls the index builder — and a nested
    * `computeIfAbsent` on one ConcurrentHashMap throws
    * IllegalStateException("Recursive update") whenever the two keys
    * land in the same bin (a hash-collision landmine that EntrySpec
    * finally stepped on). The first round-13 fix was a racy
    * check-then-`putIfAbsent`, but several builders carry GLOBAL side
    * effects (named streaming queries, catalog DROP/CREATE) where a
    * double-build is not benign — so builds serialize on a PER-KEY
    * monitor instead: exactly-once per key, while nested builds for
    * DIFFERENT keys take different monitors and never touch one map bin
    * mid-update (builder dependencies form a DAG, so no lock cycles).
    */
  def getOrCreate[T <: AnyRef](key: String)(build: => T): T = {
    val hit = cache.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = cache.get(key)
      if (again != null) again.asInstanceOf[T]
      else {
        val built = build
        cache.put(key, built)
        built
      }
    }
  }

  /** A fresh temp directory that is removed on JVM exit. */
  def newTempDir(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    tempDirs.add(dir)
    dir.toString
  }

  /** HARDLINK a directory tree (fallback: plain copy when the
    * filesystem refuses links, e.g. cross-device) — the cheap way to
    * hand a MUTATING consumer its own view of a cached base artifact
    * (round-18; the gate-append bench row byte-copied its base index
    * per call). Safe for the engine's index trees because their
    * protocol never modifies a data file in place: appends stage NEW
    * epoch dirs + a new marker, compacts write a NEW tree and swap
    * dirs — a linked file's bytes are immutable for its lifetime.
    */
  def linkTree(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    // Files.walk streams hold directory handles until closed — and this
    // runs once per bench-row invocation, so an unclosed stream leaks a
    // handle per call (advisor, r18)
    val st = Files.walk(s)
    try st.forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else
        try Files.createLink(t, p)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(p, t)
        }
    } finally st.close()
  }
}
