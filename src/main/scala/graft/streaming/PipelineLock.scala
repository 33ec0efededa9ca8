package graft.streaming

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Cross-process mutual exclusion for pipeline maintenance — the
  * reference's `FileLock` around generate/ingest/compact/reduce
  * (reference pipeline/settings.py:37-40, taken by every flow in
  * workflow.py), T4 beyond one driver's by-construction serialization:
  * two pipeline INVOCATIONS (same or different JVMs) sharing a workDir
  * must never interleave a compaction with a drain or double-run a
  * generation cycle.
  *
  * Two layers, because OS file locks are per-process:
  *  - a JVM-wide [[java.util.concurrent.locks.ReentrantLock]] striped by
  *    canonical lock-file path serializes threads WITHIN a process
  *    (`FileChannel.lock` throws OverlappingFileLockException instead of
  *    blocking for same-process contention);
  *  - `FileChannel.lock` (blocking, OS-advisory) serializes ACROSS
  *    processes; the probe `main` below exists so a test can prove that
  *    from a genuinely separate JVM.
  *
  * Like the reference's FileLock this is a local/NFS-filesystem
  * primitive; an object-store deployment swaps in a lease service — the
  * call sites ([[PipelineMain]]) don't change. */
object PipelineLock {

  private val inProcess =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()

  private def canonical(lockFile: String): String =
    Paths.get(lockFile).toAbsolutePath.normalize.toString

  /** Run `body` holding both the in-process stripe and the OS file lock;
    * blocks until both are available. Reentrant: a nested withLock on
    * the same lock file from the same thread runs `body` under the
    * OUTER invocation's holds — the stripe's ReentrantLock is reentrant,
    * and the OS lock is skipped when this thread already holds it
    * (`FileChannel.lock` on a fresh channel would otherwise throw
    * OverlappingFileLockException, since the JVM already owns the lock —
    * round-3 advice). */
  def withLock[T](lockFile: String)(body: => T): T = {
    val key = canonical(lockFile)
    val local = inProcess.computeIfAbsent(key,
      _ => new java.util.concurrent.locks.ReentrantLock())
    local.lock()
    try {
      if (local.getHoldCount > 1) body // reentry: outer frame holds the OS lock
      else {
        val p = Paths.get(key)
        if (p.getParent != null) Files.createDirectories(p.getParent)
        val ch = FileChannel.open(p, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
        try {
          val flock = ch.lock() // blocks on another PROCESS's hold
          try body finally flock.release()
        } finally ch.close()
      }
    } finally local.unlock()
  }

  /** Non-blocking probe: did this process acquire the lock just now?
    * (Releases immediately — diagnostic only.) */
  def tryProbe(lockFile: String): Boolean = {
    val p = Paths.get(canonical(lockFile))
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val ch = FileChannel.open(p, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val l = ch.tryLock()
      if (l == null) false else { l.release(); true }
    } finally ch.close()
  }

  /** `probe <lockFile>` — prints ACQUIRED or BUSY and exits; spawned as
    * a separate JVM by the mutual-exclusion test (JDK classes only, so
    * the child needs no Spark runtime). */
  def main(args: Array[String]): Unit = {
    require(args.length == 2 && args(0) == "probe", "usage: probe <lockFile>")
    println(if (tryProbe(args(1))) "ACQUIRED" else "BUSY")
  }
}
