package graft.engine

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.file.StandardOpenOption.{CREATE, WRITE}

/** Single-writer discipline for database mutations.
  *
  * The reference gets this from its storage engine: opening a Sled
  * database takes an exclusive flock on the directory for the
  * process lifetime (database/mod.rs:72-92), so UNIQUE and
  * AUTO_INCREMENT validation can assume no concurrent writer. This
  * engine opens nothing exclusively — two Engine instances (or two
  * JVMs) over one directory could interleave validate→write and race
  * the constraint checks. [[withWriter]] restores the guarantee at
  * MUTATION scope, the granularity that fits a session-shared Spark
  * engine:
  *
  *  - in-process: a per-directory ReentrantLock serializes writers in
  *    the same JVM (reentrant, so nested mutation paths don't
  *    self-deadlock);
  *  - cross-process: an exclusive flock on `<dir>/.graft.lock`,
  *    acquired when the JVM hold-count goes 0→1 and released at 1→0
  *    — the reference's own mechanism, held per mutation instead of
  *    per open so independent processes can still alternate;
  *  - contention past the deadline is a LOUD [[EngineException]]
  *    naming the lock file, never a silent race.
  *
  * Databases whose location is not a local filesystem path (e.g. a
  * cluster URI) get the JVM-level lock only — cross-process locking
  * there is the storage layer's job (object stores have no flock).
  */
private[engine] object DbLock {

  private final class Entry {
    val monitor = new java.util.concurrent.locks.ReentrantLock()
    var flock: FileLock = _
    var channel: FileChannel = _
    var holds: Int = 0
  }

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def timeoutMs: Long =
    java.lang.Long.getLong("graft.lock.timeout.ms", 10000L)

  /** `key` scopes the JVM-level lock when `dir` is absent (a
    * non-local database location): pass the location URI so two
    * DIFFERENT remote databases don't serialize against each other —
    * before round 17 every non-local database shared one "<memory>"
    * lock entry, an over-coarse (safe but needless) bottleneck once
    * hdfs:// locations became first-class. */
  def withWriter[A](dir: Option[java.io.File], key: String = "<memory>")(f: => A): A = {
    val canon = dir.map(_.getCanonicalPath).getOrElse(key)
    val e = entries.computeIfAbsent(canon, _ => new Entry)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    if (!e.monitor.tryLock(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new EngineException(
        s"concurrent mutation on $canon: another writer in this process " +
          s"held the lock past ${timeoutMs} ms")
    try {
      if (e.holds == 0) dir.filter(_.isDirectory).foreach { d =>
        val lockFile = new java.io.File(d, ".graft.lock")
        val ch = FileChannel.open(lockFile.toPath, CREATE, WRITE)
        var fl: FileLock = null
        try {
          while (fl == null) {
            fl =
              try ch.tryLock()
              catch { case _: OverlappingFileLockException => null }
            if (fl == null) {
              if (System.nanoTime() > deadline) {
                throw new EngineException(
                  s"concurrent mutation on $canon: another process holds " +
                    s"$lockFile past ${timeoutMs} ms — single-writer " +
                    "discipline (reference database/mod.rs flock) refused the write")
              }
              Thread.sleep(20)
            }
          }
        } catch { case t: Throwable => ch.close(); throw t }
        e.channel = ch
        e.flock = fl
      }
      e.holds += 1
      try f
      finally {
        e.holds -= 1
        if (e.holds == 0 && e.flock != null) {
          try e.flock.release() finally e.channel.close()
          e.flock = null
          e.channel = null
        }
      }
    } finally e.monitor.unlock()
  }
}
