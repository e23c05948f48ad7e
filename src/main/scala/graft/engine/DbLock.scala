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
  *  - cross-process, LOCAL directory: an exclusive flock on
  *    `<dir>/.graft.lock`, acquired when the JVM hold-count goes 0→1
  *    and released at 1→0 — the reference's own mechanism, held per
  *    mutation instead of per open so independent processes can still
  *    alternate;
  *  - cross-process, REMOTE (Hadoop-scheme) directory: flock does not
  *    exist there, so the exclusion primitive is the one HDFS-like
  *    stores DO guarantee — atomic `create(path, overwrite=false)` on
  *    a lease file `<dir>/.graft.lock.lease` (round-17 verdict task
  *    4). The lease body carries an owner id; while held, a daemon
  *    heartbeat refreshes its modification time every
  *    `graft.lock.stale.ms`/3 (default 60 s / 3 = 20 s). TAKEOVER
  *    RULE, documented and deliberate: a contender that finds the
  *    lease older than `graft.lock.stale.ms` deletes it and retries —
  *    the owner is presumed dead (a live owner's heartbeat is 3×
  *    faster than the threshold; only a process paused longer than
  *    2/3 of the stale window can be wrongly usurped, the standard
  *    lease trade-off). Contention past `graft.lock.timeout.ms` is a
  *    LOUD [[EngineException]] naming the lease file, never a silent
  *    race.
  *
  * Instantiable for tests: each [[DbLock]] instance has its OWN
  * in-JVM lock table, so two instances over one remote directory
  * behave like two separate processes — only the storage-level lease
  * excludes them. Production code shares [[DbLock.shared]].
  */
private[engine] final class DbLock {

  private final class Entry {
    val monitor = new java.util.concurrent.locks.ReentrantLock()
    var flock: FileLock = _
    var channel: FileChannel = _
    var lease: org.apache.hadoop.fs.Path = _
    var leaseFs: org.apache.hadoop.fs.FileSystem = _
    var heartbeat: java.util.concurrent.ScheduledFuture[_] = _
    var holds: Int = 0
  }

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def timeoutMs: Long =
    java.lang.Long.getLong("graft.lock.timeout.ms", 10000L)

  private def staleMs: Long =
    java.lang.Long.getLong("graft.lock.stale.ms", 60000L)

  /** `key` scopes the JVM-level lock when `dir` is absent (a
    * non-local database location): pass the location URI so two
    * DIFFERENT remote databases don't serialize against each other.
    * `remote` is the database directory on its Hadoop FileSystem for
    * non-local locations — when present, the storage-level lease
    * above is taken alongside the JVM lock, restoring cross-process
    * exclusion where flock can't reach. */
  def withWriter[A](dir: Option[java.io.File], key: String = "<memory>",
      remote: Option[(org.apache.hadoop.conf.Configuration, org.apache.hadoop.fs.Path)] = None)
      (f: => A): A = {
    val canon = dir.map(_.getCanonicalPath).getOrElse(key)
    val e = entries.computeIfAbsent(canon, _ => new Entry)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    if (!e.monitor.tryLock(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new EngineException(
        s"concurrent mutation on $canon: another writer in this process " +
          s"held the lock past ${timeoutMs} ms")
    try {
      if (e.holds == 0) {
        dir.filter(_.isDirectory) match {
          case Some(d) => acquireFlock(e, d, canon, deadline)
          case None => remote.foreach { case (conf, rdir) =>
            acquireLease(e, conf, rdir, deadline)
          }
        }
      }
      e.holds += 1
      try f
      finally {
        e.holds -= 1
        if (e.holds == 0) {
          if (e.flock != null) {
            try e.flock.release() finally e.channel.close()
            e.flock = null
            e.channel = null
          }
          if (e.lease != null) {
            if (e.heartbeat != null) { e.heartbeat.cancel(false); e.heartbeat = null }
            try e.leaseFs.delete(e.lease, false)
            catch { case _: Exception => () } // stale takeover reclaims it
            e.lease = null
            e.leaseFs = null
          }
        }
      }
    } finally e.monitor.unlock()
  }

  private def acquireFlock(e: Entry, d: java.io.File, canon: String, deadline: Long): Unit = {
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

  /** Lease-file exclusion on a Hadoop FileSystem: atomic
    * create-no-overwrite to acquire, mtime heartbeat while held,
    * stale-age takeover (see class doc for the rule). */
  private def acquireLease(e: Entry,
      conf: org.apache.hadoop.conf.Configuration,
      rdir: org.apache.hadoop.fs.Path, deadline: Long): Unit = {
    val fs = rdir.getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(rdir, DbLock.LeaseName)
    val owner = s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/" +
      s"${System.identityHashCode(this)}"
    var acquired = false
    while (!acquired) {
      val out =
        try Some(fs.create(lease, false)) // THE atomic primitive HDFS guarantees
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
          case _: java.nio.file.FileAlreadyExistsException => None
          case e: java.io.IOException
            if e.getMessage != null && e.getMessage.contains("already exists") => None
        }
      out match {
        case Some(o) =>
          try o.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally o.close()
          acquired = true
        case None =>
          // Held by someone. Dead-owner takeover: older than staleMs
          // (a live owner heartbeats at staleMs/3) → reclaim.
          val age =
            try System.currentTimeMillis() - fs.getFileStatus(lease).getModificationTime
            catch { case _: java.io.FileNotFoundException => -1L } // released just now → retry
          if (age > staleMs) {
            try { fs.delete(lease, false); () } catch { case _: Exception => () }
          } else if (System.nanoTime() > deadline) {
            throw new EngineException(
              s"concurrent mutation on $rdir: another process holds $lease " +
                s"past ${timeoutMs} ms (lease age ${math.max(age, 0)} ms, " +
                s"stale threshold ${staleMs} ms) — single-writer discipline " +
                "refused the write")
          } else Thread.sleep(50)
      }
    }
    e.lease = lease
    e.leaseFs = fs
    e.heartbeat = DbLock.heartbeats.scheduleAtFixedRate(
      () => try { fs.setTimes(lease, System.currentTimeMillis(), -1); () }
            catch { case _: Exception => () },
      staleMs / 3, staleMs / 3, java.util.concurrent.TimeUnit.MILLISECONDS)
  }
}

private[engine] object DbLock {
  /** Process-wide instance every production Engine shares — one JVM,
    * one lock table, exactly the old object-DbLock semantics. */
  val shared = new DbLock

  /** Lease-file name inside a remote database directory (dot-prefixed:
    * hidden from Spark listings like every control file). */
  val LeaseName: String = ".graft.lock.lease"

  private[engine] val heartbeats: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-lease-heartbeat")
      t.setDaemon(true)
      t
    })
}
