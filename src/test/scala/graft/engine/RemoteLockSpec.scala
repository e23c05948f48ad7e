package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Cross-process writer exclusion on NON-local databases (round-17
  * verdict task 4).
  *
  * flock cannot reach an `hdfs://`-style location, so there the
  * exclusion primitive is a lease file taken with atomic
  * `FileSystem.create(path, overwrite=false)` — the one atomic
  * guarantee HDFS-like stores give — heartbeated by mtime while held,
  * with a documented stale-age takeover (see [[DbLock]]). Two
  * processes are simulated faithfully: two [[DbLock]] INSTANCES have
  * disjoint in-JVM lock tables, so nothing but the storage-level
  * lease stands between them — exactly a second JVM's view. */
class RemoteLockSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  private def conf = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    spark.sessionState.newHadoopConf()
  }

  private def remoteDir(): org.apache.hadoop.fs.Path = {
    val local = java.nio.file.Files.createTempDirectory("rlock")
    new org.apache.hadoop.fs.Path(s"graftfs://$local")
  }

  private def withTimeout[A](ms: Long)(f: => A): A = {
    val prev = System.setProperty("graft.lock.timeout.ms", ms.toString)
    try f
    finally if (prev == null) System.clearProperty("graft.lock.timeout.ms")
    else System.setProperty("graft.lock.timeout.ms", prev)
  }

  test("a second 'process' is excluded by the lease and fails LOUDLY past the deadline") {
    val p1 = new DbLock // process 1's lock table
    val p2 = new DbLock // process 2's — disjoint JVM state
    val rdir = remoteDir()
    val key = rdir.toString
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      p1.withWriter(None, key, Some((conf, rdir))) {
        held.countDown()
        release.await()
      })
    holder.start()
    assert(held.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // The lease file is on the store, owner recorded.
    val fs = rdir.getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(rdir, DbLock.LeaseName)
    assert(fs.exists(lease), "holder must have created the lease")
    try {
      val err = withTimeout(400)(intercept[EngineException](
        p2.withWriter(None, key, Some((conf, rdir))) { fail("must not acquire") }))
      assert(err.getMessage.contains(DbLock.LeaseName),
        s"the loud timeout must name the lease: ${err.getMessage}")
    } finally { release.countDown(); holder.join() }
    // Released: the lease is gone and process 2 proceeds immediately.
    assert(!fs.exists(lease), "release must delete the lease")
    var ran = false
    p2.withWriter(None, key, Some((conf, rdir))) { ran = true }
    assert(ran)
  }

  test("a dead owner's stale lease is taken over after the documented threshold") {
    val p2 = new DbLock
    val rdir = remoteDir()
    val fs = rdir.getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(rdir, DbLock.LeaseName)
    // A crashed process left its lease behind; age it past staleMs.
    val out = fs.create(lease, false)
    out.write("dead-owner".getBytes); out.close()
    fs.setTimes(lease, System.currentTimeMillis() - 3600 * 1000L, -1)
    val prevStale = System.setProperty("graft.lock.stale.ms", "500")
    try {
      var ran = false
      withTimeout(5000)(p2.withWriter(None, rdir.toString, Some((conf, rdir))) { ran = true })
      assert(ran, "a lease older than graft.lock.stale.ms must be reclaimed")
    } finally {
      if (prevStale == null) System.clearProperty("graft.lock.stale.ms")
      else System.setProperty("graft.lock.stale.ms", prevStale)
    }
    assert(!fs.exists(lease))
  }

  // ---- Round-19 lease hardening (round-18 advice + verdict task 4) ----

  test("no-op setTimes store: the probed heartbeat keeps a live owner fresh — never usurped") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.nooptimefs.impl", classOf[NoopTimesFs].getName)
    val local = java.nio.file.Files.createTempDirectory("nooplock")
    val rdir = new org.apache.hadoop.fs.Path(s"nooptimefs://$local")
    val p1 = new DbLock
    val p2 = new DbLock
    val prevStale = System.setProperty("graft.lock.stale.ms", "600")
    try {
      val held = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() =>
        p1.withWriter(None, rdir.toString, Some((conf, rdir))) {
          held.countDown()
          release.await()
        })
      holder.start()
      assert(held.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // Let several heartbeat periods pass (600/3 = 200 ms): with the
      // unprobed mtime heartbeat the lease would now look stale (the
      // store ignores setTimes) and the contender would usurp a LIVE
      // owner; the content-rewrite fallback must keep it fresh.
      Thread.sleep(900)
      try {
        val err = withTimeout(400)(intercept[EngineException](
          p2.withWriter(None, rdir.toString, Some((conf, rdir))) {
            fail("a live owner's lease must never look stale")
          }))
        assert(err.getMessage.contains(DbLock.LeaseName), err.getMessage)
      } finally { release.countDown(); holder.join() }
      // After the release the contender proceeds normally.
      var ran = false
      p2.withWriter(None, rdir.toString, Some((conf, rdir))) { ran = true }
      assert(ran)
    } finally {
      if (prevStale == null) System.clearProperty("graft.lock.stale.ms")
      else System.setProperty("graft.lock.stale.ms", prevStale)
    }
  }

  test("a usurped holder's release does NOT delete the new owner's lease") {
    val p1 = new DbLock
    val rdir = remoteDir()
    val fs = rdir.getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(rdir, DbLock.LeaseName)
    val held = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      p1.withWriter(None, rdir.toString, Some((conf, rdir))) {
        held.countDown()
        release.await()
      })
    holder.start()
    assert(held.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // Simulate a legitimate takeover while the holder is paused: the
    // lease now belongs to someone else.
    val o = fs.create(lease, true)
    o.write("new-owner-process".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    o.close()
    release.countDown(); holder.join()
    // The conditional release must have left the foreign lease alone.
    assert(fs.exists(lease),
      "release must be ownership-conditional — the new owner still holds this")
    val in = fs.open(lease)
    val body = try {
      val b = new Array[Byte](64); val n = in.read(b); new String(b, 0, n)
    } finally in.close()
    assert(body == "new-owner-process", s"foreign lease must be untouched: $body")
    fs.delete(lease, false)
  }

  test("a resolution failure on a REMOTE location fails the mutation loudly — no silent lease drop") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.fadefs.impl", classOf[FadingTestFs].getName)
    val local = java.nio.file.Files.createTempDirectory("fade_db")
    // Warm the global FileSystem cache: the in-memory catalog resolves
    // schemes through ITS OWN conf snapshot, so the scheme must be
    // cache-reachable for CREATE DATABASE (exactly how a real
    // registered scheme behaves).
    new org.apache.hadoop.fs.Path(s"fadefs://$local").getFileSystem(conf)
    val g = new Engine(spark)
    g.execute("DROP DATABASE IF EXISTS fadedb")
    g.execute(s"CREATE DATABASE fadedb LOCATION 'fadefs://$local'")
    g.execute("CREATE TABLE fadedb.t (k INTEGER)")
    g.execute("INSERT INTO fadedb.t VALUES (1)")
    // The store becomes unreachable (transient outage): cache bypassed
    // and the scheme unresolvable — the mutation must FAIL naming the
    // location. The old catch-all downgraded it to a JVM-only lock and
    // raced other processes' writers.
    hc.set("fs.fadefs.impl.disable.cache", "true")
    hc.unset("fs.fadefs.impl")
    try {
      val err = intercept[EngineException](g.execute("INSERT INTO fadedb.t VALUES (2)"))
      assert(err.getMessage.contains("fadedb") && err.getMessage.contains("lease"),
        s"the refusal must name the database and the lease: ${err.getMessage}")
    } finally {
      hc.set("fs.fadefs.impl", classOf[FadingTestFs].getName)
      hc.unset("fs.fadefs.impl.disable.cache")
    }
    // Store reachable again: the same statement succeeds.
    g.execute("INSERT INTO fadedb.t VALUES (2)")
    assert(spark.sql("SELECT count(*) FROM fadedb.t").head.getLong(0) == 2L)
    g.execute("DROP DATABASE fadedb")
  }

  test("Engine mutations on a graftfs:// database take and release the lease") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val g = new Engine(spark)
    g.execute("DROP DATABASE IF EXISTS rlk")
    val local = java.nio.file.Files.createTempDirectory("rlk_db")
    g.execute(s"CREATE DATABASE rlk LOCATION 'graftfs://$local'")
    g.execute("CREATE TABLE rlk.t (k INTEGER, v INTEGER)")
    g.execute("INSERT INTO rlk.t SELECT id, id FROM range(100)")
    // Mutation done → lease released (not squatted for the session).
    assert(!java.nio.file.Files.exists(local.resolve(DbLock.LeaseName)),
      "the lease must be held per-mutation, not per-session")
    // A foreign lease (second process mid-mutation) blocks the write
    // loudly — through the full Engine path this time.
    val fs = new org.apache.hadoop.fs.Path(s"graftfs://$local").getFileSystem(conf)
    val lease = new org.apache.hadoop.fs.Path(s"graftfs://$local/${DbLock.LeaseName}")
    val o = fs.create(lease, false); o.write("other-process".getBytes); o.close()
    // A fresh DbLock instance = this engine's JVM table doesn't know
    // the holder, exactly like a second JVM.
    g.locks = new DbLock
    val prev = System.setProperty("graft.lock.timeout.ms", "400")
    try {
      val err = intercept[EngineException](
        g.execute("INSERT INTO rlk.t VALUES (999, 999)"))
      assert(err.getMessage.contains(DbLock.LeaseName), err.getMessage)
    } finally {
      if (prev == null) System.clearProperty("graft.lock.timeout.ms")
      else System.setProperty("graft.lock.timeout.ms", prev)
      fs.delete(lease, false)
      g.locks = DbLock.shared
    }
    // Foreign lease gone: the same statement succeeds.
    g.execute("INSERT INTO rlk.t VALUES (999, 999)")
    assert(spark.sql("SELECT count(*) FROM rlk.t").head.getLong(0) == 101L)
    g.execute("DROP DATABASE rlk")
  }
}
