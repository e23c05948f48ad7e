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
