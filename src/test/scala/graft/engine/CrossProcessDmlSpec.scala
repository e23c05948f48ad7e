package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** ALTERNATING cross-process writers on one shared table (the
  * completion of round-17 verdict tasks 3+4).
  *
  * The reference sidesteps this scenario: its flock is held for the
  * whole process lifetime (database/mod.rs:72-92), so a second
  * process simply cannot write until the first exits. This engine's
  * per-mutation locks are strictly more concurrent — two processes
  * CAN alternate — which is only sound if each mutation starts from
  * fresh metadata: the `.graft_meta` control file carries a mutation
  * epoch, and every locked mutation compares it with the session's
  * copy ([[Engine]]'s syncExternalMeta). On a mismatch it merges the
  * AUTO_INCREMENT counter (no re-issued ids) and refreshes Spark's
  * cached file listing (the UNIQUE anti-join must see the other
  * process's rows).
  *
  * Process #2 is simulated faithfully on shared storage: a second
  * Engine (fresh MetaStore) with its OWN DbLock instance (disjoint
  * JVM lock table) mounts the SAME graftfs:// directory under a
  * different catalog name — same bytes, same control files, no shared
  * session state beyond the storage. */
class CrossProcessDmlSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  test("alternating INSERTs from two engines: dense ids, UNIQUE enforced across processes") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val g1 = new Engine(spark)
    g1.execute("DROP DATABASE IF EXISTS xp1")
    g1.execute("DROP DATABASE IF EXISTS xp2")
    val local = java.nio.file.Files.createTempDirectory("xproc")
    g1.execute(s"CREATE DATABASE xp1 LOCATION 'graftfs://$local'")
    g1.execute("CREATE TABLE xp1.t (id INTEGER AUTO_INCREMENT, v INTEGER UNIQUE)")
    g1.execute("INSERT INTO xp1.t (v) VALUES (100)")

    // "Process 2": fresh MetaStore, disjoint lock table, same storage.
    val g2 = new Engine(spark)
    g2.locks = new DbLock
    g2.execute(s"CREATE DATABASE xp2 LOCATION 'graftfs://$local'")

    // Alternate writers; each mutation must continue the OTHER
    // process's counter, not its own stale snapshot.
    g2.execute("INSERT INTO xp2.t (v) VALUES (200)")
    g1.execute("INSERT INTO xp1.t (v) VALUES (300)")
    g2.execute("INSERT INTO xp2.t (v) VALUES (400)")
    g1.execute("INSERT INTO xp1.t (v) VALUES (500)")

    spark.catalog.refreshTable("xp1.t")
    val rows = spark.sql("SELECT id, v FROM xp1.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L),
      s"ids must stay dense across alternating processes: $rows")
    assert(rows.map(_._2).sorted == Seq(100L, 200L, 300L, 400L, 500L))

    // UNIQUE across processes: g2 must see the row g1 wrote AFTER
    // g2's mount (v=300) — without the epoch-triggered refresh its
    // cached listing would miss it and the anti-join would pass.
    val err = intercept[EngineException](
      g2.execute("INSERT INTO xp2.t (v) VALUES (300)"))
    assert(err.getMessage.toLowerCase.contains("unique"), err.getMessage)

    g2.execute("DROP DATABASE xp2")
    g1.execute("DROP DATABASE xp1")
  }

  test("a fresh process's UPDATE sees files another process appended (CoW discovery freshness)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val g1 = new Engine(spark)
    g1.execute("DROP DATABASE IF EXISTS xq1")
    g1.execute("DROP DATABASE IF EXISTS xq2")
    val local = java.nio.file.Files.createTempDirectory("xproc2")
    g1.execute(s"CREATE DATABASE xq1 LOCATION 'graftfs://$local'")
    g1.execute("CREATE TABLE xq1.t (k INTEGER, v INTEGER)")
    g1.execute("INSERT INTO xq1.t SELECT id, 0 FROM range(100)")

    val g2 = new Engine(spark)
    g2.locks = new DbLock
    g2.execute(s"CREATE DATABASE xq2 LOCATION 'graftfs://$local'")
    // force xq2's listing to cache the pre-append layout
    assert(spark.sql("SELECT count(*) FROM xq2.t").head.getLong(0) == 100L)

    // Process 1 appends more rows AFTER process 2 cached its listing.
    g1.execute("INSERT INTO xq1.t SELECT id + 100, 0 FROM range(100)")

    // Process 2's UPDATE must match rows in the appended files too.
    val Payload.Update(n) = g2.execute("UPDATE xq2.t SET v = 1 WHERE k >= 150"): @unchecked
    assert(n == 50L, s"the CoW discovery scan missed externally-appended files: matched $n")
    spark.catalog.refreshTable("xq1.t")
    assert(spark.sql("SELECT count(*) FROM xq1.t WHERE v = 1").head.getLong(0) == 50L)

    g2.execute("DROP DATABASE xq2")
    g1.execute("DROP DATABASE xq1")
  }
}
