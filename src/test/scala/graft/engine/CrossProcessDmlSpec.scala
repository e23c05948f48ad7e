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

  // ---- Cross-process DDL visibility (round-18 verdict task 2) ----
  // The epoch probe used to merge ONLY the counter: another process's
  // CREATE UNIQUE INDEX / ALTER TABLE was invisible until remount, so
  // this session kept validating against the stale constraint set and
  // writing through the stale shape. Now an epoch mismatch adopts the
  // FULL persisted record (columns + indexes) and re-points the
  // catalog schema when the shape changed.

  private def twoEngines(tag: String): (Engine, Engine, java.nio.file.Path) = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    // graftfs wraps RawLocalFileSystem — its rename IS atomic; the
    // staged ALTER rewrite only engages on allowlisted stores.
    spark.sparkContext.hadoopConfiguration
      .set("graft.fs.atomic.rename.schemes", "graftfs")
    val g1 = new Engine(spark)
    g1.execute(s"DROP DATABASE IF EXISTS ${tag}1")
    g1.execute(s"DROP DATABASE IF EXISTS ${tag}2")
    val local = java.nio.file.Files.createTempDirectory(tag)
    g1.execute(s"CREATE DATABASE ${tag}1 LOCATION 'graftfs://$local'")
    val g2 = new Engine(spark)
    g2.locks = new DbLock
    (g1, g2, local)
  }

  test("another process's CREATE UNIQUE INDEX is enforced by the next INSERT — no remount") {
    val (g1, g2, local) = twoEngines("xi")
    g1.execute("CREATE TABLE xi1.t (k INTEGER, v INTEGER)")
    g1.execute("INSERT INTO xi1.t VALUES (1, 10), (2, 20)")
    g2.execute(s"CREATE DATABASE xi2 LOCATION 'graftfs://$local'")
    g2.execute("CREATE UNIQUE INDEX uv ON xi2.t (v)")
    // g1's stale meta has no index; the epoch probe must adopt it and
    // reject the duplicate.
    val err = intercept[EngineException](g1.execute("INSERT INTO xi1.t VALUES (3, 10)"))
    assert(err.getMessage.toLowerCase.contains("unique"), err.getMessage)
    // Non-duplicates still insert.
    g1.execute("INSERT INTO xi1.t VALUES (3, 30)")
    assert(spark.sql("SELECT count(*) FROM xi1.t").head.getLong(0) == 3L)
    g2.execute("DROP DATABASE xi2"); g1.execute("DROP DATABASE xi1")
  }

  test("another process's ALTER ADD COLUMN: the next INSERT writes the NEW shape") {
    val (g1, g2, local) = twoEngines("xa")
    g1.execute("CREATE TABLE xa1.t (k INTEGER, v INTEGER)")
    g1.execute("INSERT INTO xa1.t VALUES (1, 10)")
    g2.execute(s"CREATE DATABASE xa2 LOCATION 'graftfs://$local'")
    g2.execute("ALTER TABLE xa2.t ADD COLUMN tag TEXT DEFAULT 'none'")
    // g1 writes through what must now be the three-column shape, with
    // the DEFAULT applied to the column its statement doesn't name.
    g1.execute("INSERT INTO xa1.t (k, v) VALUES (2, 20)")
    spark.catalog.refreshTable("xa1.t")
    val rows = spark.sql("SELECT k, v, tag FROM xa1.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(rows == Seq((1L, "none"), (2L, "none")),
      s"the insert must follow the externally-added column: $rows")
    g2.execute("DROP DATABASE xa2"); g1.execute("DROP DATABASE xa1")
  }

  test("DROP COLUMN IF EXISTS sees a column another process ADDED (no stale-snapshot no-op)") {
    val (g1, g2, local) = twoEngines("xd")
    g1.execute("CREATE TABLE xd1.t (k INTEGER, v INTEGER)")
    g1.execute("INSERT INTO xd1.t VALUES (1, 10)")
    g2.execute(s"CREATE DATABASE xd2 LOCATION 'graftfs://$local'")
    g2.execute("ALTER TABLE xd2.t ADD COLUMN extra INTEGER DEFAULT 7")
    // g1's in-memory meta has no `extra`; the old pre-lock fast path
    // silently no-opped here, leaving the column in place.
    g1.execute("ALTER TABLE xd1.t DROP COLUMN IF EXISTS extra")
    spark.catalog.refreshTable("xd1.t")
    assert(!spark.table("xd1.t").columns.map(_.toLowerCase).contains("extra"),
      "the externally-added column must actually be dropped")
    // And the drop round-trips to the persisted record: g2's next
    // mutation adopts the two-column shape back.
    g2.execute("INSERT INTO xd2.t (k, v) VALUES (2, 20)")
    spark.catalog.refreshTable("xd2.t")
    assert(spark.sql("SELECT count(*) FROM xd2.t").head.getLong(0) == 2L)
    g2.execute("DROP DATABASE xd2"); g1.execute("DROP DATABASE xd1")
  }

  test("reader freshness: snapshot semantics by default, @read_fresh epoch-probes the scan set") {
    val (g1, g2, local) = twoEngines("xr")
    g1.execute("CREATE TABLE xr1.t (k INTEGER, v INTEGER)")
    g1.execute("INSERT INTO xr1.t SELECT id, 0 FROM range(100)")
    g2.execute(s"CREATE DATABASE xr2 LOCATION 'graftfs://$local'")
    // g2 caches the pre-append listing.
    val Payload.Select(_, r0) = g2.execute("SELECT count(*) AS n FROM xr2.t"): @unchecked
    assert(r0.head.head == 100L)
    // Another process appends AFTER the cache.
    g1.execute("INSERT INTO xr1.t SELECT id + 100, 0 FROM range(100)")
    // DEFAULT: snapshot — the long-lived reader keeps its view (the
    // documented stance; a mutation or refreshTable would catch up).
    val Payload.Select(_, r1) = g2.execute("SELECT count(*) AS n FROM xr2.t"): @unchecked
    assert(r1.head.head == 100L,
      s"default reads are snapshot-semantics by design: ${r1.head}")
    // OPT-IN: the epoch probe sees the external mutation and refreshes.
    g2.execute("SET @read_fresh = true")
    val Payload.Select(_, r2) = g2.execute("SELECT count(*) AS n FROM xr2.t"): @unchecked
    assert(r2.head.head == 200L,
      s"@read_fresh must adopt the external append: ${r2.head}")
    g2.execute("DROP DATABASE xr2"); g1.execute("DROP DATABASE xr1")
  }
}
