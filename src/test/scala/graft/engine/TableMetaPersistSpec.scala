package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Constraint/schema metadata survives the process (round-17 verdict
  * task 3 — "What's missing" #1).
  *
  * The reference persists schema in the storage backend
  * (`insert_schema`/`fetch_schema`, src/database/base.rs:7-34; sled
  * keys `schema/{t}`), so a second process opening the same database
  * enforces the same constraints. This engine's MetaStore is
  * session-scoped, and before round 18 the remount paths
  * reconstructed LOSSY metadata: every column nullable, UNIQUE /
  * AUTO_INCREMENT / DEFAULT / indexes silently forgotten. Now every
  * metadata mutation writes a `.graft_meta` control file into the
  * table directory (through TableFs — any Hadoop scheme) and both
  * mount paths read it back.
  *
  * A fresh process is simulated faithfully: the table directory is
  * COPIED to a new location (same bytes a second process would see —
  * the shared in-memory catalog of one SparkSession cannot re-mount
  * the same path without dropping it, which deletes managed data) and
  * a brand-new Engine (fresh MetaStore) mounts the copy. */
class TableMetaPersistSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  private def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file._
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def buildConstrained(g: Engine, db: String, loc: String): Unit = {
    g.execute(s"DROP DATABASE IF EXISTS $db")
    g.execute(s"CREATE DATABASE $db LOCATION '$loc'")
    g.execute(s"""CREATE TABLE $db.t (
      id INTEGER AUTO_INCREMENT,
      name TEXT NOT NULL,
      code INTEGER UNIQUE,
      grade TEXT DEFAULT 'unrated')""")
    g.execute(s"INSERT INTO $db.t (name, code) VALUES ('a', 10)")
    g.execute(s"INSERT INTO $db.t (name, code) VALUES ('b', 20)")
    g.execute(s"CREATE INDEX t_code ON $db.t (code)")
  }

  private def assertConstraintsLive(g2: Engine, db2: String): Unit = {
    // UNIQUE survives the remount: a duplicate code is rejected.
    val dup = intercept[EngineException](
      g2.execute(s"INSERT INTO $db2.t (name, code) VALUES ('x', 10)"))
    assert(dup.getMessage.toLowerCase.contains("unique"), dup.getMessage)
    // NOT NULL survives.
    val nn = intercept[EngineException](
      g2.execute(s"INSERT INTO $db2.t (code) VALUES (30)"))
    assert(nn.getMessage.toLowerCase.contains("null"), nn.getMessage)
    // AUTO_INCREMENT continues from the persisted counter — no id
    // collision with the first process's rows — and DEFAULT applies.
    g2.execute(s"INSERT INTO $db2.t (name, code) VALUES ('c', 30)")
    val rows = spark.sql(s"SELECT id, name, code, grade FROM $db2.t ORDER BY id")
      .collect().map(_.toSeq).toSeq
    assert(rows.map(_.head) == Seq(1L, 2L, 3L), s"ids must stay dense across processes: $rows")
    assert(rows.forall(_(3) == "unrated"), s"DEFAULT must survive: $rows")
    // The index definition survives: EXPLAIN FILES names it and
    // EXPLAIN COMPACT plans an index-aware (range) layout, not the
    // unindexed round-robin.
    val Payload.Select(_, fileRows) =
      g2.execute(s"EXPLAIN FILES $db2.t"): @unchecked
    val idxRow = fileRows.collectFirst { case Seq("indexes", v) => v.toString }.get
    assert(idxRow.contains("t_code(code)"),
      s"EXPLAIN FILES must show the persisted index: $idxRow")
    val Payload.Select(_, planRows) =
      g2.execute(s"EXPLAIN COMPACT TABLE $db2.t"): @unchecked
    val plan = planRows.map(_.mkString(" ")).mkString("\n")
    assert(plan.contains("indexed column code"),
      s"the remounted engine must know the index:\n$plan")
  }

  test("a fresh Engine over a copied local database enforces the persisted constraints") {
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metap1")
    buildConstrained(g, "metap", loc1.toString)
    // The control file is where the design says it is.
    assert(java.nio.file.Files.exists(loc1.resolve("t").resolve(Engine.TableMetaName)),
      "every metadata mutation must leave the control file in the table dir")
    val loc2 = java.nio.file.Files.createTempDirectory("metap2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark) // fresh MetaStore — simulates process #2
    g2.execute("DROP DATABASE IF EXISTS metap_b")
    g2.execute(s"CREATE DATABASE metap_b LOCATION '$loc2'")
    assertConstraintsLive(g2, "metap_b")
    g.execute("DROP DATABASE metap"); g2.execute("DROP DATABASE metap_b")
  }

  test("same story on a graftfs:// (Hadoop-scheme) location") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metaf1")
    buildConstrained(g, "metaf", s"graftfs://$loc1")
    assert(java.nio.file.Files.exists(loc1.resolve("t").resolve(Engine.TableMetaName)),
      "the control file must be written through the table's own FileSystem")
    val loc2 = java.nio.file.Files.createTempDirectory("metaf2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark)
    g2.execute("DROP DATABASE IF EXISTS metaf_b")
    g2.execute(s"CREATE DATABASE metaf_b LOCATION 'graftfs://$loc2'")
    assertConstraintsLive(g2, "metaf_b")
    g.execute("DROP DATABASE metaf"); g2.execute("DROP DATABASE metaf_b")
  }

  test("a crashed append's DIRTY counter record recomputes from the data — ids never re-issued") {
    // The INSERT path stamps the control file dirty BEFORE the append
    // and clears it (with the advanced counter) after. Simulate the
    // crash in between: rows on disk up to id=3, persisted counter
    // rolled back to 1, dirty marker set — exactly what a death after
    // the write job leaves. The next mount must recompute the counter
    // from max(id), not hand out 1 again.
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metad1")
    g.execute("DROP DATABASE IF EXISTS metad")
    g.execute(s"CREATE DATABASE metad LOCATION '$loc1'")
    g.execute("CREATE TABLE metad.t (id INTEGER AUTO_INCREMENT, v INTEGER)")
    g.execute("INSERT INTO metad.t (v) VALUES (10)")
    g.execute("INSERT INTO metad.t (v) VALUES (20)")
    g.execute("INSERT INTO metad.t (v) VALUES (30)")
    val ctl = loc1.resolve("t").resolve(Engine.TableMetaName)
    val crashed = MetaJson.parse(new String(java.nio.file.Files.readAllBytes(ctl)))
      .copy(autoCounter = 1L, counterDirty = true)
    java.nio.file.Files.write(ctl, MetaJson.render(crashed).getBytes)
    // the nio rewrite invalidates Hadoop LocalFileSystem's checksum
    // sidecar — drop it (a real crash leaves a CONSISTENT pair; this
    // edit is the test's shortcut to the crashed content)
    java.nio.file.Files.deleteIfExists(
      loc1.resolve("t").resolve(s".${Engine.TableMetaName}.crc"))
    val loc2 = java.nio.file.Files.createTempDirectory("metad2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark)
    g2.execute("DROP DATABASE IF EXISTS metad_b")
    g2.execute(s"CREATE DATABASE metad_b LOCATION '$loc2'")
    g2.execute("INSERT INTO metad_b.t (v) VALUES (40)")
    val ids = spark.sql("SELECT id FROM metad_b.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L),
      s"dirty-counter recovery must continue from max(id)+1, got $ids")
    g.execute("DROP DATABASE metad"); g2.execute("DROP DATABASE metad_b")
  }

  // ---- Atomic control-file replace (round-18 verdict task 1) ----
  // persistMeta commits through TableFs.writeStringAtomic: write
  // `.graft_meta.tmp`, delete the old record, rename the temp over it.
  // The four crash points a death can leave on disk, each pinned below:
  // mid temp-write (target intact), between delete and rename (target
  // absent, COMPLETE temp present), torn target with temp intact
  // (non-atomic-store copy window / pre-round-19 in-place write), and
  // both unreadable (genuinely lost → LOUD, never silent constraint
  // loss).

  private def park(dir: java.nio.file.Path, fromName: String, toName: String): Unit = {
    import java.nio.file._
    Files.move(dir.resolve(fromName), dir.resolve(toName), StandardCopyOption.REPLACE_EXISTING)
    // nio edits bypass Hadoop LocalFileSystem's checksum layer — drop
    // the sidecars so the engine's read sees a consistent file.
    Files.deleteIfExists(dir.resolve(s".$fromName.crc"))
    Files.deleteIfExists(dir.resolve(s".$toName.crc"))
  }

  test("crash between the record's delete and the temp's rename: the temp is adopted on mount") {
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metat1")
    buildConstrained(g, "metat", loc1.toString)
    // Construct the torn-commit state: the new record fully written to
    // the temp name, the target already deleted, the rename never ran.
    park(loc1.resolve("t"), Engine.TableMetaName, Engine.TableMetaName + ".tmp")
    val loc2 = java.nio.file.Files.createTempDirectory("metat2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark)
    g2.execute("DROP DATABASE IF EXISTS metat_b")
    g2.execute(s"CREATE DATABASE metat_b LOCATION '$loc2'")
    assertConstraintsLive(g2, "metat_b")
    g.execute("DROP DATABASE metat"); g2.execute("DROP DATABASE metat_b")
  }

  test("torn target with the temp sibling intact: the temp recovers the record") {
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metau1")
    buildConstrained(g, "metau", loc1.toString)
    val tdir = loc1.resolve("t")
    // The complete record parks at the temp name; the target is a
    // truncated torn write (what a copy+delete "rename" store or a
    // pre-round-19 in-place overwrite leaves behind).
    import java.nio.file._
    Files.copy(tdir.resolve(Engine.TableMetaName),
      tdir.resolve(Engine.TableMetaName + ".tmp"), StandardCopyOption.REPLACE_EXISTING)
    Files.write(tdir.resolve(Engine.TableMetaName), "{\"version\": 1, \"auto".getBytes)
    Files.deleteIfExists(tdir.resolve(s".${Engine.TableMetaName}.crc"))
    Files.deleteIfExists(tdir.resolve(s".${Engine.TableMetaName}.tmp.crc"))
    val loc2 = java.nio.file.Files.createTempDirectory("metau2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark)
    g2.execute("DROP DATABASE IF EXISTS metau_b")
    g2.execute(s"CREATE DATABASE metau_b LOCATION '$loc2'")
    assertConstraintsLive(g2, "metau_b")
    g.execute("DROP DATABASE metau"); g2.execute("DROP DATABASE metau_b")
  }

  test("target AND temp unreadable: the mount fails LOUDLY, never silent constraint loss") {
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metav1")
    buildConstrained(g, "metav", loc1.toString)
    val tdir = loc1.resolve("t")
    import java.nio.file._
    Files.write(tdir.resolve(Engine.TableMetaName), "{\"version\": 1, \"auto".getBytes)
    Files.write(tdir.resolve(Engine.TableMetaName + ".tmp"), "not json either".getBytes)
    Files.deleteIfExists(tdir.resolve(s".${Engine.TableMetaName}.crc"))
    val loc2 = java.nio.file.Files.createTempDirectory("metav2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark)
    g2.execute("DROP DATABASE IF EXISTS metav_b")
    val err = intercept[EngineException](
      g2.execute(s"CREATE DATABASE metav_b LOCATION '$loc2'"))
    assert(err.getMessage.contains("corrupt table-metadata"), err.getMessage)
    g.execute("DROP DATABASE metav")
  }

  test("an injected write fault during persist leaves the PREVIOUS record fully usable") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakyfs.impl", classOf[FlakyGraftFs].getName)
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metaw1")
    buildConstrained(g, "metaw", s"flakyfs://$loc1")
    // Arm the outage: the NEXT create of the temp sibling throws — the
    // mutation must fail loudly with the old record untouched (the
    // in-place write this replaces corrupted the record right here).
    FlakyGraftFs.failCreateOn = Engine.TableMetaName + ".tmp"
    try intercept[Exception](g.execute("INSERT INTO metaw.t (name, code) VALUES ('z', 99)"))
    finally FlakyGraftFs.failCreateOn = null
    // The record on disk is the previous good one: a fresh process
    // mounts it and still enforces every constraint, ids stay dense.
    val loc2 = java.nio.file.Files.createTempDirectory("metaw2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark)
    g2.execute("DROP DATABASE IF EXISTS metaw_b")
    g2.execute(s"CREATE DATABASE metaw_b LOCATION '$loc2'")
    assertConstraintsLive(g2, "metaw_b")
    g.execute("DROP DATABASE metaw"); g2.execute("DROP DATABASE metaw_b")
  }

  test("a parked temp (torn predecessor commit) survives a crash mid-way through the NEXT commit") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakyfs.impl", classOf[FlakyGraftFs].getName)
    val g = new Engine(spark)
    val loc1 = java.nio.file.Files.createTempDirectory("metay1")
    buildConstrained(g, "metay", s"flakyfs://$loc1")
    // State: the predecessor commit died between its delete and its
    // rename — the record's ONLY copy is parked at the temp name.
    park(loc1.resolve("t"), Engine.TableMetaName, Engine.TableMetaName + ".tmp")
    // ...and the NEXT commit dies mid temp-write (create truncates the
    // temp the instant it opens, then the "process" dies). Without the
    // roll-forward at the head of writeStringAtomic this truncates the
    // parked sole copy in place: record lost, every future mount
    // bricked — the round-18 failure mode reborn one state deeper.
    FlakyGraftFs.truncCreateOn = Engine.TableMetaName + ".tmp"
    try intercept[Exception](
      g.execute("INSERT INTO metay.t (name, code) VALUES ('z', 99)"))
    finally FlakyGraftFs.truncCreateOn = null
    // The previous record must be back at the TARGET name (rolled
    // forward before the new temp was opened): a fresh process mounts
    // it and enforces every constraint.
    val loc2 = java.nio.file.Files.createTempDirectory("metay2")
    copyDir(loc1, loc2)
    val g2 = new Engine(spark)
    g2.execute("DROP DATABASE IF EXISTS metay_b")
    g2.execute(s"CREATE DATABASE metay_b LOCATION '$loc2'")
    assertConstraintsLive(g2, "metay_b")
    g.execute("DROP DATABASE metay"); g2.execute("DROP DATABASE metay_b")
  }

  test("a directory with NO control file still mounts (foreign parquet, lossy fallback)") {
    val g = new Engine(spark)
    val loc = java.nio.file.Files.createTempDirectory("metax")
    spark.range(5).selectExpr("cast(id AS int) AS k")
      .write.parquet(loc.resolve("plain").toString)
    // Spark's _SUCCESS marker and the parquet files are all that's
    // there — the mount must not demand a control file.
    g.execute("DROP DATABASE IF EXISTS metax")
    g.execute(s"CREATE DATABASE metax LOCATION '$loc'")
    assert(spark.sql("SELECT count(*) FROM metax.plain").head.getLong(0) == 5L)
    g.execute("DROP DATABASE metax")
  }
}
