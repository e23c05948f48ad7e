package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.functions.input_file_name
import org.scalatest.funsuite.AnyFunSuite

/** The COMPACT swap's crash window, closed (round-16 verdict task 3).
  *
  * compactCore writes a `.compact_swap_manifest` (staged files to
  * rename in, originals to delete) BEFORE the first swap rename and
  * removes it AFTER the last delete. A process crash inside that span
  * used to leave duplicate rows permanently; now the next
  * writer-lock-holding mutation replays the manifest: roll FORWARD
  * (all staged files present → delete the originals) or roll BACK
  * (some staged file never arrived → remove the partials). This spec
  * simulates both crash states by constructing exactly what a torn
  * swap leaves on disk — staged files renamed in, originals still
  * present, manifest in place — then issues a no-op mutation and
  * asserts the table repaired to exact row parity. The repair reads
  * ONLY the filesystem and the catalog (no Engine in-memory state),
  * so it works for whichever process touches the table next. */
class CompactSwapRepairSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS swp")
    val loc = java.nio.file.Files.createTempDirectory("swp").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE swp LOCATION '$loc'")
    e
  }

  private def tdir(tbl: String): java.nio.file.Path = {
    val uri = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some("swp"))).location
    java.nio.file.Paths.get(uri.getPath)
  }

  private def rowsOf(tbl: String): Seq[Seq[Any]] =
    spark.table(s"swp.$tbl").collect().map(_.toSeq).toSeq

  private def dataFileNames(tbl: String): Set[String] = {
    val s = java.nio.file.Files.list(tdir(tbl))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => !n.startsWith(".") && !n.startsWith("_")).toSet
    } finally s.close()
  }

  /** Build a fragmented table and construct the torn-swap state: a
    * staged (1-file) rewrite of the whole table, `renamedIn` of its
    * files moved into the table dir (simulating how far the renames
    * got before the crash), originals untouched, manifest present.
    * Returns (original rows sorted, original file names, staged names). */
  private def tornSwap(tbl: String, renamedInAll: Boolean): (Seq[Seq[Any]], Set[String], Seq[String]) = {
    g.execute(s"CREATE TABLE swp.$tbl (k INTEGER, v INTEGER)")
    for (i <- 0 until 4)
      g.execute(s"INSERT INTO swp.$tbl SELECT id + ${i * 250}, (id * 3) % 41 FROM range(250)")
    val origRows = rowsOf(tbl).sortBy(_.mkString(","))
    val origFiles = dataFileNames(tbl)
    assert(origFiles.size >= 4, s"need fragments: $origFiles")
    // Stage a 2-file rewrite of the full table OUTSIDE the table dir
    // (as compactCore's hidden staging subdir would hold it).
    val stage = java.nio.file.Files.createTempDirectory(s"swp_stage_$tbl")
    spark.table(s"swp.$tbl").repartition(2).write
      .mode("overwrite").parquet(stage.toString)
    import scala.jdk.CollectionConverters._
    val stagedFiles = {
      val s = java.nio.file.Files.list(stage)
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        !n.startsWith(".") && !n.startsWith("_")
      }.toList finally s.close()
    }
    assert(stagedFiles.size == 2)
    // Manifest FIRST (as compactCore does), then the renames — all of
    // them for the roll-forward state, only the first for roll-back.
    val manifest =
      (stagedFiles.map(f => s"staged\t${f.getFileName}") ++
        origFiles.map(n => s"orig\t$n")).mkString("\n")
    java.nio.file.Files.write(
      tdir(tbl).resolve(Engine.SwapManifestName),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val toMove = if (renamedInAll) stagedFiles else stagedFiles.take(1)
    toMove.foreach { f =>
      java.nio.file.Files.move(f, tdir(tbl).resolve(f.getFileName.toString))
    }
    spark.catalog.refreshTable(s"swp.$tbl")
    (origRows, origFiles, stagedFiles.map(_.getFileName.toString))
  }

  private def pendingManifest(tbl: String): String = {
    val Payload.Select(_, rows) = g.execute(s"EXPLAIN FILES swp.$tbl"): @unchecked
    rows.collectFirst { case Seq("pending_swap_manifest", v) => v.toString }.get
  }

  test("crash AFTER all renames, BEFORE the deletes: next mutation rolls FORWARD to parity") {
    val (origRows, origFiles, stagedNames) = tornSwap("fwd", renamedInAll = true)
    // The torn state is visibly broken: originals + staged both count,
    // and EXPLAIN FILES names the pending manifest (read-only: it
    // reports the tear, it does not repair it).
    assert(spark.table("swp.fwd").count() == 2L * origRows.size,
      "precondition: the torn swap must expose duplicates")
    assert(pendingManifest("fwd") == "true", "EXPLAIN FILES must surface the torn swap")
    // Any writer-lock mutation repairs first; this one matches nothing.
    val Payload.Update(n) = g.execute("UPDATE swp.fwd SET v = 0 WHERE k < 0"): @unchecked
    assert(n == 0L)
    spark.catalog.refreshTable("swp.fwd")
    assert(rowsOf("fwd").sortBy(_.mkString(",")) == origRows,
      "roll-forward must land on exact row parity")
    val after = dataFileNames("fwd")
    assert(after == stagedNames.toSet, s"originals must be gone: $after vs $stagedNames")
    assert((after & origFiles).isEmpty)
    assert(!java.nio.file.Files.exists(tdir("fwd").resolve(Engine.SwapManifestName)),
      "manifest must be consumed by the repair")
    assert(pendingManifest("fwd") == "false")
  }

  test("crash MID-renames (partial staged set): next mutation rolls BACK to parity") {
    val (origRows, origFiles, _) = tornSwap("bck", renamedInAll = false)
    assert(spark.table("swp.bck").count() > origRows.size.toLong,
      "precondition: the partial swap must expose extra rows")
    val Payload.Delete(n) = g.execute("DELETE FROM swp.bck WHERE k < 0"): @unchecked
    assert(n == 0L)
    spark.catalog.refreshTable("swp.bck")
    assert(rowsOf("bck").sortBy(_.mkString(",")) == origRows,
      "roll-back must land on exact row parity")
    assert(dataFileNames("bck") == origFiles,
      "roll-back must restore exactly the original file set")
    assert(!java.nio.file.Files.exists(tdir("bck").resolve(Engine.SwapManifestName)))
  }

  test("COMPACT TABLE itself converges a torn swap before compacting") {
    val (origRows, _, _) = tornSwap("cpt", renamedInAll = true)
    val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE swp.cpt"): @unchecked
    assert(rowsOf("cpt").sortBy(_.mkString(",")) == origRows,
      s"compact-after-crash must not duplicate rows (stats $stats)")
  }

  test("INSERT repairs too, then appends") {
    val (origRows, _, _) = tornSwap("ins", renamedInAll = true)
    g.execute("INSERT INTO swp.ins VALUES (9999, 1)")
    val got = rowsOf("ins").sortBy(_.mkString(","))
    val want = (origRows :+ Seq[Any](9999, 1)).sortBy(_.mkString(","))
    assert(got == want, "repair must precede the append")
  }

  test("ALTER TABLE ADD COLUMN on a torn swap repairs FIRST — no baked-in duplicates") {
    // Round-17 verdict task 1: alterTable rewrites the table from
    // spark.table's view; on a torn swap that view held duplicates and
    // the rewrite destroyed the manifest with the evidence — the
    // transient, repairable anomaly became permanent wrong data.
    val (origRows, _, _) = tornSwap("alt", renamedInAll = true)
    assert(spark.table("swp.alt").count() == 2L * origRows.size,
      "precondition: the torn swap must expose duplicates")
    g.execute("ALTER TABLE swp.alt ADD COLUMN w INTEGER DEFAULT 7")
    val got = rowsOf("alt").sortBy(_.mkString(","))
    val want = origRows.map(_ :+ 7).sortBy(_.mkString(","))
    assert(got == want,
      "ALTER on a torn table must converge to parity before rewriting")
    assert(!java.nio.file.Files.exists(tdir("alt").resolve(Engine.SwapManifestName)))
  }

  test("CREATE INDEX on a torn swap repairs FIRST — the clustered rewrite sees parity") {
    val (origRows, _, _) = tornSwap("idx", renamedInAll = true)
    g.execute("CREATE INDEX idx_k ON swp.idx (k)")
    assert(rowsOf("idx").sortBy(_.mkString(",")) == origRows,
      "the index build must not bake torn-swap duplicates into the clustered layout")
    assert(!java.nio.file.Files.exists(tdir("idx").resolve(Engine.SwapManifestName)))
  }

  test("TRUNCATE on a torn swap consumes the manifest — no stale tombstone") {
    val (_, _, _) = tornSwap("trc", renamedInAll = false)
    g.execute("TRUNCATE TABLE swp.trc")
    assert(spark.table("swp.trc").count() == 0L)
    assert(!java.nio.file.Files.exists(tdir("trc").resolve(Engine.SwapManifestName)),
      "a truncated table must not carry a pending swap manifest")
  }

  test("old files vanish under a live reader's plan without breaking it") {
    // The repair deletes originals that a concurrently-planned query
    // might reference — same class of anomaly the swap itself has.
    // Readers re-list on refresh; this just pins that a FRESH read
    // after repair sees the converged table (reader liveness across
    // file deletion is ConcurrentDmlSpec's territory).
    val (origRows, _, _) = tornSwap("rdr", renamedInAll = true)
    g.execute("UPDATE swp.rdr SET v = 0 WHERE k < 0")
    val viaScan = spark.table("swp.rdr")
      .select(input_file_name()).distinct().count()
    assert(viaScan == 2L, s"converged table must scan exactly the 2 staged files, got $viaScan")
    assert(spark.table("swp.rdr").count() == origRows.size.toLong)
  }
}
