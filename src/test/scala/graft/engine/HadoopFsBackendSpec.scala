package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The managed-parquet file layer on a NON-`file:` Hadoop scheme
  * (round-16 verdict task 1): at 100 TB tables live on HDFS/object
  * storage, so `tableDirectory`/`dataFiles`/COMPACT/the CoW DML swap
  * must go through `FileSystem.get(uri)`, not java.nio. This spec
  * mounts a database at a `graftfs://` location (a registered
  * RawLocalFileSystem wrapper — see [[GraftTestFs]]; the engine cannot
  * tell it from a real remote FS because every call goes through the
  * Hadoop API) and runs the g8/g9 battery shapes there: fragmenting
  * INSERTs, file-granular UPDATE/DELETE, EXPLAIN FILES with real
  * directory listings, COMPACT TABLE with the staged swap, and the
  * auto-compact hook. Before the port, EXPLAIN FILES silently
  * degraded to the zero-row-blind scan listing here and COMPACT threw
  * "requires a local managed parquet directory". */
class HadoopFsBackendSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    // graftfs wraps RawLocalFileSystem → rename IS atomic; declaring
    // it via the conf override exercises the per-deployment extension
    // path of the COMPACT atomic-rename allowlist (round-17 verdict
    // task 5; the refusal path is AtomicRenameGuardSpec's).
    spark.sparkContext.hadoopConfiguration
      .set("graft.fs.atomic.rename.schemes", "graftfs")
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS hfs")
    val local = java.nio.file.Files.createTempDirectory("hfs").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE hfs LOCATION 'graftfs://$local'")
    e
  }

  private def rowsOf(tbl: String): Set[Seq[Any]] =
    spark.table(s"hfs.$tbl").collect().map(_.toSeq).toSet

  private def explainFiles(tbl: String): Map[String, String] = {
    val Payload.Select(_, rows) = g.execute(s"EXPLAIN FILES hfs.$tbl"): @unchecked
    rows.map(r => r.head.toString -> r(1).toString).toMap
  }

  test("table location carries the graftfs scheme — the engine is genuinely off java.nio here") {
    g.execute("CREATE TABLE hfs.t (k INTEGER, v INTEGER)")
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("t", Some("hfs"))).location
    assert(loc.getScheme == "graftfs", s"table location $loc must be scheme graftfs")
  }

  test("fragmenting INSERTs + EXPLAIN FILES: real directory listing, not the scan fallback") {
    for (i <- 0 until 6)
      g.execute(s"INSERT INTO hfs.t SELECT id + ${i * 500}, (id * 7) % 97 FROM range(500)")
    // A ZERO-ROW insert leaves an empty fragment only the directory
    // listing can see — the exact blindness the scan fallback had.
    g.execute("INSERT INTO hfs.t SELECT id, id FROM range(10) WHERE id < 0")
    val ex = explainFiles("t")
    assert(ex("files").toInt >= 6, s"expected >=6 fragments listed: $ex")
    val scanVisible = spark.table("hfs.t")
      .select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
    assert(ex("files").toInt >= scanVisible.toInt,
      "directory listing must see at least what the scan sees (plus zero-row fragments)")
  }

  test("file-granular UPDATE and DELETE run the CoW swap on graftfs") {
    val Payload.Update(nu) =
      g.execute("UPDATE hfs.t SET v = v + 1000 WHERE k < 100"): @unchecked
    assert(nu == 100L, s"update matched $nu")
    val Payload.Delete(nd) = g.execute("DELETE FROM hfs.t WHERE k >= 2900"): @unchecked
    assert(nd == 100L, s"delete matched $nd")
    // Expected from first principles: k = id + chunk*500, v = (id*7)%97,
    // +1000 below k=100, k >= 2900 deleted.
    val want = spark.range(2900).selectExpr(
      "cast(id AS int) AS k",
      "cast((id % 500) * 7 % 97 + if(id < 100, 1000, 0) AS int) AS v")
      .collect().map(_.toSeq).toSet
    assert(rowsOf("t") == want, "CoW rewrite on graftfs changed the wrong rows")
  }

  test("COMPACT TABLE packs the fragments through the staged swap — previously threw here") {
    val expected = rowsOf("t")
    val Payload.Select(labels, Seq(stats)) = g.execute("COMPACT TABLE hfs.t"): @unchecked
    assert(labels == Seq("files_in", "files_out", "rows_moved", "bytes_moved"))
    def asL(a: Any): Long = a.asInstanceOf[Number].longValue
    assert(asL(stats(0)) >= 6, s"fragments must move: $stats")
    assert(asL(stats(1)) < asL(stats(0)), s"must shrink: $stats")
    assert(rowsOf("t") == expected, "rows changed across COMPACT on graftfs")
    assert(explainFiles("t")("files").toLong == asL(stats(1)),
      "post-compact listing must show exactly the packed files")
  }

  test("auto_compact hook (g9 shape) keeps the file count bounded on graftfs") {
    g.execute("CREATE TABLE hfs.ac (k INTEGER, v INTEGER)")
    g.execute("SET @auto_compact = true")
    for (i <- 0 until 6) {
      g.execute(s"INSERT INTO hfs.ac SELECT id + ${i * 500}, (id * 7) % 97 FROM range(500)")
      g.execute(s"UPDATE hfs.ac SET v = v + 1 WHERE k >= ${i * 500} AND k < ${i * 500 + 100}")
    }
    g.execute("SET @auto_compact = false")
    val ex = explainFiles("ac")
    assert(ex("compact_recommended") == "false",
      s"auto-compact must keep the layout under the recommend threshold: $ex")
    assert(spark.table("hfs.ac").count() == 3000L)
  }
}
