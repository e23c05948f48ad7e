package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The reference's flagship test architecture: ONE ability battery
  * run across EVERY backend with per-backend exception lists
  * (tests/databases_main.rs:1-35; exceptions in
  * tests/databases/{memory,sheet,csv,sled}.rs). Here the same steps
  * run against the managed-parquet catalog (the Sled analogue, no
  * exceptions), the :memory: backend (no exceptions), and the Sheet
  * workbook backend (exceptions mirroring the reference's: no
  * auto_increment, no index — ALTER runs here because our Sheet
  * tables rewrite through the parquet mirror). The CSV backend is a
  * single pre-mounted table by construction (reference
  * csv/mutable.rs:13 OnlyOneTableAllowed) and skips the whole
  * create-table battery exactly as the reference's CSV exception
  * list does — its mutation surface is covered by g6 + CsvBoundSpec.
  */
class BackendMatrixSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = new Engine(spark)

  /** name → (db setup SQL, exception list) */
  private def backends: Seq[(String, String, Set[String])] = {
    val pq = java.nio.file.Files.createTempDirectory("bm_pq").toFile.getAbsolutePath
    val xlsx = new java.io.File(
      java.nio.file.Files.createTempDirectory("bm_sheet").toFile, "book.xlsx").getAbsolutePath
    Seq(
      ("bm_parquet", s"CREATE DATABASE bm_parquet LOCATION '$pq'", Set.empty[String]),
      ("bm_memory", "CREATE DATABASE bm_memory LOCATION ':memory:'", Set.empty[String]),
      // reference sheet exceptions: alter, column_option::auto_increment,
      // index, base::generic_complex — auto_increment and index kept
      ("bm_sheet", s"CREATE DATABASE bm_sheet LOCATION '$xlsx'",
        Set("auto_increment", "index")))
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    g.execute(sql) match {
      case Payload.Select(_, rs) => rs
      case other => fail(s"expected Select, got $other")
    }

  /** The battery: each step is (name, body). Table names are unique
    * per step so steps stay independent within a shared database. */
  private val battery: Seq[(String, () => Unit)] = Seq(
    "basic" -> (() => {
      g.execute("CREATE TABLE mx_basic (a INTEGER)")
      g.execute("INSERT INTO mx_basic (a) VALUES (1)")
      g.execute("INSERT INTO mx_basic VALUES (2)")
      assert(rows("SELECT a FROM mx_basic ORDER BY a") == Seq(Seq(1L), Seq(2L)))
      intercept[EngineException](g.execute("INSERT INTO mx_basic VALUES (1, 2)"))
    }),
    "insert_select" -> (() => {
      g.execute("CREATE TABLE mx_src (x INTEGER)")
      g.execute("INSERT INTO mx_src VALUES (10), (20)")
      g.execute("CREATE TABLE mx_dst (x INTEGER)")
      assert(g.execute("INSERT INTO mx_dst SELECT x FROM mx_src") == Payload.Insert(2))
      assert(rows("SELECT SUM(x) AS s FROM mx_dst") == Seq(Seq(30L)))
    }),
    "default_notnull" -> (() => {
      g.execute("CREATE TABLE mx_def (a INTEGER, b INTEGER DEFAULT 7, c TEXT NOT NULL DEFAULT 'x')")
      g.execute("INSERT INTO mx_def (a) VALUES (1)")
      assert(rows("SELECT a, b, c FROM mx_def") == Seq(Seq(1L, 7L, "x")))
      intercept[EngineException](g.execute("INSERT INTO mx_def VALUES (2, 2, NULL)"))
    }),
    "unique" -> (() => {
      g.execute("CREATE TABLE mx_u (k INTEGER UNIQUE)")
      g.execute("INSERT INTO mx_u VALUES (1), (2)")
      intercept[EngineException](g.execute("INSERT INTO mx_u VALUES (2)"))
      intercept[EngineException](g.execute("INSERT INTO mx_u VALUES (3), (3)"))
      assert(rows("SELECT COUNT(*) AS n FROM mx_u") == Seq(Seq(2L)))
    }),
    "auto_increment" -> (() => {
      g.execute("CREATE TABLE mx_ai (id INTEGER AUTO_INCREMENT NOT NULL, v TEXT)")
      g.execute("INSERT INTO mx_ai (v) VALUES ('a'), ('b')")
      g.execute("INSERT INTO mx_ai (v) VALUES ('c')")
      assert(rows("SELECT id FROM mx_ai ORDER BY id") == Seq(Seq(1L), Seq(2L), Seq(3L)))
    }),
    "update_delete" -> (() => {
      g.execute("CREATE TABLE mx_ud (a INTEGER, b TEXT)")
      g.execute("INSERT INTO mx_ud VALUES (1, 'x'), (2, 'y'), (3, 'z')")
      assert(g.execute("UPDATE mx_ud SET b = 'w' WHERE a > 1") == Payload.Update(2))
      assert(g.execute("DELETE FROM mx_ud WHERE a = 1") == Payload.Delete(1))
      assert(rows("SELECT a, b FROM mx_ud ORDER BY a") ==
        Seq(Seq(2L, "w"), Seq(3L, "w")))
    }),
    "truncate" -> (() => {
      g.execute("CREATE TABLE mx_tr (a INTEGER)")
      g.execute("INSERT INTO mx_tr VALUES (1), (2)")
      g.execute("TRUNCATE TABLE mx_tr")
      assert(rows("SELECT COUNT(*) AS n FROM mx_tr") == Seq(Seq(0L)))
    }),
    "alter" -> (() => {
      g.execute("CREATE TABLE mx_al (a INTEGER)")
      g.execute("INSERT INTO mx_al VALUES (1)")
      g.execute("ALTER TABLE mx_al ADD COLUMN b INTEGER DEFAULT 5")
      g.execute("ALTER TABLE mx_al RENAME COLUMN a TO a2")
      assert(rows("SELECT a2, b FROM mx_al") == Seq(Seq(1L, 5L)))
      g.execute("ALTER TABLE mx_al DROP COLUMN b")
      g.execute("ALTER TABLE mx_al RENAME TO mx_al2")
      assert(rows("SELECT a2 FROM mx_al2") == Seq(Seq(1L)))
    }),
    "index" -> (() => {
      g.execute("CREATE TABLE mx_ix (k INTEGER, v TEXT)")
      g.execute("INSERT INTO mx_ix VALUES (5, 'e'), (1, 'a'), (3, 'c')")
      g.execute("CREATE INDEX mx_ix_k ON mx_ix (k)")
      assert(rows("SELECT v FROM mx_ix WHERE k = 3") == Seq(Seq("c")))
    }),
    "drop" -> (() => {
      g.execute("CREATE TABLE mx_dr (a INTEGER)")
      g.execute("DROP TABLE mx_dr")
      intercept[EngineException](g.execute("DROP TABLE mx_dr"))
      g.execute("DROP TABLE IF EXISTS mx_dr")
    }))

  backends.foreach { case (db, setup, exceptions) =>
    test(s"ability battery on $db (skips: ${if (exceptions.isEmpty) "none" else exceptions.mkString(",")})") {
      g.execute(s"DROP DATABASE IF EXISTS $db")
      g.execute(setup)
      g.execute(s"USE $db")
      try battery.filterNot { case (n, _) => exceptions(n) }.foreach { case (name, body) =>
        withClue(s"[$db :: $name] ")(body())
      } finally g.execute("USE `default`")
    }
  }

  test("sheet backend persists created tables to the workbook file") {
    val dirF = java.nio.file.Files.createTempDirectory("bm_book2").toFile
    val path = new java.io.File(dirF, "wb.xlsx").getAbsolutePath
    g.execute("DROP DATABASE IF EXISTS bm_wb")
    g.execute(s"CREATE DATABASE bm_wb LOCATION '$path'")
    g.execute("CREATE TABLE bm_wb.t1 (a INTEGER, s TEXT)")
    g.execute("INSERT INTO bm_wb.t1 VALUES (1, 'one'), (2, 'two')")
    // the workbook on disk now holds the sheet with the data
    val sheets = Xlsx.read(path)
    assert(sheets.map(_.name) == Seq("t1"))
    assert(sheets.head.rows == Seq(Seq("a", "s"), Seq("1", "one"), Seq("2", "two")))
    // dropping the only table removes the (otherwise invalid
    // zero-sheet) workbook; the database stays usable
    g.execute("DROP TABLE bm_wb.t1")
    assert(!new java.io.File(path).exists())
    g.execute("CREATE TABLE bm_wb.t2 (b INTEGER)")
    g.execute("INSERT INTO bm_wb.t2 VALUES (9)")
    assert(Xlsx.read(path).map(_.name) == Seq("t2"))
    // RENAME TO must rename the worksheet in the book, not just the
    // parquet mirror
    g.execute("ALTER TABLE bm_wb.t2 RENAME TO t3")
    assert(Xlsx.read(path).map(_.name) == Seq("t3"))
    assert(Xlsx.read(path).head.rows == Seq(Seq("b"), Seq("9")))
    g.execute("DROP DATABASE IF EXISTS bm_wb")
  }
}
