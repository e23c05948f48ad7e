package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Port of tests/ability/alter/{database/create_database.rs,
  * table/create_table.rs, table/alter_table.rs, table/drop_table.rs}.
  *
  * Adaptations (each noted inline): columns are nullable by default
  * here (README divergence list), so `ADD COLUMN x INTEGER` fills
  * NULL instead of erroring DefaultValueRequired — the reference-
  * shaped error needs an explicit NOT NULL; FLOAT UNIQUE is accepted
  * AND enforced (the reference's UnsupportedDataTypeForUniqueColumn is
  * declared in alter_table/error.rs:37-38 but never constructed, and
  * its test assert is an always-true 3-arg macro).
  */
class AlterRefSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS alt")
    e.execute("DROP DATABASE IF EXISTS altother")
    val loc = java.nio.file.Files.createTempDirectory("alt").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE alt LOCATION '$loc'")
    e.execute("USE alt")
    e
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    g.execute(sql) match {
      case Payload.Select(_, rs) => rs
      case other => fail(s"expected Select, got $other")
    }

  test("create_database.rs: qualified create, duplicate database, IF NOT EXISTS") {
    g.execute("CREATE TABLE alt.simple (id INTEGER, val FLOAT)")
    // unknown database on the qualified name
    intercept[Throwable](g.execute("CREATE TABLE altother.simple (id INTEGER, val FLOAT)"))

    val otherLoc = java.nio.file.Files.createTempDirectory("altother").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE altother LOCATION '$otherLoc'")
    assert(intercept[EngineException](
      g.execute(s"CREATE DATABASE altother LOCATION '$otherLoc'"))
      .getMessage.contains("already exists"))
    g.execute(s"CREATE DATABASE IF NOT EXISTS altother LOCATION '$otherLoc'")
    g.execute("CREATE TABLE altother.simple (id INTEGER, val FLOAT)")
    g.execute("DROP DATABASE IF EXISTS altother")
  }

  test("create_table.rs: duplicates, IF NOT EXISTS, unsupported types and options") {
    g.execute("CREATE TABLE CreateTable1 (id INTEGER NULL, num INTEGER, name TEXT)")
    assert(intercept[EngineException](
      g.execute("CREATE TABLE CreateTable1 (id INTEGER NULL, num INTEGER, name TEXT)"))
      .getMessage.contains("already exists"))
    g.execute("CREATE TABLE IF NOT EXISTS CreateTable2 (id INTEGER NULL, num INTEGER, name TEXT)")
    // second IF NOT EXISTS keeps the FIRST schema (note the
    // reference's trailing comma, which its parser accepts)
    g.execute("CREATE TABLE IF NOT EXISTS CreateTable2 (id2 INTEGER NULL,)")
    g.execute("INSERT INTO CreateTable2 VALUES (NULL, 1, '1')")
    assert(rows("SELECT num FROM CreateTable2") == Seq(Seq(1L)))

    intercept[EngineException](g.execute("CREATE TABLE Gluery (id SOMEWHAT)"))
    intercept[EngineException](g.execute("CREATE TABLE Gluery (id INTEGER CHECK (true))"))

    // reference intent: UnsupportedDataTypeForUniqueColumn(FLOAT) —
    // never enforced there; here the unique FLOAT column works and is
    // genuinely constrained
    g.execute("CREATE TABLE CreateTable3 (id INTEGER, ratio FLOAT UNIQUE)")
    g.execute("INSERT INTO CreateTable3 VALUES (1, 0.5)")
    assert(intercept[EngineException](
      g.execute("INSERT INTO CreateTable3 VALUES (2, 0.5)"))
      .getMessage.contains("duplicate"))
  }

  test("alter_table.rs: rename table/column, add/drop column battery") {
    g.execute("CREATE TABLE Foo (id INTEGER)")
    g.execute("INSERT INTO Foo VALUES (1), (2), (3)")
    assert(rows("SELECT id FROM Foo ORDER BY id") == Seq(Seq(1L), Seq(2L), Seq(3L)))

    intercept[Throwable](g.execute("ALTER TABLE Foo2 RENAME TO Bar"))
    g.execute("ALTER TABLE Foo RENAME TO Bar")
    assert(rows("SELECT id FROM Bar ORDER BY id") == Seq(Seq(1L), Seq(2L), Seq(3L)))

    g.execute("ALTER TABLE Bar RENAME COLUMN id TO new_id")
    assert(rows("SELECT new_id FROM Bar ORDER BY new_id") == Seq(Seq(1L), Seq(2L), Seq(3L)))
    intercept[EngineException](g.execute("ALTER TABLE Bar RENAME COLUMN hello TO idid"))

    g.execute("CREATE TABLE Foo (id INTEGER)")
    g.execute("INSERT INTO Foo VALUES (1), (2)")
    // divergence: nullable-by-default, so a bare ADD COLUMN fills NULL
    // (reference errors DefaultValueRequired because its columns are
    // NOT NULL by default); the reference-shaped error needs NOT NULL
    g.execute("ALTER TABLE Foo ADD COLUMN amount INTEGER")
    assert(rows("SELECT id, amount FROM Foo ORDER BY id") ==
      Seq(Seq(1L, null), Seq(2L, null)))
    assert(intercept[EngineException](
      g.execute("ALTER TABLE Foo ADD COLUMN amount2 INTEGER NOT NULL"))
      .getMessage.contains("DEFAULT"))
    intercept[EngineException](g.execute("ALTER TABLE Foo ADD COLUMN id INTEGER"))
    intercept[EngineException](g.execute("ALTER TABLE Foo ADD COLUMN something SOMEWHAT"))
    intercept[EngineException](g.execute("ALTER TABLE Foo ADD COLUMN something INTEGER CHECK (true)"))

    g.execute("ALTER TABLE Foo ADD COLUMN something FLOAT UNIQUE")
    g.execute("ALTER TABLE Foo DROP COLUMN IF EXISTS something")
    intercept[EngineException](g.execute("ALTER TABLE Foo DROP COLUMN something"))
    g.execute("ALTER TABLE Foo DROP COLUMN amount")
    g.execute("ALTER TABLE Foo DROP COLUMN IF EXISTS opt2")
    assert(rows("SELECT * FROM Foo ORDER BY id") == Seq(Seq(1L), Seq(2L)))
  }

  test("index/create_table.rs: PRIMARY KEY means unique + not-null") {
    // the reference's inline INDEX syntax is TODO-commented there;
    // PRIMARY KEY is the only live assertion
    g.execute("CREATE TABLE basic_keyed (a INTEGER PRIMARY KEY)")
    g.execute("INSERT INTO basic_keyed VALUES (1), (2)")
    assert(intercept[EngineException](g.execute("INSERT INTO basic_keyed VALUES (1)"))
      .getMessage.contains("duplicate"))
    assert(intercept[EngineException](g.execute("INSERT INTO basic_keyed VALUES (NULL)"))
      .getMessage.contains("NOT NULL"))
    assert(rows("SELECT COUNT(*) AS n FROM basic_keyed") == Seq(Seq(2L)))
  }

  test("drop_table.rs: drop, IF EXISTS, select-after-drop, DROP VIEW mismatch") {
    g.execute("CREATE TABLE DropTable (id INT, num INT, name TEXT)")
    g.execute("INSERT INTO DropTable (id, num, name) VALUES (1, 2, 'Hello')")
    assert(rows("SELECT id, num, name FROM DropTable").size == 1)

    g.execute("DROP TABLE DropTable")
    assert(intercept[EngineException](g.execute("DROP TABLE DropTable"))
      .getMessage.contains("does not exist"))

    g.execute("CREATE TABLE DropTable (id INT, num INT, name TEXT)")
    g.execute("DROP TABLE IF EXISTS DropTable")
    g.execute("DROP TABLE IF EXISTS DropTable")
    intercept[Throwable](g.execute("SELECT id, num, name FROM DropTable"))

    g.execute("CREATE TABLE DropTable (id INT, num INT, name TEXT)")
    assert(rows("SELECT id, num, name FROM DropTable").isEmpty)
    // DROP VIEW on a table is a type mismatch
    intercept[Throwable](g.execute("DROP VIEW DropTable"))
    g.execute("USE `default`")
  }
}
