package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Port of tests/ability/column_option/{auto_increment,default,
  * unique}.rs.
  *
  * Reading the reference's test macros matters here: its 3-argument
  * `assert_error!`/`assert_success!` forms are always-true `matches!`
  * bindings (tests/util/mod.rs), so only the 2-argument forms and
  * `assert_select!` row comparisons are real assertions. The row
  * sequences below — including the id collision after an explicit
  * insert — are the reference's genuinely observed behavior
  * (alter_row/auto_increment.rs:12-41 counts only NULL cells into the
  * counter; sled/auto_increment.rs:44 advances the generator by that
  * count). Where the reference declares-but-never-enforces an error
  * (FLOAT UNIQUE), we assert our actual, stricter behavior and note
  * it.
  */
class ColumnOptionRefSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS colopt")
    val loc = java.nio.file.Files.createTempDirectory("colopt").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE colopt LOCATION '$loc'")
    e.execute("USE colopt")
    e
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    g.execute(sql) match {
      case Payload.Select(_, rs) => rs
      case other => fail(s"expected Select, got $other")
    }

  test("auto_increment.rs: explicit ids do not advance the counter") {
    g.execute("CREATE TABLE Test (id INTEGER AUTO_INCREMENT NOT NULL, name TEXT)")
    g.execute("INSERT INTO Test (name) VALUES ('test1')")
    assert(rows("SELECT id, name FROM Test") == Seq(Seq(1L, "test1")))

    g.execute("INSERT INTO Test (name) VALUES ('test2'), ('test3')")
    assert(rows("SELECT id, name FROM Test ORDER BY name") ==
      Seq(Seq(1L, "test1"), Seq(2L, "test2"), Seq(3L, "test3")))

    // explicit NULL draws from the counter like an omitted column
    g.execute("INSERT INTO Test (name, id) VALUES ('test4', NULL)")
    assert(rows("SELECT id FROM Test WHERE name = 'test4'") == Seq(Seq(4L)))

    // explicit id 6: stored verbatim, counter stays at 5
    g.execute("INSERT INTO Test (name, id) VALUES ('test5', 6)")
    g.execute("INSERT INTO Test (name) VALUES ('test6')")
    g.execute("INSERT INTO Test (name) VALUES ('test7')")
    // → test6 gets 5, test7 gets 6, colliding with test5's explicit 6 —
    // the exact sequence auto_increment.rs pins.
    assert(rows("SELECT id, name FROM Test ORDER BY name") ==
      Seq(Seq(1L, "test1"), Seq(2L, "test2"), Seq(3L, "test3"),
        Seq(4L, "test4"), Seq(6L, "test5"), Seq(5L, "test6"), Seq(6L, "test7")))
  }

  test("auto_increment.rs: UNIQUE interplay — failed batches leave the table unchanged") {
    g.execute("CREATE TABLE TestUnique (id INTEGER AUTO_INCREMENT NOT NULL UNIQUE, name TEXT)")
    g.execute("INSERT INTO TestUnique (name, id) VALUES ('test1', NULL), ('test2', 3)")
    assert(rows("SELECT id, name FROM TestUnique ORDER BY name") ==
      Seq(Seq(1L, "test1"), Seq(3L, "test2")))

    // counter is at 2 (one auto fill so far) → this batch would assign
    // 2, 3 and 3 collides with the stored explicit 3
    assert(intercept[EngineException](
      g.execute("INSERT INTO TestUnique (name) VALUES ('test3'), ('test4')"))
      .getMessage.contains("duplicate"))
    assert(rows("SELECT id, name FROM TestUnique ORDER BY name") ==
      Seq(Seq(1L, "test1"), Seq(3L, "test2")))

    // in-batch collision: NULL,3,NULL,NULL fills 1,·,2,3 → dup with
    // the explicit 3 inside the same batch
    g.execute("CREATE TABLE TestUniqueSecond (id INTEGER AUTO_INCREMENT NOT NULL UNIQUE, name TEXT)")
    assert(intercept[EngineException](g.execute(
      "INSERT INTO TestUniqueSecond (name, id) VALUES ('test1', NULL), ('test2', 3), ('test3', NULL), ('test4', NULL)"))
      .getMessage.contains("duplicate"))
    assert(rows("SELECT COUNT(*) AS n FROM TestUniqueSecond") == Seq(Seq(0L)))
  }

  test("auto_increment.rs: INSERT..SELECT fills densely; TEXT auto-inc rejected") {
    g.execute("CREATE TABLE TestInsertSelect (id INTEGER AUTO_INCREMENT NOT NULL, name TEXT)")
    g.execute("INSERT INTO TestInsertSelect (name) SELECT name FROM Test")
    // the reference comments its row assert out as "temperamental"
    // (storage iteration order decides which name pairs with which
    // id); the dense 1..7 id set is the deterministic contract
    assert(rows("SELECT COUNT(*) AS n, MIN(id) AS mn, MAX(id) AS mx, COUNT(DISTINCT id) AS d FROM TestInsertSelect")
      == Seq(Seq(7L, 1L, 7L, 7L)))
    // "only INTEGER is allowed" (alter_table/error.rs:40-41 — declared
    // there, enforced here)
    val e = intercept[EngineException](g.execute(
      "CREATE TABLE TestText (id TEXT AUTO_INCREMENT NOT NULL UNIQUE, name TEXT)"))
    assert(e.getMessage.contains("only INTEGER"))
  }

  test("default.rs: omitted columns fill from DEFAULT, explicit NULL stays NULL") {
    g.execute(
      "CREATE TABLE TestDef (id INTEGER DEFAULT 1, num INTEGER, flag BOOLEAN NULL DEFAULT false)")
    g.execute("INSERT INTO TestDef VALUES (8, 80, true)")
    g.execute("INSERT INTO TestDef (num) VALUES (10)")
    g.execute("INSERT INTO TestDef (num, id) VALUES (20, 2)")
    g.execute("INSERT INTO TestDef (num, flag) VALUES (30, NULL), (40, true)")
    assert(rows("SELECT id, num, flag FROM TestDef WHERE flag IS NOT NULL ORDER BY num").toSet ==
      Set(Seq(1L, 10L, false), Seq(2L, 20L, false), Seq(1L, 40L, true), Seq(8L, 80L, true)))
  }

  test("unique.rs: INSERT and UPDATE violations across and within batches") {
    g.execute("CREATE TABLE TestA (id INTEGER UNIQUE, num INT)")
    g.execute("CREATE TABLE TestB (id INTEGER UNIQUE, num INT UNIQUE)")
    g.execute("CREATE TABLE TestC (id INTEGER NULL UNIQUE, num INT)")

    g.execute("INSERT INTO TestA VALUES (1, 1)")
    g.execute("INSERT INTO TestA VALUES (2, 1), (3, 1)")
    g.execute("INSERT INTO TestB VALUES (1, 1)")
    g.execute("INSERT INTO TestB VALUES (2, 2), (3, 3)")
    // NULLs are not unique-constrained; UPDATE may move a key in and
    // back out of the column
    g.execute("INSERT INTO TestC VALUES (NULL, 1)")
    g.execute("INSERT INTO TestC VALUES (2, 2), (NULL, 3)")
    g.execute("UPDATE TestC SET id = 1 WHERE num = 1")
    g.execute("UPDATE TestC SET id = NULL WHERE num = 1")

    // the reference lists these as intended errors (its 3-arg
    // assert_error! never fires); ours genuinely enforce them
    val errorCases = Seq(
      "INSERT INTO TestA VALUES (2, 2)",
      "INSERT INTO TestA VALUES (4, 4), (4, 5)",
      "UPDATE TestA SET id = 2 WHERE id = 1",
      "INSERT INTO TestB VALUES (1, 3)",
      "INSERT INTO TestB VALUES (4, 2)",
      "INSERT INTO TestB VALUES (5, 5), (6, 5)",
      "UPDATE TestB SET num = 2 WHERE id = 1",
      "INSERT INTO TestC VALUES (2, 4)",
      "INSERT INTO TestC VALUES (NULL, 5), (3, 5), (3, 6)",
      "UPDATE TestC SET id = 1")
    errorCases.foreach { sql =>
      assert(intercept[EngineException](g.execute(sql)).getMessage.contains("duplicate"),
        s"expected duplicate-entry error for: $sql")
    }
    // nothing leaked from the failed statements
    assert(rows("SELECT COUNT(*) AS n FROM TestA") == Seq(Seq(3L)))
    assert(rows("SELECT COUNT(*) AS n FROM TestB") == Seq(Seq(3L)))
    assert(rows("SELECT COUNT(*) AS n FROM TestC") == Seq(Seq(3L)))
    g.execute("USE `default`")
  }
}
