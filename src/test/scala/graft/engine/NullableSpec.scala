package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Port of /root/reference/tests/functionality/statement/data_query/
  * nullable.rs. (That file is commented out in the reference tree —
  * one big `/* TODO */` block — but the semantics it pins are live
  * code in value/methods/binary.rs and value/mod.rs, so the battery
  * runs for real here.) Plus the NULL-comparison compat mode those
  * semantics require: reference comparisons return `false` — and
  * `!=` `true` — on NULL operands, never NULL (binary.rs:51-64;
  * PartialEq/PartialOrd have no Null arm, value/mod.rs:145-188),
  * while arithmetic propagates NULL (the generic! macro,
  * binary.rs:66-92), which Spark matches natively.
  *
  * One adjustment in the port: reference columns are NOT NULL unless
  * declared `NULL` (column.rs:36-38); this engine keeps SQL's
  * nullable-by-default (README divergence list), so the port declares
  * NOT NULL explicitly where the reference relied on its default.
  */
class NullableSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS nullable_db")
    val loc = java.nio.file.Files.createTempDirectory("nullable_db").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE nullable_db LOCATION '$loc'")
    e.execute("USE nullable_db")
    e
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    g.execute(sql) match {
      case Payload.Select(_, rs) => rs
      case other => fail(s"expected Select, got $other")
    }
  private def count(sql: String): Int = rows(sql).length

  test("nullable.rs: IS NULL / IS NOT NULL and NULL-propagating arithmetic") {
    g.execute(
      """CREATE TABLE Test (
        |  id INTEGER NULL,
        |  num INTEGER NOT NULL,
        |  name TEXT NOT NULL
        |)""".stripMargin)
    g.execute(
      """INSERT INTO Test (id, num, name) VALUES
        |  (NULL, 2, "Hello"),
        |  (   1, 9, "World"),
        |  (   3, 4, "Great");""".stripMargin)

    // rows compared as sets: a parquet-backed table has no insert
    // order (the reference's KV store does — not a semantics delta
    // these tests pin)
    assert(rows("SELECT id, num, name FROM Test").toSet ==
      Set(Seq(null, 2L, "Hello"), Seq(1L, 9L, "World"), Seq(3L, 4L, "Great")))
    assert(rows("SELECT id, num FROM Test WHERE id IS NULL AND name = 'Hello'") ==
      Seq(Seq(null, 2L)))
    assert(rows("SELECT id, num FROM Test WHERE id IS NULL") == Seq(Seq(null, 2L)))
    assert(rows("SELECT id, num FROM Test WHERE id IS NOT NULL").toSet ==
      Set(Seq(1L, 9L), Seq(3L, 4L)))
    assert(rows("SELECT id, num FROM Test WHERE id + 1 IS NULL") == Seq(Seq(null, 2L)))
    assert(rows("SELECT id, num FROM Test WHERE id + 1 IS NOT NULL").toSet ==
      Set(Seq(1L, 9L), Seq(3L, 4L)))
    assert(count("SELECT id, num FROM Test WHERE 100 IS NULL") == 0)
    assert(count("SELECT id, num FROM Test WHERE 100 IS NOT NULL") == 3)
    assert(count("SELECT id, num FROM Test WHERE 8 + 3 IS NULL") == 0)
    assert(count("SELECT id, num FROM Test WHERE 8 + 3 IS NOT NULL") == 3)
    assert(count("SELECT id, num FROM Test WHERE NULL IS NULL") == 3)
    assert(count("SELECT id, num FROM Test WHERE NULL IS NOT NULL") == 0)
    assert(count("SELECT id, num FROM Test WHERE (NULL + id) IS NULL;") == 3)
    assert(count("SELECT id, num FROM Test WHERE (NULL + NULL) IS NULL;") == 3)
    // "NULL" in double quotes is a string literal, not the NULL value
    assert(count("SELECT id, num FROM Test WHERE \"NULL\" IS NULL") == 0)
    assert(count("SELECT id, num FROM Test WHERE \"NULL\" IS NOT NULL") == 3)
    // every arithmetic form propagates NULL (incl. the dialect's
    // integer `/` — DialectDivide delegates null handling)
    assert(count("SELECT id, num FROM Test WHERE id + 1 IS NULL;") == 1)
    assert(count("SELECT id, num FROM Test WHERE 1 + id IS NULL;") == 1)
    assert(count("SELECT id, num FROM Test WHERE id - 1 IS NULL;") == 1)
    assert(count("SELECT id, num FROM Test WHERE 1 - id IS NULL;") == 1)
    assert(count("SELECT id, num FROM Test WHERE id * 1 IS NULL;") == 1)
    assert(count("SELECT id, num FROM Test WHERE 1 * id IS NULL;") == 1)
    assert(count("SELECT id, num FROM Test WHERE id / 1 IS NULL;") == 1)
    assert(count("SELECT id, num FROM Test WHERE 1 / id IS NULL;") == 1)
    assert(rows(
      """SELECT id + 1 AS a, 1 + id AS b, id - 1 AS c, 1 - id AS d,
        |  id * 1 AS e, 1 * id AS f, id / 1 AS g2, 1 / id AS h
        |FROM Test WHERE id IS NULL;""".stripMargin) ==
      Seq(Seq(null, null, null, null, null, null, null, null)))
  }

  test("nullable.rs: UPDATE to non-null, INSERT NULL into NOT NULL rejected") {
    g.execute("UPDATE Test SET id = 2")
    assert(rows("SELECT id FROM Test").map(_.head) == Seq(2L, 2L, 2L))
    assert(rows("SELECT id, num FROM Test").map(r => (r(0), r(1))).toSet ==
      Set((2L, 2L), (2L, 4L), (2L, 9L)))
    val e = intercept[EngineException](
      g.execute("""INSERT INTO Test VALUES (1, NULL, "ok")"""))
    assert(e.getMessage.contains("NOT NULL"))
  }

  test("nullable_text.rs: explicit NULL insert into nullable column") {
    g.execute(
      """CREATE TABLE Foo (
        |  id INTEGER NOT NULL,
        |  name TEXT NULL
        |);""".stripMargin)
    g.execute("INSERT INTO Foo (id, name) VALUES (1, \"Hello\"), (2, Null);")
    assert(rows("SELECT id, name FROM Foo").toSet ==
      Set(Seq(1L, "Hello"), Seq(2L, null)))
  }

  test("compat mode: comparisons are false (and != true) on NULL operands") {
    g.execute("CREATE TABLE NTest (id INTEGER NULL, num INTEGER NOT NULL)")
    g.execute("INSERT INTO NTest VALUES (NULL, 2), (1, 9), (3, 4)")

    // default three-valued logic: NULL rows vanish from both a
    // predicate and its negation
    assert(count("SELECT num FROM NTest WHERE id = 1") == 1)
    assert(count("SELECT num FROM NTest WHERE NOT (id = 1)") == 1)
    assert(count("SELECT num FROM NTest WHERE id != 1") == 1)

    g.nullComparisonFalse = true
    try {
      // reference semantics: NULL = 1 → false, so NOT picks the row up
      assert(count("SELECT num FROM NTest WHERE id = 1") == 1)
      assert(rows("SELECT num FROM NTest WHERE NOT (id = 1)").map(_.head).toSet ==
        Set(2L, 4L))
      // Rust's != is the negation of eq → NULL != 1 is true
      assert(rows("SELECT num FROM NTest WHERE id != 1").map(_.head).toSet ==
        Set(2L, 4L))
      // orderings: partial_cmp with a Null arm is None → every
      // comparison operator returns false
      assert(count("SELECT num FROM NTest WHERE id < 10") == 2)
      assert(count("SELECT num FROM NTest WHERE id >= 0") == 2)
      // a comparison *projected* is false, never NULL
      assert(rows("SELECT num, id = 1 AS eq FROM NTest").map(r => (r(0), r(1))).toSet ==
        Set((2L, false), (9L, true), (4L, false)))
      assert(rows("SELECT num, id != 1 AS ne FROM NTest").map(r => (r(0), r(1))).toSet ==
        Set((2L, true), (9L, false), (4L, true)))
      // IS NULL / <=> / arithmetic-NULL behavior is NOT affected
      assert(count("SELECT num FROM NTest WHERE id IS NULL") == 1)
      assert(count("SELECT num FROM NTest WHERE id + 1 IS NULL") == 1)
      // the UPDATE/DELETE WHERE fragment path uses the same rewrite
      g.execute("UPDATE NTest SET num = 0 WHERE NOT (id = 1)")
      assert(rows("SELECT num FROM NTest ORDER BY num").map(_.head) ==
        Seq(0L, 0L, 9L))
      // prepared statements too
      val p = g.prepare("SELECT num FROM NTest WHERE id != 1")
      g.executePrepared(p) match {
        case Payload.Select(_, rs) => assert(rs.map(_.head).toSet == Set(0L))
        case other => fail(s"expected Select, got $other")
      }
    } finally g.nullComparisonFalse = false

    // flag off again: three-valued logic is back
    assert(count("SELECT num FROM NTest WHERE NOT (id = 1)") == 1)
  }
}
