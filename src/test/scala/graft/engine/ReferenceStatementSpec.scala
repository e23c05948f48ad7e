package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the remaining reference statement/misc test files:
  * tests/functionality/statement/data_query/{select,values,
  * set_operation/{union,except,intersect}}.rs, tests/ability/base/
  * {basic,filter/filter_simple}.rs, tests/ability/column_option/
  * types.rs, tests/misc/error.rs.
  *
  * Port adaptations, each tied to a documented divergence (README):
  * VALUES columns are named col1/col2 (reference: unnamed_0/…);
  * columns are nullable unless declared NOT NULL (reference defaults
  * NOT NULL — types.rs DDL gains explicit NOT NULL); permissive
  * casts accept what the reference rejects (int→bool, bool→int);
  * subqueries and derived-table joins WORK here (the reference
  * errors UnimplementedSubquery / UnimplementedTableType). */
class ReferenceStatementSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS refstmt")
    val loc = java.nio.file.Files.createTempDirectory("refstmt").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE refstmt LOCATION '$loc'")
    e.execute("USE refstmt")
    e
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    g.execute(sql) match {
      case Payload.Select(_, rs) => rs
      case other => fail(s"expected Select, got $other")
    }
  private def count(sql: String): Int = rows(sql).length
  private def mustFail(sql: String): Throwable =
    intercept[Throwable](g.execute(sql))

  test("select.rs + basic.rs: create/insert/select round trip") {
    g.execute("CREATE TABLE basic (a INTEGER)")
    g.execute("INSERT INTO basic (a) VALUES (1)")
    assert(rows("SELECT a FROM basic") == Seq(Seq(1L)))
  }

  test("values.rs: bare VALUES list") {
    assert(rows("VALUES ('Test', 1), ('Test2', 2), ('Test3', 3)").toSet ==
      Set(Seq("Test", 1L), Seq("Test2", 2L), Seq("Test3", 3L)))
  }

  test("union.rs: VALUES UNION VALUES dedups, UNION ALL keeps") {
    assert(rows(
      "VALUES ('Test', 1), ('Test2', 2) UNION VALUES ('Test3', 3)").toSet ==
      Set(Seq("Test", 1L), Seq("Test2", 2L), Seq("Test3", 3L)))
    val dedup = rows(
      "VALUES ('Test', 1), ('Test2', 2), ('Test3', 3) UNION VALUES ('Test3', 3)")
    assert(dedup.toSet ==
      Set(Seq("Test", 1L), Seq("Test2", 2L), Seq("Test3", 3L)))
    assert(dedup.length == 3)
    val all = rows(
      "VALUES ('Test', 1), ('Test2', 2), ('Test3', 3) UNION ALL VALUES ('Test3', 3)")
    assert(all.length == 4)
    assert(all.count(_ == Seq("Test3", 3L)) == 2)
  }

  test("except.rs / intersect.rs over VALUES lists") {
    assert(rows(
      """VALUES ('Test', 1), ('Test2', 2), ('Test3', 3), ('Test4', 4)
        |EXCEPT VALUES ('Test3', 3)""".stripMargin).toSet ==
      Set(Seq("Test", 1L), Seq("Test2", 2L), Seq("Test4", 4L)))
    assert(rows(
      """VALUES ('Test', 1), ('Test2', 2), ('Test3', 3), ('Test4', 4)
        |INTERSECT VALUES ('Test3', 3), ('Test1', 1), ('Test5', 5), ('Test2', 2)""".stripMargin).toSet ==
      Set(Seq("Test3", 3L), Seq("Test2", 2L)))
  }

  test("filter_simple.rs: BETWEEN, unary ops, literal arithmetic in WHERE") {
    g.execute("CREATE TABLE Boss (id INTEGER, name TEXT, strength FLOAT)")
    g.execute("CREATE TABLE Hunter (id INTEGER, name TEXT)")
    g.execute(
      """INSERT INTO Boss (id, name, strength) VALUES
        |  (1, 'Amelia', 10.10), (2, 'Doll', 20.20), (3, 'Gascoigne', 30.30),
        |  (4, 'Gehrman', 40.40), (5, 'Maria', 50.50);""".stripMargin)
    g.execute(
      "INSERT INTO Hunter (id, name) VALUES (1, 'Gascoigne'), (2, 'Gehrman'), (3, 'Maria')")

    assert(count("SELECT id, name FROM Boss WHERE id BETWEEN 2 AND 4") == 3)
    assert(count("SELECT id, name FROM Boss WHERE name BETWEEN 'Doll' AND 'Gehrman'") == 3)
    assert(count("SELECT name FROM Boss WHERE name NOT BETWEEN 'Doll' AND 'Gehrman'") == 2)
    assert(count("SELECT strength, name FROM Boss WHERE name NOT BETWEEN 'Doll' AND 'Gehrman'") == 2)
    // the EXISTS cases the reference stubs (filter_simple.rs TODO) work:
    assert(count(
      """SELECT name FROM Boss WHERE EXISTS (
        |  SELECT * FROM Hunter WHERE Hunter.name = Boss.name)""".stripMargin) == 3)
    assert(count(
      """SELECT name FROM Boss WHERE NOT EXISTS (
        |  SELECT * FROM Hunter WHERE Hunter.name = Boss.name)""".stripMargin) == 2)
    assert(count("SELECT name FROM Boss WHERE +1 = 1") == 5)
    assert(count("SELECT id FROM Hunter WHERE -1 = -1") == 3)
    assert(count("SELECT name FROM Boss WHERE -2.0 < -1.0") == 5)
    assert(count("SELECT id FROM Hunter WHERE +2 > +1.0") == 3)
    assert(count("SELECT name FROM Boss WHERE id <= +2") == 2)
    assert(count("SELECT name FROM Boss WHERE +id <= 2") == 2)
    assert(count("SELECT name FROM Boss WHERE 2 = 1.0 + 1") == 5)
    assert(count("SELECT id FROM Hunter WHERE -1.0 - 1.0 < -1") == 3)
    assert(count("SELECT name FROM Boss WHERE -2.0 * -3.0 = 6") == 5)
    assert(count("SELECT id FROM Hunter WHERE +2 / 1.0 > +1.0") == 3)
    // reference: unary +/- on a string errors (OnlySupportsNumeric).
    // Spark coerces the string toward numeric: a non-numeric string
    // becomes NULL, so the predicate selects nothing — same rows
    // delivered (none), different failure surface. Accept either.
    def errorOrEmpty(sql: String): Unit =
      try assert(count(sql) == 0) catch { case _: Throwable => () }
    errorOrEmpty("SELECT id FROM Hunter WHERE +'abcd' > 1.0")
    errorOrEmpty("SELECT id FROM Hunter WHERE -'abcd' < 1.0")
    errorOrEmpty("SELECT id FROM Hunter WHERE +name > 1.0")
    errorOrEmpty("SELECT id FROM Hunter WHERE -name < 1.0")
  }

  test("types.rs: type mismatches on INSERT/UPDATE (adapted to NOT NULL DDL)") {
    g.execute("CREATE TABLE TableB (id BOOLEAN)")
    g.execute("CREATE TABLE TableC (uid INTEGER NOT NULL, null_val INTEGER NULL)")
    g.execute("INSERT INTO TableB VALUES (FALSE)")
    g.execute("INSERT INTO TableC VALUES (1, NULL)")

    // divergence (README, permissive casts): int→bool and bool→int
    // coerce instead of erroring like the reference
    g.execute("INSERT INTO TableB SELECT uid FROM TableC")
    assert(rows("SELECT id FROM TableB").map(_.head).toSet == Set(false, true))
    g.execute("DELETE FROM TableB WHERE id = TRUE")

    // a non-numeric string into INTEGER: ANSI cast (Spark 4 default)
    // throws CAST_INVALID_INPUT — the same rejection as the
    // reference's IncompatibleDataType, different error type
    mustFail("INSERT INTO TableC (uid) VALUES (\"A\")")
    val e2 = mustFail("INSERT INTO TableC VALUES (NULL, 30);")
    assert(e2.getMessage.contains("NOT NULL"))
    mustFail("INSERT INTO TableC SELECT null_val FROM TableC;") // wrong arity
    val e3 = mustFail("UPDATE TableC SET uid = NULL;")
    assert(e3.getMessage.contains("NOT NULL"))
    // UPDATE SET uid = TRUE coerces (bool→int) — divergence as above
    g.execute("UPDATE TableC SET uid = TRUE")
    assert(rows("SELECT uid FROM TableC") == Seq(Seq(1L)))
  }

  test("error.rs: unsupported/missing-object/arity error surface") {
    g.execute("CREATE TABLE TableA (id INTEGER)")
    g.execute("INSERT INTO TableA (id) VALUES (1)")

    mustFail("COMMIT;")                         // QueryNotSupported
    mustFail("INSERT INTO Nothing VALUES (1);") // TableNotExists
    mustFail("UPDATE Nothing SET a = 1;")       // TableNotExists
    mustFail("SELECT * FROM Nothing;")          // TableNotFound
    mustFail("SELECT * FROM TableA WHERE noname = 1;")   // MissingColumn
    mustFail("INSERT INTO TableA (id2) VALUES (1);")     // ColumnNotFound
    mustFail("INSERT INTO TableA (id2, id) VALUES (100);")
    mustFail("INSERT INTO TableA VALUES (100), (100, 200);") // WrongNumberOfValues
    mustFail("SELECT * FROM TableA Where id = X'123';")  // bad literal
    // the reference ERRORS on derived-table joins and scalar
    // subqueries (UnimplementedTableType / UnimplementedSubquery);
    // both work here — divergence by implementation, not omission
    g.execute("CREATE TABLE TableB2 (id INTEGER)")
    assert(count(
      "SELECT * FROM TableA JOIN (SELECT * FROM TableB2) AS TableC ON 1 = 1") == 0)
    assert(count(
      "SELECT * FROM TableA WHERE id = (SELECT id FROM TableA WHERE id = 2);") == 0)
  }
}
