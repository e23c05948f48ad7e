package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Port of tests/ability/base/aggregate/old.rs and tests/api/
  * insert.rs. Adaptations: COUNT over a nullable column returns the
  * non-NULL count (3) — the reference TODO-#73s this case because
  * its COUNT miscounts NULLs; bare non-aggregated columns under
  * GROUP BY are an analysis error here (Spark) where the reference
  * silently picks the first row per group — the ported assertions
  * use the explicit min() that reproduces the reference's expected
  * values. */
class AggregateOldSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS aggold")
    val loc = java.nio.file.Files.createTempDirectory("aggold").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE aggold LOCATION '$loc'")
    e.execute("USE aggold")
    e
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    g.execute(sql) match {
      case Payload.Select(_, rs) => rs
      case other => fail(s"expected Select, got $other")
    }
  private def one(sql: String): Seq[Any] = rows(sql).head

  test("old.rs: whole-table aggregates with integer semantics") {
    g.execute(
      "CREATE TABLE Item (id INTEGER, quantity INTEGER, age INTEGER NULL)")
    g.execute(
      """INSERT INTO Item (id, quantity, age) VALUES
        |  (1, 10, 11), (2, 0, 90), (3, 9, NULL), (4, 3, 3), (5, 25, NULL);""".stripMargin)

    assert(one("SELECT COUNT(1) AS c FROM Item") == Seq(5L))
    assert(one("SELECT count(1) AS c FROM Item") == Seq(5L))
    assert(one("SELECT Count(1) AS c FROM Item") == Seq(5L))
    assert(one("SELECT COUNT(1) AS a, COUNT(1) AS b FROM Item") == Seq(5L, 5L))
    assert(one("SELECT COUNT(quantity) AS c FROM Item") == Seq(5L))
    // reference TODO #73: its COUNT(nullable) is wrong; SQL says 3
    assert(one("SELECT COUNT(age) AS c FROM Item") == Seq(3L))
    assert(one("SELECT SUM(quantity) AS s, MAX(quantity) AS mx, MIN(quantity) AS mn FROM Item")
      == Seq(47L, 25L, 0L))
    assert(one("SELECT SUM(quantity + 1) AS s FROM Item") == Seq(52L))
    // aggregate arithmetic incl. the dialect's integer `/`: 94+25-3
    assert(one("SELECT SUM(quantity) * 2 + MAX(quantity) - 3 / 1 AS x FROM Item")
      == Seq(116L))
    assert(one("SELECT SUM(age) AS s, MAX(age) AS mx, MIN(age) AS mn FROM Item")
      == Seq(104L, 90L, 3L))
    assert(one("SELECT SUM(age) + SUM(quantity) AS s FROM Item") == Seq(151L))
    assert(one("SELECT COUNT(quantity) + COUNT(age) AS c FROM Item") == Seq(8L))
    // integer AVG: 47 / 5 = 9 (recipe/new.rs:117-130)
    assert(one("SELECT AVG(quantity) AS a FROM Item") == Seq(9L))
    assert(one("SELECT SUM(1 + 2) AS s FROM Item") == Seq(15L))
    intercept[Throwable](g.execute("SELECT SUM(id.name.ok) FROM Item;"))
    intercept[Throwable](g.execute("SELECT SUM(num) FROM Item;"))
  }

  test("old.rs: GROUP BY with explicit picks where the reference is implicit") {
    g.execute("DROP TABLE Item")
    g.execute(
      "CREATE TABLE Item (id INTEGER, quantity INTEGER NULL, city TEXT, ratio FLOAT)")
    g.execute(
      """INSERT INTO Item (id, quantity, city, ratio) VALUES
        |  (1, 10, 'Seoul', 0.2), (2, 0, 'Dhaka', 0.9), (3, NULL, 'Beijing', 1.1),
        |  (3, 30, 'Daejeon', 3.2), (4, 11, 'Seoul', 11.1), (5, 24, 'Seattle', 6.11);""".stripMargin)

    assert(rows("SELECT id, COUNT(1) AS c FROM Item GROUP BY id").toSet ==
      Set(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 2L), Seq(4L, 1L), Seq(5L, 1L)))
    assert(rows("SELECT id FROM Item GROUP BY id").map(_.head).toSet ==
      Set(1L, 2L, 3L, 4L, 5L))
    // bare `id` under GROUP BY city: analysis error here (divergence —
    // the reference silently takes the first row per group)
    intercept[Throwable](g.execute("SELECT id, city FROM Item GROUP BY city"))
    // the explicit form reproduces the reference's expected values
    assert(rows("SELECT MIN(id) AS id, city FROM Item GROUP BY city").toSet ==
      Set(Seq(3L, "Beijing"), Seq(3L, "Daejeon"), Seq(2L, "Dhaka"),
        Seq(5L, "Seattle"), Seq(1L, "Seoul")))
    assert(rows("SELECT MIN(ratio) AS ratio FROM Item GROUP BY id, city")
      .map(_.head).toSet == Set(0.2, 0.9, 1.1, 3.2, 11.1, 6.11))
    assert(rows(
      "SELECT MIN(ratio) AS ratio FROM Item GROUP BY id, city HAVING MIN(ratio) > 10")
      .map(_.head) == Seq(11.1))
  }

  test("api/insert.rs: select_as_csv round trip") {
    g.execute("CREATE TABLE basic (a INTEGER)")
    g.execute("INSERT INTO basic (a) VALUES (1)")
    assert(g.selectAsCsv("SELECT * FROM basic") == "a\n1")
    g.execute("INSERT INTO basic (a) VALUES (2),(3),(4),(5)")
    assert(g.selectAsCsv("SELECT * FROM basic ORDER BY a") == "a\n1\n2\n3\n4\n5")
    g.execute("USE `default`")
  }
}
