package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The reference's ability/functionality statement tests run with the
  * same SQL and expectations through the engine:
  * /root/reference/tests/ability/base/generic_complex.rs and
  * tests/functionality/statement/{set,truncate}.rs. (TableA's
  * trailing-comma column list and statement-final semicolons are kept
  * verbatim — the dispatcher must cope.) */
class ReferenceAbilitySpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = new Engine(spark)

  private def count(sql: String): Int =
    g.execute(sql) match {
      case Payload.Select(_, rows) => rows.length
      case other => fail(s"expected Select, got $other")
    }

  test("generic_complex.rs: mixed column orders, predicates, update, delete") {
    g.execute("DROP DATABASE IF EXISTS abil")
    val loc = java.nio.file.Files.createTempDirectory("abil").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE abil LOCATION '$loc'")
    g.execute("USE abil")
    g.execute(
      """CREATE TABLE TableA (
        |    id INTEGER,
        |    test INTEGER,
        |    target_id INTEGER
        |)""".stripMargin)
    g.execute(
      """INSERT INTO TableA (id, test, target_id) VALUES
        |  (1, 100, 2),
        |  (2, 100, 1),
        |  (3, 300, 5);""".stripMargin)
    g.execute("INSERT INTO TableA (target_id, id, test) VALUES (5, 3, 400);")
    g.execute("INSERT INTO TableA (test, id, target_id) VALUES (500, 3, 4);")
    g.execute("INSERT INTO TableA VALUES (4, 500, 3);")

    assert(count("SELECT * FROM TableA;") == 6)
    assert(count("SELECT * FROM TableA WHERE id = 3;") == 3)
    assert(count("SELECT * FROM TableA WHERE id = 3 AND test = 500;") == 1)
    assert(count("SELECT * FROM TableA WHERE id = 3 OR test = 100;") == 5)
    assert(count("SELECT * FROM TableA WHERE id != 3 AND test != 100;") == 1)
    assert(count("SELECT * FROM TableA WHERE id = 3 LIMIT 2;") == 2)
    assert(count("SELECT * FROM TableA LIMIT 10 OFFSET 2;") == 4)
    assert(count("SELECT * FROM TableA WHERE (id = 3 OR test = 100) AND test = 300;") == 1)
    assert(count("SELECT * FROM TableA WHERE NOT (id = 3);") == 3)
    // the ones the reference stubs out (TODO #49/#50) work here:
    assert(count("SELECT * FROM TableA WHERE id IN (1, 2, 4)") == 3)
    assert(count("SELECT * FROM TableA WHERE test IN (500, 300)") == 3)

    g.execute("UPDATE TableA SET test = 200 WHERE test = 100;")
    assert(count("SELECT * FROM TableA WHERE test = 100;") == 0)
    assert(count("SELECT * FROM TableA WHERE (test = 200);") == 2)

    g.execute("DELETE FROM TableA WHERE id != 3;")
    assert(count("SELECT * FROM TableA;") == 3)
    g.execute("USE `default`")
  }

  test("statement/set.rs: variables in projection, predicate, both branches") {
    g.execute("DROP DATABASE IF EXISTS setdb")
    val loc = java.nio.file.Files.createTempDirectory("setdb").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE setdb LOCATION '$loc'")
    g.execute("SET @variable = 1;")
    assert(g.execute("VALUES (@variable)") match {
      case Payload.Select(_, Seq(Seq(v))) => v == 1
      case _ => false
    })
    g.execute("CREATE TABLE setdb.basic (a INTEGER)")
    g.execute("INSERT INTO setdb.basic (a) VALUES (1)")
    assert(g.execute("SELECT a + @variable AS s FROM setdb.basic") match {
      case Payload.Select(_, Seq(Seq(v))) => v == 2L
      case _ => false
    })
    assert(count("SELECT a FROM setdb.basic WHERE @variable = 1") == 1)
    assert(count("SELECT a FROM setdb.basic WHERE @variable = 0") == 0)
  }

  test("statement/truncate.rs") {
    g.execute("DROP DATABASE IF EXISTS trdb")
    val loc = java.nio.file.Files.createTempDirectory("trdb").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE trdb LOCATION '$loc'")
    g.execute("CREATE TABLE trdb.basic (a INTEGER)")
    g.execute("INSERT INTO trdb.basic (a) VALUES (1)")
    assert(count("SELECT a FROM trdb.basic") == 1)
    g.execute("TRUNCATE TABLE trdb.basic")
    assert(count("SELECT a FROM trdb.basic") == 0)
  }
}
