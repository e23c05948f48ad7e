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

  test("filter/arithmetic.rs: +,-,*,/ in WHERE and UPDATE, integer division") {
    g.execute("DROP DATABASE IF EXISTS arith")
    val loc = java.nio.file.Files.createTempDirectory("arith").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE arith LOCATION '$loc'")
    g.execute("USE arith")
    g.execute("CREATE TABLE Arith (id INTEGER, num INTEGER, name TEXT)")
    g.execute(
      """INSERT INTO Arith (id, num, name) VALUES
        |  (1, 6, 'A'), (2, 8, 'B'), (3, 4, 'C'), (4, 2, 'D'), (5, 3, 'E');""".stripMargin)
    def one(sql: String): Any = g.execute(sql) match {
      case Payload.Select(_, Seq(Seq(v))) => v
      case other => fail(s"expected one row/col, got $other")
    }
    // add/subtract/multiply on WHERE
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id = 1 + 1;") == 1L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id < id + 1;") == 5L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id < num + id;") == 5L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id + 1 < 5;") == 3L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id = 2 - 1;") == 1L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE 2 - 1 = id;") == 1L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id > id - 1;") == 5L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id > id - num;") == 5L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE 5 - id < 3;") == 3L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id = 2 * 2;") == 1L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE 3 * id < 4;") == 1L)
    // divide on WHERE — the int-division assertions: 5/2 = 2, 10/4 = 2
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id = 5 / 2;") == 1L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id > id / 2;") == 5L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id > num / id;") == 3L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE 10 / id = 2;") == 2L)
    assert(one("SELECT COUNT(1) count FROM Arith WHERE 1 + 1 = id;") == 1L)
    // integer AVG = SUM/COUNT in integer math: (6+8+4+2+3)/5 = 23/5 = 4
    assert(one("SELECT AVG(num) a FROM Arith") == 4L)
    assert(one("SELECT DISTINCT AVG(num) OVER () a FROM Arith") == 4L)
    // a float operand promotes to F64 division
    assert(one("SELECT num / 4.0 r FROM Arith WHERE id = 1") == 1.5d)
    // UPDATE round trip: *2 then /2 restores every id exactly
    g.execute("UPDATE Arith SET id = id + 1;")
    g.execute("UPDATE Arith SET id = id - 1 WHERE id != 6;")
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id <= 2;") == 2L)
    g.execute("UPDATE Arith SET id = id * 2;")
    g.execute("UPDATE Arith SET id = id / 2;")
    assert(one("SELECT COUNT(1) count FROM Arith WHERE id <= 2;") == 2L)
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

  test("join_basic.rs: the reference's full join battery") {
    g.execute("DROP DATABASE IF EXISTS joindb")
    val loc = java.nio.file.Files.createTempDirectory("joindb").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE joindb LOCATION '$loc'")
    g.execute("USE joindb")
    g.execute("CREATE TABLE Player (id INTEGER, name TEXT)")
    g.execute("CREATE TABLE Item (id INTEGER, quantity INTEGER, player_id INTEGER)")
    g.execute(
      """INSERT INTO Player (id, name) VALUES (1, 'Taehoon'), (2, 'Mike'),
        |(3, 'Jorno'), (4, 'Berry'), (5, 'Hwan')""".stripMargin)
    g.execute(
      """INSERT INTO Item (id, quantity, player_id) VALUES
        |(101, 1, 1), (102, 4, 2), (103, 9, 3), (104, 2, 3), (105, 1, 3),
        |(106, 5, 1), (107, 2, 1), (108, 1, 5), (109, 1, 5), (110, 3, 3),
        |(111, 4, 2), (112, 8, 1), (113, 7, 1), (114, 1, 1), (115, 2, 1)""".stripMargin)
    val cases = Seq(
      15 -> "SELECT * FROM Item LEFT JOIN Player ON Player.id = Item.player_id",
      16 -> "SELECT * FROM Item RIGHT JOIN Player ON Player.id = Item.player_id",
      5 -> "SELECT * FROM Item LEFT JOIN Player ON Player.id = Item.player_id WHERE quantity = 1",
      7 -> "SELECT * FROM Item LEFT JOIN Player ON Player.id = Item.player_id WHERE Player.id = 1",
      7 -> "SELECT * FROM Item INNER JOIN Player ON Player.id = Item.player_id WHERE Player.id = 1",
      7 -> """SELECT * FROM Item
             |LEFT JOIN Player p0 ON p0.id = Item.player_id
             |LEFT JOIN Player p1 ON p1.id = Item.player_id
             |LEFT JOIN Player p2 ON p2.id = Item.player_id
             |LEFT JOIN Player p3 ON p3.id = Item.player_id
             |LEFT JOIN Player p4 ON p4.id = Item.player_id
             |LEFT JOIN Player p5 ON p5.id = Item.player_id
             |LEFT JOIN Player p6 ON p6.id = Item.player_id
             |LEFT JOIN Player p7 ON p7.id = Item.player_id
             |LEFT JOIN Player p8 ON p8.id = Item.player_id
             |LEFT JOIN Player p9 ON p9.id = Item.player_id
             |WHERE p0.id = 1""".stripMargin,
      6 -> """SELECT * FROM Item
             |LEFT JOIN Player p0 ON p0.id = Item.player_id
             |LEFT JOIN Player p1 ON p1.id = Item.player_id
             |LEFT JOIN Player p2 ON p2.id = Item.player_id
             |LEFT JOIN Player p3 ON p3.id = Item.player_id
             |LEFT JOIN Player p4 ON p4.id = Item.player_id
             |LEFT JOIN Player p5 ON p5.id = Item.player_id
             |LEFT JOIN Player p6 ON p6.id = Item.player_id
             |LEFT JOIN Player p7 ON p7.id = Item.player_id
             |LEFT JOIN Player p8 ON p8.id = Item.player_id
             |INNER JOIN Player p9 ON p9.id = Item.player_id AND Item.id > 101
             |WHERE p0.id = 1""".stripMargin,
      5 -> "SELECT * FROM Item LEFT JOIN Player ON Player.id = Item.player_id WHERE Item.quantity = 1",
      5 -> "SELECT * FROM Item i LEFT JOIN Player p ON p.id = i.player_id WHERE i.quantity = 1",
      15 -> "SELECT * FROM Item i LEFT JOIN Player p ON p.id = i.player_id AND p.id = 1",
      15 -> "SELECT * FROM Item i LEFT JOIN Player p ON p.id = i.player_id AND i.quantity = 1",
      15 -> "SELECT * FROM Item LEFT JOIN Player ON Player.id = Item.player_id AND Item.quantity = 1",
      7 -> "SELECT * FROM Item i JOIN Player p ON p.id = i.player_id AND p.id = 1",
      7 -> "SELECT * FROM Item i INNER JOIN Player p ON p.id = i.player_id AND p.id = 1",
      5 -> "SELECT * FROM Item i JOIN Player p ON p.id = i.player_id AND i.quantity = 1",
      0 -> "SELECT * FROM Player INNER JOIN Item ON 1 = 2 INNER JOIN Item i2 ON 1 = 2")
    cases.foreach { case (expected, sql) =>
      assert(count(sql) == expected, s"wrong count for: $sql")
    }
    // cross product via comma syntax (the reference's bare JOIN)
    assert(count("SELECT * FROM Item, Player") == 75)
    g.execute("USE `default`")
  }

  test("filter/gt_lt.rs: comparison battery incl. string ordering") {
    g.execute("DROP DATABASE IF EXISTS fdb")
    val loc = java.nio.file.Files.createTempDirectory("fdb").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE fdb LOCATION '$loc'")
    g.execute("USE fdb")
    g.execute("CREATE TABLE Operator (id INTEGER, name TEXT)")
    g.execute(
      """INSERT INTO Operator (id, name) VALUES (1, 'Abstract'), (2, 'Azzzz'),
        |(3, 'July'), (4, 'Romeo'), (5, 'Trade')""".stripMargin)
    val cases = Seq(
      1 -> "SELECT * FROM Operator WHERE id < 2",
      2 -> "SELECT * FROM Operator WHERE id <= 2",
      3 -> "SELECT * FROM Operator WHERE id > 2",
      4 -> "SELECT * FROM Operator WHERE id >= 2",
      1 -> "SELECT * FROM Operator WHERE 2 > id",
      2 -> "SELECT * FROM Operator WHERE 2 >= id",
      3 -> "SELECT * FROM Operator WHERE 2 < id",
      4 -> "SELECT * FROM Operator WHERE 2 <= id",
      5 -> "SELECT * FROM Operator WHERE 1 < 3",
      5 -> "SELECT * FROM Operator WHERE 3 >= 3",
      0 -> "SELECT * FROM Operator WHERE 3 > 3",
      2 -> "SELECT * FROM Operator WHERE name < 'Azzzzzzzzzz'",
      1 -> "SELECT * FROM Operator WHERE name < 'Az'")
    cases.foreach { case (expected, sql) =>
      assert(count(sql) == expected, s"wrong count for: $sql")
    }
    g.execute("USE `default`")
  }

  test("aggregate/general.rs and with.rs over the basic table") {
    g.execute("DROP DATABASE IF EXISTS aggdb")
    val loc = java.nio.file.Files.createTempDirectory("aggdb").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE aggdb LOCATION '$loc'")
    g.execute("USE aggdb")
    g.execute("CREATE TABLE basic (a INTEGER)")
    g.execute("INSERT INTO basic (a) VALUES (1)")
    def one(sql: String): Any = g.execute(sql) match {
      case Payload.Select(_, Seq(Seq(v))) => v
      case other => fail(s"expected 1 row, got $other")
    }
    assert(one("SELECT SUM(a) AS agg FROM basic") == 1L)
    assert(one("SELECT COUNT(a) AS agg FROM basic") == 1L)
    assert(one("SELECT COUNT(1) AS agg FROM basic") == 1L)
    assert(one("SELECT COUNT(1) AS agg FROM basic GROUP BY a") == 1L)
    // with.rs: chained CTEs
    assert(one("WITH cte AS (SELECT a FROM basic) SELECT a FROM cte") == 1L)
    assert(one(
      """WITH cte_0 AS (SELECT a FROM basic),
        |cte_1 AS (SELECT a FROM cte_0)
        |SELECT a FROM cte_1""".stripMargin) == 1L)
    g.execute("USE `default`")
  }

  test("index/filter/general.rs: same answers before and after CREATE INDEX") {
    g.execute("DROP DATABASE IF EXISTS ixdb")
    val loc = java.nio.file.Files.createTempDirectory("ixdb").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE ixdb LOCATION '$loc'")
    g.execute("USE ixdb")
    g.execute("CREATE TABLE indexed (a INTEGER)")
    g.execute("INSERT INTO indexed (a) VALUES (1), (2), (3), (3), (4), (100)")
    def vals(sql: String): Seq[Any] = g.execute(sql) match {
      case Payload.Select(_, rows) => rows.map(_.head)
      case other => fail(s"expected Select, got $other")
    }
    val all = Seq(1L, 2L, 3L, 3L, 4L, 100L)
    assert(vals("SELECT a FROM indexed ORDER BY a") == all)
    assert(vals("SELECT a FROM indexed WHERE a > 2 ORDER BY a") == Seq(3L, 3L, 4L, 100L))
    assert(vals("SELECT a FROM indexed WHERE a < 4 ORDER BY a") == Seq(1L, 2L, 3L, 3L))
    g.execute("CREATE INDEX index ON indexed (a)")
    assert(vals("SELECT a FROM indexed ORDER BY a") == all)
    assert(vals("SELECT a FROM indexed WHERE a >= 3 ORDER BY a") == Seq(3L, 3L, 4L, 100L))
    assert(vals("SELECT a FROM indexed WHERE a > 2 ORDER BY a") == Seq(3L, 3L, 4L, 100L))
    assert(vals("SELECT a FROM indexed WHERE a <= 3 ORDER BY a") == Seq(1L, 2L, 3L, 3L))
    assert(vals("SELECT a FROM indexed WHERE a < 4 ORDER BY a") == Seq(1L, 2L, 3L, 3L))
    assert(vals("SELECT a FROM indexed WHERE a > 1 + 1 ORDER BY a") == Seq(3L, 3L, 4L, 100L))
    g.execute("USE `default`")
  }

  test("misc/cast.rs: the cast matrix through SQL") {
    def one(sql: String): Any = g.execute(sql) match {
      case Payload.Select(_, Seq(Seq(v))) => v
      case other => fail(s"expected 1 row, got $other")
    }
    // Boolean
    assert(one("VALUES (CAST('true' AS BOOLEAN))") == true)
    assert(one("VALUES (CAST('false' AS BOOLEAN))") == false)
    assert(one("VALUES (CAST(1 AS BOOLEAN))") == true)
    assert(one("VALUES (CAST(0 AS BOOLEAN))") == false)
    // divergence: reference errors on CAST(NULL AS BOOLEAN) in
    // expressions but its cast matrix says Null → Null; Spark gives NULL
    assert(one("VALUES (CAST(NULL AS BOOLEAN))") == null)
    // Integer
    assert(one("VALUES (CAST(true AS INTEGER))") == 1)
    assert(one("VALUES (CAST(false AS INTEGER))") == 0)
    assert(one("VALUES (CAST(1.1 AS INTEGER))") == 1)
    assert(one("VALUES (CAST('11' AS INTEGER))") == 11)
    assert(one("VALUES (CAST(NULL AS INTEGER))") == null)
    // Float (dialect FLOAT = f64)
    assert(one("VALUES (CAST(true AS FLOAT))") == 1.0d)
    assert(one("VALUES (CAST(false AS FLOAT))") == 0.0d)
    assert(one("VALUES (CAST(1 AS FLOAT))") == 1.0d)
    assert(one("VALUES (CAST('11' AS FLOAT))") == 11.0d)
    // Text
    assert(one("VALUES (CAST(true AS TEXT))") == "true")
    assert(one("VALUES (CAST(1 AS TEXT))") == "1")
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
