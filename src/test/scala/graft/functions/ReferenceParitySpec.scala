package graft.functions

import graft.SparkFixture
import graft.engine.{Engine, Payload}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's OWN function-test assertions, run verbatim (same
  * SQL, same expected values) through the engine:
  * /root/reference/tests/query/function/{convert,convert_timestamp,
  * func_timestamp,misc_func_cast}.rs. Where the reference asserts an
  * error for a named-rule mismatch, this engine's documented TRY
  * divergence returns NULL — those cases assert NULL instead.
  */
class ReferenceParitySpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = new Engine(spark)

  private def row(sql: String): Seq[Any] =
    g.execute(sql) match {
      case Payload.Select(_, rows) => rows.head
      case other => fail(s"expected Select, got $other")
    }

  // ---- tests/query/function/convert.rs ----

  test("convert.rs assertions") {
    assert(row("VALUES (CONVERT('INTEGER', '1'))") == Seq(1L))
    assert(row("VALUES (CONVERT('BOOLEAN', 'true'))") == Seq(true))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2021-04-20', 'DATE'))") == Seq(1618876800L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2021-04-20 13:20', 'DATETIME'))") == Seq(1618924800L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2021-04-20 13:20:25', 'DATETIME'))") == Seq(1618924825L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '13:20', 'TIME'))") == Seq(48000L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '13:20:25', 'TIME'))") == Seq(48025L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2021-04-20', 22))") == Seq(1618876800L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2021-04-20', '%Y-%m-%d'))") == Seq(1618876800L))
    assert(row(
      "VALUES (CONVERT('TEXT', 10000.921, 'MONEY'), CONVERT('TEXT', 10000.921, 'SEPARATED'))")
      == Seq("$10,000.92", "10,000.92"))
  }

  // ---- tests/query/function/convert_timestamp.rs ----

  test("convert_timestamp.rs assertions") {
    assert(row("VALUES (CONVERT('TIMESTAMP', '981158400', 'TIMESTAMP'))") == Seq(981158400L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '981158400', 0))") == Seq(981158400L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2001-02-03', 'DATE'))") == Seq(981158400L))
    // reference errors here; documented divergence: NULL (TRY semantics)
    assert(row("VALUES (CONVERT('TIMESTAMP', '2001-02-03', 'DATETIME'))") == Seq(null))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2001-02-03 04:05', 'DATETIME'))") == Seq(981173100L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '2001-02-03', 'TIME'))") == Seq(null))
    assert(row("VALUES (CONVERT('TIMESTAMP', '04:05', 'TIME'))") == Seq(14700L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '04:05:00', 'TIME'))") == Seq(14700L))
    assert(row("VALUES (CONVERT('TIMESTAMP', '04:05:06', 'TIME'))") == Seq(14706L))
  }

  // ---- tests/query/function/func_timestamp.rs ----

  test("func_timestamp.rs assertions") {
    assert(row("VALUES (CONVERT('TEXT', DATEFROMPARTS(2001,2,3), '%Y-%m-%d'))") == Seq("2001-02-03"))
    assert(row("VALUES (CONVERT('TEXT', 981158400, '%Y-%m-%d'))") == Seq("2001-02-03"))
    assert(row("VALUES (DATEFROMPARTS(2001,2,3))") == Seq(981158400L))
    assert(row("VALUES (MONTH(981158400))") == Seq(2))
    assert(row(
      "VALUES (CONVERT('TIMESTAMP', '2001-02-03 04:05:06', 'DATETIME'), DATEFROMPARTS(2001,2,3,4,5,6))")
      == Seq(981173106L, 981173106L))
    assert(row(
      "VALUES (YEAR(981173106), MONTH(981173106), DAY(981173106), HOUR(981173106), MINUTE(981173106), SECOND(981173106))")
      == Seq(2001, 2, 3, 4, 5, 6))
    assert(row(
      """VALUES (
        |  CONVERT('TEXT', 981158400, '%Y-%m-%d'),
        |  CONVERT('TEXT', DATEADD('DAY', 10, 981158400), '%Y-%m-%d'),
        |  CONVERT('TEXT', DATEADD('DAY', 30, 981158400), '%Y-%m-%d'),
        |  CONVERT('TEXT', DATEADD('DAY', 365, 981158400), '%Y-%m-%d'),
        |  CONVERT('TEXT', DATEADD('MONTH', 1, 981158400), '%Y-%m-%d'),
        |  CONVERT('TEXT', DATEADD('MONTH', 13, 981158400), '%Y-%m-%d'),
        |  CONVERT('TEXT', DATEADD('YEAR', 1, 981158400), '%Y-%m-%d'))""".stripMargin)
      == Seq("2001-02-03", "2001-02-13", "2001-03-05", "2002-02-03",
        "2001-03-03", "2002-03-03", "2002-02-03"))
  }

  // ---- tests/query/function/misc_func_cast.rs ----

  test("misc_func_cast.rs assertions") {
    g.execute("DROP DATABASE IF EXISTS paritydb")
    val loc = java.nio.file.Files.createTempDirectory("parity").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE paritydb LOCATION '$loc'")
    g.execute(
      """CREATE TABLE paritydb.Item (id INTEGER NULL, flag BOOLEAN,
        |ratio FLOAT NULL, number TEXT)""".stripMargin)
    g.execute("INSERT INTO paritydb.Item VALUES (0, TRUE, NULL, '1')")
    assert(row("SELECT CAST(LOWER(number) AS INTEGER) AS cast FROM paritydb.Item") == Seq(1L))
    assert(row("SELECT CAST(id AS BOOLEAN) AS cast FROM paritydb.Item") == Seq(false))
    assert(row("SELECT CAST(flag AS TEXT) AS cast FROM paritydb.Item") == Seq("true"))
  }

  // ---- tests/query/function/func_cast.rs ----

  test("func_cast.rs assertions") {
    assert(row("VALUES (CAST('true' AS BOOLEAN))") == Seq(true))
    assert(row("VALUES (CAST(1 AS BOOLEAN))") == Seq(true))
    assert(row("VALUES (CAST('1' AS INTEGER))") == Seq(1))
    assert(row("VALUES (CAST(1.1 AS INTEGER))") == Seq(1))
    assert(row("VALUES (CAST(TRUE AS INTEGER))") == Seq(1))
    assert(row("VALUES (CAST('1.1' AS FLOAT))") == Seq(1.1d)) // dialect FLOAT = f64
    assert(row("VALUES (CAST(1 AS FLOAT))") == Seq(1.0d))
  }

  // ---- tests/query/function/func_other.rs ----

  test("func_other.rs assertions") {
    assert(row("VALUES (IFNULL(NULL, 1))") == Seq(1))
    assert(row("VALUES (IFNULL(0, 1))") == Seq(0))
    assert(row("VALUES (NULLIF(0, 1))") == Seq(0))
    assert(row("VALUES (NULLIF(1, 0))") == Seq(1))
    assert(row("VALUES (NULLIF(1, 1))") == Seq(null))
    assert(row("VALUES (NULLIF(1, NULL))") == Seq(1))
    assert(row("VALUES (IIF(TRUE, 0, 1))") == Seq(0))
    assert(row("VALUES (IIF(FALSE, 0, 1))") == Seq(1))
    assert(row("VALUES (IIF(1=1, 0, 1))") == Seq(0))
    assert(row("VALUES (IIF(1=0, 0, 1))") == Seq(1))
    assert(row("VALUES (IIF(NULL=0, 0, 1))") == Seq(1)) // NULL predicate → else branch
    assert(row("VALUES (LEN('Test'))") == Seq(4))
    assert(row("VALUES (LEN('Test test'))") == Seq(9))
    // Spark's decimal literals make ROUND return decimal; compare numerically
    assert(row("VALUES (ROUND(1.7), ROUND(1.2), ROUND(0.9), ROUND(10000.7))")
      .map(_.toString.toDouble) == Seq(2.0d, 1.0d, 1.0d, 10001.0d))
    // divergence: reference POW asserts I64; ours is Spark's double
    assert(row("VALUES (POW(2, 2), POW(10, 3))") == Seq(4.0d, 1000.0d))
    assert(row("VALUES ('Hello!', REPLACE('Hello!', '!', '?'), REPLACE('Hello!!!', '!', '?'))")
      == Seq("Hello!", "Hello?", "Hello???"))
    assert(row("VALUES (CONCAT('Aee', 'Bee'), CONCAT('Aee', 'Bee', 'Cee'))")
      == Seq("AeeBee", "AeeBeeCee"))
    assert(row("VALUES (CONCAT('Aee', 'Bee', 'Cee', NULL))") == Seq(null))
    assert(row("VALUES (UUID())").head.toString.length == 36)
    val Seq(r0, r1, r2) = row("VALUES (RAND(), RAND(2, 300), RAND(-10, 10))")
    assert(r0.asInstanceOf[Double] >= 0.0 && r0.asInstanceOf[Double] < 1.0)
    assert(r1.asInstanceOf[Long] >= 2L && r1.asInstanceOf[Long] <= 300L)
    assert(r2.asInstanceOf[Long] >= -10L && r2.asInstanceOf[Long] <= 10L)
  }

  // ---- tests/query/function/case.rs ----

  test("case.rs assertions") {
    assert(row("VALUES (CASE WHEN 1=0 THEN 1 WHEN 1=1 THEN 2 ELSE 3 END)") == Seq(2))
    assert(row("VALUES (CASE WHEN 1=0 THEN 1 WHEN 0=1 THEN 2 ELSE 3 END)") == Seq(3))
    assert(row("VALUES (CASE WHEN 1=1 THEN 1 WHEN 0=1 THEN 2 ELSE 3 END)") == Seq(1))
  }

  // ---- tests/query/function/upper_lower.rs / left_right.rs shapes ----

  test("upper/lower/left/right assertions") {
    assert(row("VALUES (UPPER('abc'), LOWER('ABC'))") == Seq("ABC", "abc"))
    assert(row("VALUES (LEFT('hello world', 5), RIGHT('hello world', 5))")
      == Seq("hello", "world"))
  }
}
