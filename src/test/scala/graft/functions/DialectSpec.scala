package graft.functions

import graft.SparkFixture
import graft.engine.Engine
import org.scalatest.funsuite.AnyFunSuite

/** Dialect function semantics, mirroring the reference's own function
  * tests (/root/reference/tests/query/function/{convert,
  * convert_timestamp,func_timestamp,misc_func_cast,left_right}.rs).
  * Queries go through Engine.query so DATEADD pre-parse rewriting is
  * exercised too.
  */
class DialectSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = new Engine(spark)

  private def one(sql: String): Any =
    g.query(sql).collect()(0).get(0)

  // ---- CONVERT core casts (cast.rs:24-134) ----

  test("CONVERT INTEGER: string parse, float truncation, bool 1/0") {
    assert(one("SELECT CONVERT('INTEGER', '42')") == 42L)
    assert(one("SELECT CONVERT('INTEGER', 9.99)") == 9L)
    assert(one("SELECT CONVERT('INTEGER', -9.99)") == -9L)
    assert(one("SELECT CONVERT('INTEGER', true)") == 1L)
    assert(one("SELECT CONVERT('INTEGER', false)") == 0L)
  }

  test("CONVERT FLOAT and BOOLEAN") {
    assert(one("SELECT CONVERT('FLOAT', '1.25')") == 1.25d)
    assert(one("SELECT CONVERT('FLOAT', true)") == 1.0d)
    assert(one("SELECT CONVERT('BOOLEAN', 'true')") == true)
    assert(one("SELECT CONVERT('BOOLEAN', 'FALSE')") == false)
  }

  test("CONVERT TEXT renders values; NULL becomes 'NULL'") {
    assert(one("SELECT CONVERT('TEXT', 42)") == "42")
    assert(one("SELECT CONVERT('TEXT', true)") == "true")
    assert(one("SELECT CONVERT('TEXT', CAST(NULL AS INT))") == "NULL")
  }

  test("TRY_CONVERT yields NULL on failure where CONVERT errors") {
    assert(one("SELECT TRY_CONVERT('INTEGER', 'zzz')") == null)
    intercept[Exception](one("SELECT CONVERT('INTEGER', 'zzz')"))
  }

  // ---- CONVERT datetime rules (cast.rs:216-303) ----

  test("CONVERT TEXT DATETIME formats epoch seconds") {
    assert(one("SELECT CONVERT('TEXT', 1640995200, 'DATETIME')")
      == "2022-01-01 00:00:00")
  }

  test("CONVERT TEXT with custom strftime format") {
    assert(one("SELECT CONVERT('TEXT', 1640995200, '%Y/%m/%d')") == "2022/01/01")
    assert(one("SELECT CONVERT('TEXT', 1640995200, '%F')") == "2022-01-01")
  }

  test("CONVERT TIMESTAMP parse rules: 20, 22, 40, 61, 100") {
    assert(one("SELECT CONVERT('TIMESTAMP', '2022-01-01 10:30:00', 20)") == 1641033000L)
    assert(one("SELECT CONVERT('TIMESTAMP', '2022-01-01', 22)") == 1640995200L)
    assert(one("SELECT CONVERT('TIMESTAMP', '20220101', 40)") == 1640995200L)
    assert(one("SELECT CONVERT('TIMESTAMP', '01/02/2022', 61)") == 1643673600L) // dd/MM → Feb 1
    assert(one("SELECT CONVERT('TIMESTAMP', '10:30:00', 100)") == 37800L) // 1970-01-01
  }

  test("CONVERT TIMESTAMP named rule tries the format list") {
    assert(one("SELECT CONVERT('TIMESTAMP', '2022-01-01', 'DATE')") == 1640995200L)
    assert(one("SELECT CONVERT('TIMESTAMP', '01/02/2022', 'DATE')") == 1643673600L)
  }

  test("CONVERT TIMESTAMP default rule passes numbers through") {
    assert(one("SELECT CONVERT('TIMESTAMP', 123456789)") == 123456789L)
  }

  // ---- MONEY / SEPARATED (cast.rs:179-190) ----

  test("MONEY formats with commas, cents rounding, shortest repr") {
    assert(one("SELECT CONVERT('TEXT', 1234567.891, 'MONEY')") == "$1,234,567.89")
    assert(one("SELECT CONVERT('TEXT', 100.0, 'MONEY')") == "$100")
    assert(one("SELECT CONVERT('TEXT', 0.5, 'MONEY')") == "$0.5")
    assert(one("SELECT CONVERT('TEXT', -1234.5, 'MONEY')") == "$-1,234.5")
    assert(one("SELECT CONVERT('TEXT', 1234567.891, 'SEPARATED')") == "1,234,567.89")
  }

  // ---- DATEADD (timestamp.rs:147-278) ----

  test("DATEADD clamps month-end like the reference") {
    // 2022-01-31 + 1 MONTH = 2022-02-28
    assert(one("SELECT DATEADD('MONTH', 1, 1643587200)") == 1646006400L)
    // 2020-02-29 + 1 YEAR = 2021-02-28 (leap → non-leap clamp)
    assert(one("SELECT DATEADD('YEAR', 1, 1582934400)") == 1614470400L)
    assert(one("SELECT DATEADD('DAY', 2, 0)") == 172800L)
    assert(one("SELECT DATEADD('MONTH', -1, 1646006400)") == 1643328000L) // negative
  }

  // ---- DATEFROMPARTS (timestamp.rs:279-314) ----

  test("DATEFROMPARTS with defaults and full arity") {
    assert(one("SELECT DATEFROMPARTS(2022)") == 1640995200L)
    assert(one("SELECT DATEFROMPARTS(2022, 3, 5)") == 1646438400L)
    assert(one("SELECT DATEFROMPARTS(2022, 3, 5, 10, 30, 15)") == 1646476215L)
  }

  // ---- misc scalars ----

  test("LEN is byte length; IIF branches; XOR is boolean") {
    assert(one("SELECT LEN('hello')") == 5)
    assert(one("SELECT LEN('héllo')") == 6) // é is 2 UTF-8 bytes
    assert(one("SELECT IIF(1 < 2, 'y', 'n')") == "y")
    assert(one("SELECT XOR(true, false)") == true)
    assert(one("SELECT XOR(true, true)") == false)
  }

  test("YEAR through SECOND extract from timestamps") {
    val r = g.query(
      """SELECT year(t), month(t), day(t), hour(t), minute(t), second(t)
        |FROM (SELECT TIMESTAMP '2022-03-05 10:30:15' AS t)""".stripMargin)
      .collect()(0).toSeq
    assert(r == Seq(2022, 3, 5, 10, 30, 15))
  }

  test("NOW returns epoch seconds as integer") {
    val v = one("SELECT NOW()").asInstanceOf[Long]
    assert(v > 1700000000L && v < 4102444800L) // sane range: 2023..2100
  }

  test("RAND_RANGE stays within bounds") {
    val rows = g.query(
      "SELECT RAND_RANGE(5, 10) FROM range(100)").collect().map(_.getLong(0))
    assert(rows.forall(v => v >= 5 && v <= 10))
  }

  // ---- strftime translation unit ----

  test("strftime translation quotes literal letters") {
    assert(Dialect.strftimeToJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Dialect.strftimeToJava("%Hh%Mm") == "HH'h'mm'm'")
    assert(Dialect.strftimeToJava("%%") == "%")
  }
}
