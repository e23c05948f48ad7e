package graft.engine

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Statement-carving and column-definition parsing units. */
class SqlTextSpec extends AnyFunSuite {

  test("splitStatements respects quotes") {
    assert(SqlText.splitStatements("SELECT 'a;b'; SELECT 2")
      == Seq("SELECT 'a;b'", "SELECT 2"))
  }

  test("splitTop ignores separators inside parens and quotes") {
    assert(SqlText.splitTop("a, f(b, c), 'x,y'", ',').map(_.trim)
      == Seq("a", "f(b, c)", "'x,y'"))
  }

  test("parenBlock extracts balanced blocks") {
    val (block, end) = SqlText.parenBlock("CREATE TABLE t (a INT, b TEXT) rest", 0)
    assert(block == "a INT, b TEXT")
    assert("CREATE TABLE t (a INT, b TEXT) rest".substring(end).trim == "rest")
  }

  test("column defs parse types and options") {
    val cols = SqlText.parseColumnDefs(
      """id INTEGER AUTO_INCREMENT, name TEXT NOT NULL UNIQUE,
        |score FLOAT DEFAULT 1.5, flag BOOLEAN, u UNSIGNED INT,
        |ts TIMESTAMP, anything""".stripMargin)
    assert(cols.map(_.name) == Seq("id", "name", "score", "flag", "u", "ts", "anything"))
    assert(cols(0).autoIncrement && cols(0).dataType == LongType)
    assert(!cols(1).nullable && cols(1).unique && cols(1).dataType == StringType)
    assert(cols(2).default.contains("1.5") && cols(2).dataType == DoubleType)
    assert(cols(3).dataType == BooleanType)
    assert(cols(4).dataType == LongType)
    assert(cols(5).dataType == TimestampType)
    assert(cols(6).dataType == StringType) // Any → string
  }

  test("default expression stops at the next option keyword") {
    val c = SqlText.parseColumnDef("b INTEGER DEFAULT 7 * 2 NOT NULL")
    assert(c.default.contains("7 * 2") && !c.nullable)
    val c2 = SqlText.parseColumnDef("s TEXT DEFAULT 'NOT NULL ok' UNIQUE")
    assert(c2.default.contains("'NOT NULL ok'") && c2.unique && c2.nullable)
  }

  test("qualified names split") {
    assert(SqlText.splitQualified("db.t") == (Some("db"), "t"))
    assert(SqlText.splitQualified("`db`.`t`") == (Some("db"), "t"))
    assert(SqlText.splitQualified("t") == (None, "t"))
  }

  test("unsupported column option errors") {
    intercept[EngineException](SqlText.parseColumnDef("a INTEGER FROBNICATE"))
  }
}
