package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Ports of tests/ability/index/{create.rs,filter/general.rs,
  * filter/gt_lt.rs} and tests/query/explain.rs: CREATE INDEX must
  * not change any query's result set (here it physically re-clusters
  * the table — the round-6 file-count-preserving layout — so this
  * battery is the correctness guard for that rewrite), and the
  * EXPLAIN introspection surface must list databases, tables and
  * columns. EXPLAIN output columns differ from the reference's
  * (`column/type/nullable/unique/auto_increment` vs `column/
  * data_type`) — richer by design, asserted structurally. */
class IndexExplainSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS idxexp")
    val loc = java.nio.file.Files.createTempDirectory("idxexp").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE idxexp LOCATION '$loc'")
    e.execute("USE idxexp")
    e
  }

  private def vals(sql: String): Seq[Long] =
    g.execute(sql) match {
      case Payload.Select(_, rs) => rs.map(_.head.asInstanceOf[Long]).sorted
      case other => fail(s"expected Select, got $other")
    }

  test("index/filter: same results before and after CREATE INDEX") {
    g.execute("CREATE TABLE indexed (a INTEGER)")
    g.execute("INSERT INTO indexed (a) VALUES (1), (2), (3), (3), (4), (100)")

    def battery(): Unit = {
      assert(vals("SELECT a FROM indexed") == Seq(1L, 2L, 3L, 3L, 4L, 100L))
      assert(vals("SELECT a FROM indexed WHERE a > 2") == Seq(3L, 3L, 4L, 100L))
      assert(vals("SELECT a FROM indexed WHERE a >= 3") == Seq(3L, 3L, 4L, 100L))
      assert(vals("SELECT a FROM indexed WHERE a < 4") == Seq(1L, 2L, 3L, 3L))
      assert(vals("SELECT a FROM indexed WHERE a <= 3") == Seq(1L, 2L, 3L, 3L))
      assert(vals("SELECT a FROM indexed WHERE a = 3") == Seq(3L, 3L))
    }
    battery()
    g.execute("CREATE INDEX index ON indexed (a)")
    battery()
    // mutations through the clustered layout keep the battery green
    g.execute("INSERT INTO indexed (a) VALUES (7)")
    assert(vals("SELECT a FROM indexed WHERE a > 2") == Seq(3L, 3L, 4L, 7L, 100L))
    g.execute("DELETE FROM indexed WHERE a = 7")
    battery()
  }

  test("explain.rs: database / table / column introspection") {
    g.execute("CREATE TABLE simple (id INTEGER, val FLOAT)")
    // EXPLAIN <db> lists its tables
    g.execute("EXPLAIN idxexp") match {
      case Payload.Select(cols, rs) =>
        assert(cols == Seq("table"))
        assert(rs.map(_.head).contains("simple"))
      case other => fail(s"$other")
    }
    // EXPLAIN db.table lists columns (richer than the reference's
    // column/data_type pair)
    g.execute("EXPLAIN idxexp.simple") match {
      case Payload.Select(cols, rs) =>
        assert(cols.take(2) == Seq("column", "type"))
        assert(rs.map(_.head) == Seq("id", "val"))
        assert(rs.forall(_(1).toString.nonEmpty))
      case other => fail(s"$other")
    }
    // EXPLAIN ALL lists databases; ALL_TABLE lists (db, table) pairs
    g.execute("EXPLAIN ALL") match {
      case Payload.Select(cols, rs) =>
        assert(cols == Seq("database"))
        assert(rs.map(_.head).contains("idxexp"))
      case other => fail(s"$other")
    }
    g.execute("EXPLAIN ALL_TABLE") match {
      case Payload.Select(cols, rs) =>
        assert(cols == Seq("database", "table"))
        assert(rs.contains(Seq("idxexp", "simple")))
      case other => fail(s"$other")
    }
    intercept[Throwable](g.execute("EXPLAIN nonsense"))
    g.execute("USE `default`")
  }
}
