package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.functions.input_file_name
import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write at parquet-file granularity: after CREATE INDEX
  * clusters the table by key, a selective UPDATE/DELETE must rewrite
  * ONLY the files whose key ranges contain matches — every other
  * file survives byte-identical (same path, still present after the
  * statement). This is the property that turns a 100 TB selective
  * UPDATE from a full-table rewrite into an O(matching files) one. */
class FileGranularDmlSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS fgdml")
    val loc = java.nio.file.Files.createTempDirectory("fgdml").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE fgdml LOCATION '$loc'")
    e
  }

  private def files(): Set[String] =
    spark.table("fgdml.t").select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet

  private def one(sql: String): Any = g.execute(sql) match {
    case Payload.Select(_, rows) => rows.head.head
    case other => fail(s"$other")
  }

  test("selective UPDATE rewrites only the files containing matches") {
    g.execute("CREATE TABLE fgdml.t (k INTEGER, v INTEGER)")
    g.execute("INSERT INTO fgdml.t SELECT id, id FROM range(100000)")
    // cluster by k so file ranges are disjoint → selective statements
    // touch few files
    g.execute("CREATE INDEX ik ON fgdml.t (k)")
    val before = files()
    assert(before.size > 2, s"need a multi-file table, got ${before.size}")

    val p = g.execute("UPDATE fgdml.t SET v = v + 1000000 WHERE k >= 10 AND k < 20")
    assert(p == Payload.Update(10))
    val after = files()
    val survivors = before & after
    assert(survivors.nonEmpty, "every file was rewritten — not file-granular")
    assert((before -- after).size < before.size / 2,
      s"${(before -- after).size} of ${before.size} files rewritten for a 10-row update")
    // data correct: 10 rows moved up by 1e6
    assert(one("SELECT SUM(v) AS s FROM fgdml.t") ==
      99999L * 100000L / 2 + 10L * 1000000L)
    assert(one("SELECT COUNT(*) AS n FROM fgdml.t WHERE v >= 1000000") == 10L)
  }

  test("selective DELETE drops rows without rewriting untouched files") {
    val before = files()
    val p = g.execute("DELETE FROM fgdml.t WHERE k >= 99990")
    assert(p == Payload.Delete(10))
    val after = files()
    assert((before & after).nonEmpty, "every file was rewritten — not file-granular")
    assert((before -- after).size < before.size / 2)
    assert(one("SELECT COUNT(*) AS n FROM fgdml.t") == 99990L)
    assert(one("SELECT MAX(k) AS m FROM fgdml.t") == 99989L)
  }

  test("unique constraint still checked across untouched files") {
    g.execute("CREATE TABLE fgdml.u (k INTEGER, u INTEGER UNIQUE)")
    g.execute("INSERT INTO fgdml.u SELECT id, id FROM range(1000)")
    g.execute("CREATE INDEX iu ON fgdml.u (k)")
    // setting u=999 where k=0 collides with the untouched row k=999
    val e = intercept[EngineException](
      g.execute("UPDATE fgdml.u SET u = 999 WHERE k = 0"))
    assert(e.getMessage.contains("duplicate"))
    // failed statement must not have mutated the table
    assert(one("SELECT COUNT(*) AS n FROM fgdml.u WHERE u = 999") == 1L)
    assert(one("SELECT COUNT(*) AS n FROM fgdml.u") == 1000L)
  }
}
