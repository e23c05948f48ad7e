package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** CSV mutation paths at a size where driver-side buffering would
  * hurt: a 10⁶-row bulk INSERT streams onto the file through
  * toLocalIterator (one partition in memory at a time, never the
  * batch), and UPDATE/DELETE rewrite through a temp file + atomic
  * rename (a reader never sees a half-written table). Correctness is
  * pinned with exact aggregates after each mutation. */
class CsvBoundSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  test("million-row CSV insert, update, delete round trip") {
    val g = new Engine(spark)
    g.execute("DROP DATABASE IF EXISTS csvb")
    val tmp = java.nio.file.Files.createTempDirectory("graft_csvb").toFile
    val csv = new java.io.File(tmp, "big.csv")
    java.nio.file.Files.writeString(csv.toPath, "k,v\n0,0\n")
    g.execute(s"CREATE DATABASE csvb LOCATION '${csv.getAbsolutePath}'")

    val n = 1000000L
    g.execute(s"INSERT INTO csvb.big SELECT id + 1, id % 100 FROM range($n)")
    def agg(sql: String): Seq[Any] = g.execute(sql) match {
      case Payload.Select(_, rows) => rows.head
      case other => fail(s"$other")
    }
    assert(agg("SELECT COUNT(*) AS n, SUM(k) AS sk FROM csvb.big") ==
      Seq(n + 1, n * (n + 1) / 2))

    // rewrite path (UPDATE): every k < 500000 bumps v by 1000
    val up = g.execute("UPDATE csvb.big SET v = v + 1000 WHERE k < 500000")
    assert(up == Payload.Update(500000L)) // k in [0, 499999]
    assert(agg("SELECT SUM(v) AS sv FROM csvb.big") ==
      // baseline sum of v: 0 + sum over id 0..n-1 of id%100 = 10^6/100 cycles * (0+..+99)
      Seq(n / 100 * 4950 + 500000L * 1000))

    // rewrite path (DELETE)
    val del = g.execute("DELETE FROM csvb.big WHERE k % 2 = 1")
    assert(del == Payload.Delete(500000L))
    assert(agg("SELECT COUNT(*) AS n FROM csvb.big") == Seq(n / 2 + 1))

    // the file on disk is the table: header + remaining rows, no temp
    // leftovers
    assert(csv.getParentFile.listFiles().count(_.getName.endsWith(".tmp")) == 0)
    val lineCount = {
      val src = scala.io.Source.fromFile(csv)
      try src.getLines().size finally src.close()
    }
    assert(lineCount == 1 + n / 2 + 1) // header + rows
    g.execute("DROP DATABASE csvb")
  }
}
