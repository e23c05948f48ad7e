package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.functions.input_file_name
import org.scalatest.funsuite.AnyFunSuite

/** COMPACT TABLE — small-file hygiene for the CoW DML path
  * (round-14 verdict task 3). N rounds of file-granular
  * UPDATE/DELETE/INSERT fragment a table into many small files; the
  * command must bin-pack them back to the target size with rows
  * IDENTICAL before/after, never touch at-or-above-target files, and
  * EXPLAIN FILES must surface the histogram + the documented
  * auto-threshold so an operator knows when to run it. */
class CompactTableSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS cpt")
    val loc = java.nio.file.Files.createTempDirectory("cpt").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE cpt LOCATION '$loc'")
    e
  }

  private def files(tbl: String): Set[String] =
    spark.table(s"cpt.$tbl").select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet

  private def rowsOf(tbl: String): Set[Seq[Any]] =
    spark.table(s"cpt.$tbl").collect().map(_.toSeq).toSet

  private def explainFiles(tbl: String): Map[String, String] = {
    val Payload.Select(_, rows) = g.execute(s"EXPLAIN FILES cpt.$tbl"): @unchecked
    rows.map(r => r.head.toString -> r(1).toString).toMap
  }

  test("fragmented table compacts to fewer files with rows identical") {
    g.execute("CREATE TABLE cpt.t (k INTEGER, v INTEGER)")
    // 12 separate INSERTs -> at least 12 small files (fragmentation
    // exactly as a DML-heavy workload produces it).
    for (i <- 0 until 12)
      g.execute(s"INSERT INTO cpt.t SELECT id + ${i * 1000}, id FROM range(1000)")
    val before = files("t")
    assert(before.size >= 12, s"expected >=12 fragments, got ${before.size}")
    val expected = rowsOf("t")

    val ex = explainFiles("t")
    assert(ex("files").toInt == before.size)
    assert(ex("compact_recommended") == "true",
      s"12 tiny fragments must trip the auto-threshold: $ex")

    val Payload.Select(labels, Seq(stats)) = g.execute("COMPACT TABLE cpt.t"): @unchecked
    assert(labels == Seq("files_in", "files_out", "rows_moved", "bytes_moved"))
    assert(stats(0) == before.size, s"all fragments under target must move: $stats")
    assert(stats(2) == 12000L, s"rows_moved: $stats")

    val after = files("t")
    assert(after.size < before.size, s"${before.size} -> ${after.size}")
    assert((after & before).isEmpty, "compacted files must be NEW files")
    assert(rowsOf("t") == expected, "rows changed across COMPACT")
    assert(explainFiles("t")("compact_recommended") == "false",
      "a just-compacted table must not re-recommend")
  }

  test("COMPACT is idempotent and a no-op reports zeros") {
    val before = files("t")
    val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE cpt.t"): @unchecked
    // everything already packed into ceil(bytes/target) files: with
    // tiny data that is ONE sub-target file -> nothing to do
    assert(stats(0) == 0 && stats(2) == 0L, s"$stats")
    assert(files("t") == before, "no-op must not rewrite anything")
  }

  test("TARGET caps output file size; at-or-above-target files survive untouched") {
    g.execute("CREATE TABLE cpt.big (k INTEGER, v STRING)")
    for (i <- 0 until 6)
      g.execute(
        s"INSERT INTO cpt.big SELECT id + ${i * 50000}, repeat(cast(id AS string), 8) " +
          "FROM range(50000)")
    val expected = rowsOf("big")
    val sizes = files("big").map { u =>
      java.nio.file.Files.size(java.nio.file.Paths.get(java.net.URI.create(u)))
    }
    // TARGET 1 (MB): only files STRICTLY UNDER the target participate
    // (the command's contract), so the expected output count derives
    // from the sub-target subset — a fragment that happens to reach
    // 1 MB stays in place and must not shift the expectation.
    val total = sizes.filter(_ < (1 << 20)).sum
    val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE cpt.big TARGET 1"): @unchecked
    val k = math.max(1, math.ceil(total.toDouble / (1 << 20)).toInt)
    assert(stats(1) == k, s"expected $k outputs for $total bytes at 1 MB: $stats")
    assert(rowsOf("big") == expected)
    // Second pass at the same target: every file is now ~target-sized
    // or the lone remainder — nothing under target except possibly
    // one bin, so a compact changes nothing material. Run with
    // TARGET 1 again and require rows stable regardless.
    g.execute("COMPACT TABLE cpt.big TARGET 1")
    assert(rowsOf("big") == expected)
  }

  test("COMPACT preserves an indexed table's range clustering") {
    // CREATE INDEX paid a full rewrite to make files range-disjoint
    // (min/max pruning + file-granular DML); a round-robin compact
    // would silently destroy that. With an index present, COMPACT
    // must re-pack by range on the indexed column.
    g.execute("CREATE TABLE cpt.idx (k INTEGER, v STRING)")
    g.execute("INSERT INTO cpt.idx SELECT id, repeat(cast(id AS string), 6) FROM range(20000)")
    g.execute("CREATE INDEX ik ON cpt.idx (k)")
    // fragment AGAIN after the index build, as DML rounds would
    for (i <- 1 until 12)
      g.execute(s"INSERT INTO cpt.idx SELECT id + ${i * 20000}, " +
        "repeat(cast(id AS string), 6) FROM range(20000)")
    val expected = rowsOf("idx")
    val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE cpt.idx TARGET 1"): @unchecked
    assert(stats(1).asInstanceOf[Number].intValue() >= 2,
      s"need >=2 outputs to observe clustering: $stats")
    assert(rowsOf("idx") == expected)
    // every file's [min(k), max(k)] range must be disjoint (k unique)
    val ranges = spark.table("cpt.idx")
      .groupBy(input_file_name().as("f"))
      .agg(org.apache.spark.sql.functions.min("k").as("lo"),
        org.apache.spark.sql.functions.max("k").as("hi"))
      .collect().map(r => (r.getAs[Number]("lo").longValue(),
        r.getAs[Number]("hi").longValue()))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"file ranges overlap after COMPACT: $ranges")
      case _ =>
    }
  }

  test("EXPLAIN COMPACT TABLE dry-runs the decision without moving a byte") {
    g.execute("CREATE TABLE cpt.xc (k INTEGER, v INTEGER)")
    for (i <- 0 until 6)
      g.execute(s"INSERT INTO cpt.xc SELECT id + ${i * 100}, id FROM range(100)")
    val before = files("xc")
    val Payload.Select(_, rows) = g.execute("EXPLAIN COMPACT TABLE cpt.xc"): @unchecked
    val m = rows.map(r => r.head.toString -> r(1).toString).toMap
    assert(m("would_run") == "true", m.toString)
    assert(m("files_under_target").toInt == before.size, m.toString)
    assert(m("files_out") == "1", m.toString)
    assert(m("layout").contains("round-robin"), m.toString)
    assert(files("xc") == before, "EXPLAIN must not move files")
    // indexed variant reports the range layout
    g.execute("CREATE INDEX ixc ON cpt.xc (k)")
    val Payload.Select(_, rows2) = g.execute("EXPLAIN COMPACT TABLE cpt.xc"): @unchecked
    val m2 = rows2.map(r => r.head.toString -> r(1).toString).toMap
    assert(m2("layout").contains("range-repartition on indexed column k"), m2.toString)
  }

  test("CSV-backed tables are rejected with a clear error") {
    val dir = java.nio.file.Files.createTempDirectory("cpt_csv").toFile
    val f = new java.io.File(dir, "c.csv")
    java.nio.file.Files.writeString(f.toPath, "a,b\n1,2\n3,4\n")
    g.execute(s"CREATE DATABASE csvdb LOCATION '${f.getAbsolutePath}'")
    val e = intercept[EngineException](g.execute("COMPACT TABLE csvdb.c"))
    assert(e.getMessage.contains("managed parquet"))
    g.execute("DROP DATABASE csvdb")
  }

  test("EXPLAIN FILES on a missing table errors like other EXPLAINs") {
    intercept[EngineException](g.execute("EXPLAIN FILES cpt.nope"))
  }
}
