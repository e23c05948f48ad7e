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

  test("mixed sizes: an overlapping at-target neighbor joins the indexed rewrite " +
      "so disjointness stays GLOBAL") {
    // Round-15 advice: range-repartitioning only the sub-target files
    // among themselves keeps them disjoint from EACH OTHER but not
    // from untouched >=target files. With an index present, a big
    // file whose key range overlaps the small-file span must join the
    // rewrite — global disjointness is the property CREATE INDEX paid
    // a full rewrite for.
    g.execute("CREATE TABLE cpt.mix (k INTEGER, v STRING)")
    // One big file covering the whole key space: ~60k rows of 64
    // low-compressibility chars lands >1 MB after snappy. The INSERT
    // itself may split across write tasks, so pack it to a single
    // at-target file with a default-target COMPACT first.
    g.execute("INSERT INTO cpt.mix SELECT id, concat(md5(cast(id AS string)), " +
      "md5(cast(id + 7 AS string))) FROM range(60000)")
    g.execute("CREATE INDEX imix ON cpt.mix (k)")
    g.execute("COMPACT TABLE cpt.mix")
    val bigSizes = files("mix").map { u =>
      java.nio.file.Files.size(java.nio.file.Paths.get(java.net.URI.create(u)))
    }
    assert(bigSizes.exists(_ >= (1 << 20)),
      s"fixture needs at least one >=1 MB file, got $bigSizes")
    // Small fragments INTERLEAVED across the big file's key range —
    // the exact overlap the subset-only rewrite cannot fix.
    for (i <- 1 to 8)
      g.execute(s"INSERT INTO cpt.mix SELECT id * 30 + $i, " +
        "md5(cast(id AS string)) FROM range(2000)")
    val expected = rowsOf("mix")
    // dry run surfaces the neighbor price before it is paid
    val Payload.Select(_, xc) = g.execute("EXPLAIN COMPACT TABLE cpt.mix TARGET 1"): @unchecked
    val xm = xc.map(r => r.head.toString -> r(1).toString).toMap
    assert(xm("files_at_target_included").toInt >= 1,
      s"the overlapping big file must be included: $xm")
    val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE cpt.mix TARGET 1"): @unchecked
    assert(stats(2) == (60000L + 8 * 2000L), s"every row must move (big file included): $stats")
    assert(rowsOf("mix") == expected, "rows changed across mixed-size COMPACT")
    val ranges = spark.table("cpt.mix")
      .groupBy(input_file_name().as("f"))
      .agg(org.apache.spark.sql.functions.min("k").as("lo"),
        org.apache.spark.sql.functions.max("k").as("hi"))
      .collect().map(r => (r.getAs[Number]("lo").longValue(),
        r.getAs[Number]("hi").longValue()))
      .sortBy(_._1)
    assert(ranges.length >= 2, s"need >=2 files to observe disjointness: ${ranges.toSeq}")
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"GLOBAL file ranges overlap after COMPACT: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("SET @auto_compact = true keeps file count bounded across DML rounds") {
    g.execute("CREATE TABLE cpt.ac (k INTEGER, v INTEGER)")
    g.execute("SET @auto_compact = true")
    try {
      // 24 INSERT rounds + a CoW UPDATE: without the hook this
      // fragments to 25+ files; with it, every mutation re-checks the
      // EXPLAIN FILES threshold after its swap and compacts inline,
      // so the count stays under the recommendation floor + one
      // round's worth of fresh appends.
      for (i <- 0 until 24)
        g.execute(s"INSERT INTO cpt.ac SELECT id + ${i * 1000}, id FROM range(1000)")
      g.execute("UPDATE cpt.ac SET v = v + 1 WHERE k < 500")
      val n = files("ac").size
      assert(n < Engine.CompactRecommendMinSmallFiles + 4,
        s"auto_compact must keep fragmentation bounded, got $n files")
      assert(explainFiles("ac")("compact_recommended") == "false",
        "a hook-maintained table must never sit in the recommended-and-ignored state")
      // rows exact: 24k inserts, k<500 bumped by 1
      val Payload.Select(_, Seq(Seq(cnt, sv))) =
        g.execute("SELECT count(*), sum(v) FROM cpt.ac"): @unchecked
      assert(cnt == 24000L, s"count $cnt")
      assert(sv == 24L * (0L until 1000L).sum + 500L, s"sum(v) $sv")
      // the session can audit what maintenance happened
      val Payload.Select(_, Seq(Seq(rep))) =
        g.execute("SELECT @last_auto_compact AS r"): @unchecked
      assert(rep.toString.startsWith("files_in="), s"audit var: $rep")
    } finally g.execute("SET @auto_compact = false")
    // hook OFF again: fragmentation accrues undisturbed
    val before = files("ac").size
    for (i <- 0 until 3)
      g.execute(s"INSERT INTO cpt.ac SELECT id + ${24000 + i * 10}, id FROM range(10)")
    assert(files("ac").size >= before + 3, "auto_compact=false must not compact")
  }

  test("INSERT-as-CTE-source runs the auto_compact hook too (round-16 verdict task 4)") {
    g.execute("CREATE TABLE cpt.cte (k INTEGER, v INTEGER)")
    g.execute("SET @auto_compact = true")
    try {
      // 24 CTE-INSERT rounds append files exactly like statement
      // INSERT — before the fix this path skipped the hook and an
      // auto_compact user's table fragmented through precisely the
      // path the feature exists for.
      for (i <- 0 until 24) {
        val Payload.Select(_, Seq(Seq(n))) = g.execute(
          s"WITH w AS (INSERT INTO cpt.cte SELECT id + ${i * 1000}, id FROM range(1000)) " +
            "SELECT count(*) FROM w"): @unchecked
        assert(n == 1000L, s"round $i inserted $n")
      }
      val n = files("cte").size
      assert(n < Engine.CompactRecommendMinSmallFiles + 4,
        s"auto_compact must bound CTE-INSERT fragmentation, got $n files")
      assert(explainFiles("cte")("compact_recommended") == "false")
      val Payload.Select(_, Seq(Seq(cnt))) =
        g.execute("SELECT count(*) FROM cpt.cte"): @unchecked
      assert(cnt == 24000L, s"count $cnt")
    } finally g.execute("SET @auto_compact = false")
  }

  test("COMPACT routes on keyword boundaries: tabs and extra spaces reach the command") {
    g.execute("CREATE TABLE cpt.ws (k INTEGER)")
    g.execute("INSERT INTO cpt.ws VALUES (1)")
    g.execute("INSERT INTO cpt.ws VALUES (2)")
    val Payload.Select(labels, _) = g.execute("COMPACT\tTABLE  cpt.ws"): @unchecked
    assert(labels == Seq("files_in", "files_out", "rows_moved", "bytes_moved"))
    // a table whose name merely starts with COMPACT must NOT route here
    g.execute("CREATE TABLE cpt.compaction_log (k INTEGER)")
    g.execute("INSERT INTO cpt.compaction_log VALUES (9)")
    val Payload.Select(_, rows) = g.execute("SELECT k FROM cpt.compaction_log"): @unchecked
    assert(rows == Seq(Seq(9)))
  }

  test("zero-row fragments are visible to EXPLAIN FILES and removed by COMPACT") {
    // Round-15 advice: the old row-scan listing (input_file_name over
    // rows) could not see a parquet file with no rows, so EXPLAIN
    // FILES undercounted and COMPACT never cleaned them. Plant one
    // the way a zero-row INSERT or an aborted writer would leave it.
    g.execute("CREATE TABLE cpt.zr (k INTEGER, v INTEGER)")
    for (i <- 0 until 3)
      g.execute(s"INSERT INTO cpt.zr SELECT id + ${i * 10}, id FROM range(10)")
    val withRows = explainFiles("zr")("files").toInt
    // write an EMPTY parquet part file into the table directory
    val tdir = java.nio.file.Paths.get(java.net.URI.create(files("zr").head)).getParent
    val tmp = java.nio.file.Files.createTempDirectory("zr_empty")
    spark.table("cpt.zr").limit(0).coalesce(1).write
      .mode("overwrite").parquet(tmp.toString)
    val moved = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(tmp)
      try s.iterator().asScala
        .find(p => p.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    java.nio.file.Files.move(moved, tdir.resolve("part-empty-zr.parquet"))
    spark.catalog.refreshTable("cpt.zr")
    assert(explainFiles("zr")("files").toInt == withRows + 1,
      "directory listing must count the zero-row fragment")
    val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE cpt.zr"): @unchecked
    assert(stats(0) == withRows + 1, s"the empty fragment must join the rewrite: $stats")
    assert(explainFiles("zr")("files").toInt < withRows, "compacted layout")
    val Payload.Select(_, Seq(Seq(cnt))) =
      g.execute("SELECT count(*) FROM cpt.zr"): @unchecked
    assert(cnt == 30L, s"rows preserved: $cnt")
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
