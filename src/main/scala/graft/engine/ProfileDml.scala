package graft.engine

import org.apache.spark.sql.SparkSession

/** Top-rung DML witness (round-15 verdict task 1): UPDATE / DELETE /
  * fragmentation / COMPACT measured on the sf10 corpus — 60 M-row
  * lineitem — with the file-granularity claim RECORDED, not asserted.
  * Everything before this ran the write path at sf1 and below; this
  * is the rung where "a selective UPDATE touches O(matching range)
  * files" either shows up in the file sets or doesn't.
  *
  * Phases (one JSON line each, `ALL OK` + exit 0 at the end):
  *   load     — lineitem loaded through 16 INSERT…SELECT chunks into
  *              a managed table (the multi-file layout a real ingest
  *              produces), then CREATE INDEX on okey: the clustered
  *              rewrite that makes files range-disjoint;
  *   update   — a ~1%-of-keys UPDATE on the indexed column: wall
  *              time, rows matched, and files rewritten vs total
  *              (the CoW granularity claim, measured from the file
  *              sets before/after);
  *   delete   — a broad DELETE (predicate UNcorrelated with the
  *              clustered key, ~2% of rows in ~every file): the
  *              honest worst case where file granularity cannot
  *              help and every file holding a match is rewritten;
  *   fragment — 12 small DML rounds (INSERT + ranged UPDATE) to
  *              fragment the table, EXPLAIN FILES verdict recorded;
  *   compact  — COMPACT TABLE with the index present (range
  *              re-pack): wall, files in/out, and the point-lookup
  *              latency before/after;
  *   parity   — bit-exact fingerprints: COMPACT must change nothing,
  *              UPDATE/DELETE must change exactly what they claimed
  *              (checked against directly-computed Spark oracles on
  *              the same data).
  *
  * Run: `SPARK_DRIVER_MEM=16g sbt "runMain graft.engine.ProfileDml
  * localdata/sf10"` (defaults to sf10; any sf dir works).
  */
object ProfileDml {

  private var failures = 0
  private def check(name: String)(body: => Unit): Unit =
    try { body; println(s"OK   $name") }
    catch { case e: Throwable =>
      failures += 1
      println(s"FAIL $name: ${e.getMessage}")
      e.getStackTrace.take(6).foreach(f => println(s"     at $f"))
    }
  private def j(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "localdata/sf10"
    val chunks = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-dml-witness")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.registerAll(spark, sfDir)
    val g = new Engine(spark)
    g.execute("DROP DATABASE IF EXISTS dmlw")
    val loc = java.nio.file.Files.createTempDirectory("graft_dmlw").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE dmlw LOCATION '$loc'")
    g.execute("CREATE TABLE dmlw.li (okey INTEGER, pkey INTEGER, lnum INTEGER, " +
      "qty FLOAT, price FLOAT, disc FLOAT, rflag TEXT, mode TEXT, comment TEXT)")

    def files(): Set[String] =
      spark.table("dmlw.li").inputFiles.toSet
    def explainFiles(): Map[String, String] = {
      val Payload.Select(_, rows) = g.execute("EXPLAIN FILES dmlw.li"): @unchecked
      rows.map(r => r.head.toString -> r(1).toString).toMap
    }
    /** Order-free bit-exact fingerprint over all columns. */
    def fingerprint(): Seq[Any] =
      g.query("SELECT count(*) AS n, bit_xor(xxhash64(okey, pkey, lnum, qty, " +
        "price, disc, rflag, mode, comment)) AS h FROM dmlw.li").head.toSeq
    /** The q1-shape aggregate — the battery query this table answers.
      * Sums go through DECIMAL so the comparison is exact and
      * independent of partition-level FP addition order (a layout
      * change like COMPACT reorders double accumulation). */
    def aggregate(): Seq[Seq[Any]] =
      g.query("SELECT rflag, count(*) AS n, " +
        "sum(CAST(qty AS DECIMAL(18,2))) AS sq, " +
        "sum(CAST(price AS DECIMAL(18,2))) AS sp " +
        "FROM dmlw.li GROUP BY rflag ORDER BY rflag").collect().map(_.toSeq).toSeq

    // ----------------------------- load ---------------------------
    val maxKey = spark.sql("SELECT max(l_orderkey) FROM lineitem").head.getLong(0)
    var loadS = 0.0; var indexS = 0.0; var total0 = 0
    check("load: 16-chunk ingest + CREATE INDEX clustered rewrite") {
      val step = maxKey / chunks + 1
      val (_, lS) = timed {
        for (i <- 0 until chunks)
          // mode/comment are synthesized: the DataGen lineitem carries
          // l_linestatus + l_shipdate, not TPC-H's shipmode/comment
          g.execute("INSERT INTO dmlw.li SELECT l_orderkey, l_partkey, l_linenumber, " +
            "l_quantity, l_extendedprice, l_discount, l_returnflag, l_linestatus, " +
            "CONCAT('shipped ', CAST(l_shipdate AS TEXT)) " +
            s"FROM lineitem WHERE l_orderkey >= ${i * step} AND l_orderkey < ${(i + 1) * step}")
      }
      loadS = lS
      val (_, iS) = timed(g.execute("CREATE INDEX iok ON dmlw.li (okey)"))
      indexS = iS
      total0 = files().size
      val ex = explainFiles()
      val nLoaded = fingerprint().head.asInstanceOf[Long]
      println(s"""{"phase":"load","rows":$nLoaded,"load_s":${j(loadS)},""" +
        s""""index_s":${j(indexS)},"files":$total0,"bytes":${ex("bytes")}}""")
      // guard against a vacuous witness: every later phase's row and
      // file assertions pass trivially on an empty table
      assert(nLoaded == spark.table("lineitem").count(),
        s"ingest dropped rows: $nLoaded loaded")
      assert(total0 > 8, s"expected a multi-file layout, got $total0 files")
    }

    // --------------------------- update ---------------------------
    // ~1% of the key space on the INDEXED column: with range-disjoint
    // files this must touch ~1% of files, not the table.
    val lo = maxKey / 2
    val hi = lo + maxKey / 100
    var updRows = 0L
    check("update: selective 1%-key-range UPDATE is file-granular") {
      val before = files()
      // the oracle for "rows the predicate matches", computed directly
      val expect = spark.table("dmlw.li")
        .where(s"okey >= $lo AND okey < $hi").count()
      val (p, wall) = timed(g.execute(
        s"UPDATE dmlw.li SET comment = 'audited-r16' WHERE okey >= $lo AND okey < $hi"))
      val Payload.Update(n) = p: @unchecked
      updRows = n
      val after = files()
      val rewritten = (before -- after).size
      val totalRows = spark.table("dmlw.li").count()
      println(s"""{"phase":"update","wall_s":${j(wall)},"rows_matched":$n,""" +
        s""""files_rewritten":$rewritten,"files_total":${before.size},""" +
        s""""row_fraction":${j(n.toDouble / totalRows)},""" +
        s""""file_fraction":${j(rewritten.toDouble / before.size)}}""")
      assert(n == expect, s"UPDATE matched $n rows, oracle says $expect")
      // file-granularity claim: ~1% of keys may straddle a boundary
      // file on each side, never the table
      assert(rewritten <= math.ceil(before.size * 0.02) + 2,
        s"selective UPDATE rewrote $rewritten of ${before.size} files — not file-granular")
      val audited = g.query(
        "SELECT count(*) AS n FROM dmlw.li WHERE comment = 'audited-r16'").head.getLong(0)
      assert(audited == n, s"audited rows $audited != payload $n")
    }

    // --------------------------- delete ---------------------------
    var delRows = 0L
    check("delete: broad un-clustered DELETE, count exact") {
      val expect = spark.table("dmlw.li").where("qty < 2").count()
      val before = files()
      val (p, wall) = timed(g.execute("DELETE FROM dmlw.li WHERE qty < 2"))
      val Payload.Delete(n) = p: @unchecked
      delRows = n
      val after = files()
      println(s"""{"phase":"delete","wall_s":${j(wall)},"rows_deleted":$n,""" +
        s""""files_rewritten":${(before -- after).size},"files_total":${before.size}}""")
      assert(n == expect, s"DELETE removed $n rows, oracle says $expect")
      val left = g.query("SELECT count(*) AS n FROM dmlw.li WHERE qty < 2").head.getLong(0)
      assert(left == 0L, s"$left matching rows survived the DELETE")
    }

    // -------------------------- fragment --------------------------
    check("fragment: 12 small DML rounds accrue fragmentation; EXPLAIN FILES recommends") {
      val before = files().size
      val (_, wall) = timed {
        for (i <- 0 until 12) {
          g.execute("INSERT INTO dmlw.li SELECT l_orderkey, l_partkey, l_linenumber, " +
            s"l_quantity, l_extendedprice, l_discount, l_returnflag, l_linestatus, 'patch-$i' " +
            s"FROM lineitem WHERE l_orderkey >= ${i * 1000 + 1} AND l_orderkey < ${i * 1000 + 201}")
          g.execute(s"UPDATE dmlw.li SET disc = 0.0 " +
            s"WHERE okey >= ${(i + 20) * 1000} AND okey < ${(i + 20) * 1000 + 200}")
        }
      }
      val ex = explainFiles()
      println(s"""{"phase":"fragment","wall_s":${j(wall)},"files_before":$before,""" +
        s""""files":${ex("files")},""" +
        s""""files_under_target":${ex(s"files_under_${Engine.DefaultCompactTargetMb}mb_target")},""" +
        s""""compact_recommended":${ex("compact_recommended")}}""")
      assert(ex("files").toInt >= before + 12,
        s"24 DML rounds must have fragmented the layout: $before -> ${ex("files")}")
      assert(ex("compact_recommended") == "true",
        s"the fragmented table must trip the auto-threshold: $ex")
    }

    // --------------------------- compact --------------------------
    def pointLookupS(): Double = (1 to 3).map { _ =>
      val (_, s) = timed(g.query(
        s"SELECT count(*) AS n, sum(price) AS sp FROM dmlw.li WHERE okey = $lo").collect())
      s
    }.min
    check("compact: indexed range re-pack, bit-exact parity, point lookup recorded") {
      val fpBefore = fingerprint()
      val aggBefore = aggregate()
      val exBefore = explainFiles()
      val pointBefore = pointLookupS()
      val (p, wall) = timed(g.execute("COMPACT TABLE dmlw.li"))
      val Payload.Select(_, Seq(stats)) = p: @unchecked
      val exAfter = explainFiles()
      val pointAfter = pointLookupS()
      val fpAfter = fingerprint()
      println(s"""{"phase":"compact","wall_s":${j(wall)},""" +
        s""""files_in":${stats(0)},"files_out":${stats(1)},"rows_moved":${stats(2)},""" +
        s""""files_before":${exBefore("files")},"files_after":${exAfter("files")},""" +
        s""""point_lookup_before_s":${j(pointBefore)},"point_lookup_after_s":${j(pointAfter)},""" +
        s""""recommended_after":${exAfter("compact_recommended")}}""")
      assert(fpBefore == fpAfter, s"COMPACT changed data: $fpBefore -> $fpAfter")
      assert(aggregate() == aggBefore, "q1-shape aggregate drifted across COMPACT")
      assert(exAfter("compact_recommended") == "false", "compacted table must not re-recommend")
    }

    // --------------------------- parity ---------------------------
    check("parity: engine results == direct-Spark oracles on the mutated table") {
      // the engine's q1-shape answer vs the same computed without the
      // engine, on the post-DML table — the hash-green analog for a
      // table whose content the DML session itself defined
      val direct = spark.table("dmlw.li")
        .groupBy("rflag")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("qty").cast("decimal(18,2)")).as("sq"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("price").cast("decimal(18,2)")).as("sp"))
        .orderBy("rflag").collect().map(_.toSeq).toSeq
      assert(aggregate() == direct, "engine aggregate != direct Spark aggregate")
      val n = g.query("SELECT count(*) AS n FROM dmlw.li").head.getLong(0)
      assert(n == spark.table("dmlw.li").count(), "row count drifted")
    }

    g.execute("DROP DATABASE dmlw")
    spark.stop()
    if (failures > 0) { println(s"$failures FAILED"); sys.exit(1) }
    else println("ALL OK")
  }
}
