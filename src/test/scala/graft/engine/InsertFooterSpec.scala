package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The footer-metadata fast path for bulk INSERT…SELECT auto-id
  * fills (FooterCounts): per-scan-partition row counts derived from
  * parquet row-group footers must reproduce EXACTLY what the stats
  * job would have measured — a wrong count breaks id density, which
  * these tests pin arithmetically (min/max/count-distinct/sum over a
  * multi-row-group, multi-split source). Also pins the negative
  * space: a filtered batch must NOT take the footer path (its counts
  * are not metadata-derivable) yet still assign dense ids.
  */
class InsertFooterSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS ftdb")
    val loc = java.nio.file.Files.createTempDirectory("graft_ftdb").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE ftdb LOCATION '$loc'")
    e
  }

  private def denseCheck(table: String, n: Long, firstId: Long): Unit = {
    val r = g.query(
      s"""SELECT COUNT(*) AS n, CAST(MIN(id) AS BIGINT) AS mn,
         |  CAST(MAX(id) AS BIGINT) AS mx,
         |  COUNT(DISTINCT id) AS nd, SUM(CAST(id AS BIGINT)) AS s
         |FROM $table""".stripMargin).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == firstId)
    assert(r.getLong(2) == firstId + n - 1)
    assert(r.getLong(3) == n)
    val lo = firstId; val hi = firstId + n - 1
    assert(r.getLong(4) == (lo + hi) * n / 2)
  }

  // A source parquet with many small row groups across several
  // files: the split planner and the midpoint rule both get real
  // work (splits that begin/end mid-file, zero-row splits).
  private lazy val srcDir: String = {
    val src = java.nio.file.Files.createTempDirectory("graft_ftsrc").toFile.getAbsolutePath
    spark.range(0, 120000).selectExpr("id AS k", "id * 2 AS v")
      .repartition(3)
      .write.option("parquet.block.size", 256 * 1024)
      .mode("overwrite").parquet(src)
    spark.read.parquet(src).createOrReplaceTempView("ft_src")
    src
  }

  test("multi-row-group pure projection takes the footer path and stays dense") {
    val src = srcDir
    val rgs = {
      import scala.jdk.CollectionConverters._
      new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sessionState.newHadoopConf())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.size finally r.close()
      }.sum
    }
    assert(rgs > 3, s"need a multi-row-group source for a real test, got $rgs")

    g.execute("CREATE TABLE ftdb.t (id INTEGER AUTO_INCREMENT, k INTEGER, v INTEGER)")
    val before = FooterCounts.hits.get()
    g.execute("INSERT INTO ftdb.t (k, v) SELECT k, v FROM ft_src")
    assert(FooterCounts.hits.get() == before + 1,
      "pure parquet projection must be served from footers")
    denseCheck("ftdb.t", 120000, 1)

    // Second batch continues the sequence (counter advanced by the
    // footer-derived count, not a measured one).
    g.execute("INSERT INTO ftdb.t (k, v) SELECT k, v FROM ft_src")
    assert(FooterCounts.hits.get() == before + 2)
    denseCheck("ftdb.t", 240000, 1)
  }

  test("filtered batch is excluded from the footer path but still dense") {
    srcDir
    g.execute("CREATE TABLE ftdb.tf (id INTEGER AUTO_INCREMENT, k INTEGER)")
    val before = FooterCounts.hits.get()
    g.execute("INSERT INTO ftdb.tf (k) SELECT k FROM ft_src WHERE k % 3 = 0")
    assert(FooterCounts.hits.get() == before,
      "a filter changes per-split counts — must fall back to the stats job")
    denseCheck("ftdb.tf", 40000, 1)
  }

  test("footer counts equal the stats job's per-partition counts") {
    // Direct parity of the two count sources on the same batch.
    srcDir
    import org.apache.spark.sql.functions._
    val df = spark.table("ft_src").select(col("k"), col("v"))
    val footer = FooterCounts.perPartitionCounts(spark, df)
      .getOrElse(fail("expected footer counts for a pure projection"))
    val measured = df.groupBy(spark_partition_id().as("p")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    footer.zipWithIndex.foreach { case (c, p) =>
      assert(measured.getOrElse(p, 0L) == c, s"partition $p")
    }
    assert(footer.sum == 120000)
  }
}
