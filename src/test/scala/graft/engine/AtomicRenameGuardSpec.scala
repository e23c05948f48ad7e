package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** COMPACT's rename-atomicity probe (round-17 verdict task 5).
  *
  * The staged swap assumes atomic same-directory rename; raw object
  * stores implement rename as copy+delete, where the swap would
  * CORRUPT (readers observing half-copied files, crash states the
  * manifest protocol never enumerated) rather than refuse. The engine
  * now checks the table's filesystem scheme against a documented
  * allowlist (file/hdfs/viewfs + the Hadoop conf extension
  * `graft.fs.atomic.rename.schemes`) before any rewrite work. This
  * spec mounts a database on `unatomicfs://` — a registered scheme
  * deliberately NOT allowlisted — and pins that COMPACT fails loudly
  * with the table bit-untouched, while DML (which never renames:
  * CoW is append + checked delete) still works there. */
class AtomicRenameGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.unatomicfs.impl", classOf[UnatomicTestFs].getName)
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS uat")
    val local = java.nio.file.Files.createTempDirectory("uat").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE uat LOCATION 'unatomicfs://$local'")
    e
  }

  test("COMPACT refuses loudly on a scheme without atomic rename; the table is untouched") {
    g.execute("CREATE TABLE uat.t (k INTEGER, v INTEGER)")
    for (i <- 0 until 4)
      g.execute(s"INSERT INTO uat.t SELECT id + ${i * 100}, id FROM range(100)")
    val before = spark.table("uat.t").inputFiles.toSet
    val rows = spark.table("uat.t").count()
    val err = intercept[EngineException](g.execute("COMPACT TABLE uat.t"))
    assert(err.getMessage.contains("atomic-rename allowlist"), err.getMessage)
    assert(err.getMessage.contains("unatomicfs"), "the error must name the scheme")
    assert(err.getMessage.contains("graft.fs.atomic.rename.schemes"),
      "the error must name the conf escape hatch")
    spark.catalog.refreshTable("uat.t")
    assert(spark.table("uat.t").inputFiles.toSet == before,
      "a refused COMPACT must not move a byte")
    assert(spark.table("uat.t").count() == rows)
  }

  test("CoW DML still works there — the staged swap FALLS BACK to direct append+delete") {
    // On an atomic-rename store the CoW rewrite goes through the
    // manifest-bracketed staged swap; here that protocol would be
    // built on a copy+delete "rename", so stagedDmlSwap detects the
    // scheme and keeps the legacy direct path (correct end state,
    // documented visible-duplicates window).
    val Payload.Update(nu) =
      g.execute("UPDATE uat.t SET v = v + 1 WHERE k < 50"): @unchecked
    assert(nu == 50L)
    val Payload.Delete(nd) = g.execute("DELETE FROM uat.t WHERE k >= 350"): @unchecked
    assert(nd == 50L)
    assert(spark.table("uat.t").count() == 350L)
  }

  test("the conf extension admits a scheme a deployment vouches for") {
    spark.sparkContext.hadoopConfiguration
      .set("graft.fs.atomic.rename.schemes", "graftfs,unatomicfs")
    try {
      val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE uat.t"): @unchecked
      def asL(a: Any): Long = a.asInstanceOf[Number].longValue
      assert(asL(stats(0)) >= 4, s"fragments must move once vouched: $stats")
      assert(spark.table("uat.t").count() == 350L)
    } finally spark.sparkContext.hadoopConfiguration
      .set("graft.fs.atomic.rename.schemes", "graftfs")
  }
}
