package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run (JVM-wide —
  * Spark session startup is ~5 s, per-suite sessions would dominate
  * test time). Never stopped; the forked test JVM exits. */
object SparkFixture {
  lazy val session: SparkSession = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_test_wh").toFile
    // local[4, 2]: maxFailures=2 enables ONE task retry, so
    // FaultRecoverySpec can inject a task failure and pin that
    // queries recover (plain local[N] fails the job on the first
    // task failure). Deterministic failures still fail — they just
    // retry once first.
    val s = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Smallest driver-provided dataset (TESTDATA.md). */
  val Sf0001 = "/root/testdata/sf0.001"
}
