package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-11 hardening of the table loaders:
  *  - a broken table costs ONLY its own queries (registerAll fault
  *    isolation — round 10 lost documents-only operators to an
  *    events-table schema drift);
  *  - preflight names exactly the unreadable tables;
  *  - the schema cache is keyed by (path, mtime), so regenerating a
  *    parquet in place serves the new schema, not a JVM-lifetime
  *    stale one;
  *  - events.ts normalizes to a session-tz TIMESTAMP from every
  *    on-disk generation (nanos long, TIMESTAMP_NTZ, TIMESTAMP).
  */
class TablesFaultSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  /** A minimal testdata dir: real documents + a deliberately corrupt
    * events.parquet (not a parquet at all). */
  private def corruptDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fault").toFile
    for (t <- Tables.all) {
      val src = new java.io.File(s"${SparkFixture.Sf0001}/$t.parquet")
      val dst = new java.io.File(dir, s"$t.parquet")
      if (t == "events")
        java.nio.file.Files.write(dst.toPath, "not a parquet file".getBytes)
      else
        java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    dir.getAbsolutePath
  }

  test("registerAll survives one broken table; healthy tables still queryable") {
    // Pre-register the healthy dir so the broken re-registration must
    // DROP the stale events view (silently serving the previous dir's
    // data would be the worst failure mode).
    Tables.registerAll(spark, SparkFixture.Sf0001)
    val dir = corruptDir()
    Tables.registerAll(spark, dir) // must not throw
    // Healthy table registered and readable.
    assert(spark.sql("SELECT count(*) AS n FROM documents").head.getLong(0) > 0)
    // The broken table's queries fail individually (view absent),
    // instead of poisoning the whole catalog.
    val err = intercept[Exception](spark.sql("SELECT * FROM events").collect())
    assert(err.getMessage.toLowerCase.contains("events"))
    // Restore the shared session's view registrations for later suites.
    Tables.registerAll(spark, SparkFixture.Sf0001)
    assert(spark.sql("SELECT count(*) FROM events").head.getLong(0) > 0)
  }

  test("a table fixed in place gets its view back on the next registerAll") {
    // Round-11 ADVICE: a partial sweep must NOT record the dir as
    // registered — otherwise fixing the broken parquet at the same
    // path leaves the dropped view missing for the JVM lifetime
    // while preflight (which bypasses the catalog) reports healthy.
    val dir = corruptDir()
    Tables.registerAll(spark, dir)
    intercept[Exception](spark.sql("SELECT * FROM events").collect())
    // Fix the broken file in place (same path, same dir).
    java.nio.file.Files.copy(
      new java.io.File(s"${SparkFixture.Sf0001}/events.parquet").toPath,
      new java.io.File(s"$dir/events.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Tables.registerAll(spark, dir) // must retry, not idempotence-skip
    assert(spark.sql("SELECT count(*) FROM events").head.getLong(0) > 0)
    Tables.registerAll(spark, SparkFixture.Sf0001)
  }

  test("preflight names exactly the unreadable tables") {
    val dir = corruptDir()
    val bad = Tables.preflight(spark, dir)
    assert(bad.map(_._1) == Seq("events"))
    assert(Tables.preflight(spark, SparkFixture.Sf0001).isEmpty)
  }

  test("schema cache serves the NEW schema after in-place regeneration") {
    val dir = java.nio.file.Files.createTempDirectory("graft_regen").toFile
    val p = new java.io.File(dir, "customer.parquet")
    import spark.implicits._
    def writeAs(df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = new java.io.File(dir, "stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles.filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, p.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeAs(Seq((1L, "a")).toDF("id", "name"))
    assert(Tables.t(spark, dir.getAbsolutePath, "customer")
      .schema.fieldNames.toSeq == Seq("id", "name"))
    // Regenerate in place with a different schema; force a distinct
    // mtime (ms granularity) so the (path, mtime) key misses.
    writeAs(Seq((1L, "a", 2.0)).toDF("id", "name", "score"))
    p.setLastModified(p.lastModified() + 5000)
    assert(Tables.t(spark, dir.getAbsolutePath, "customer")
      .schema.fieldNames.toSeq == Seq("id", "name", "score"))
  }

  test("normalizeEventTs: nanos long, NTZ, and TIMESTAMP all land on TimestampType") {
    import spark.implicits._
    val fromLong = Tables.normalizeEventTs(
      Seq(1723500000000000000L).toDF("ts"))
    assert(fromLong.schema("ts").dataType == TimestampType)
    // 2024-08-12T22:00:00Z in nanos → truncated µs instant.
    assert(fromLong.select(unixMicros).head.getLong(0) == 1723500000000000L)

    val ntz = spark.sql("SELECT TIMESTAMP_NTZ'2024-08-12 22:00:00' AS ts")
    val fromNtz = Tables.normalizeEventTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    // UTC session tz: the naive value is read as the same instant.
    assert(fromNtz.select(unixMicros).head.getLong(0) == 1723500000000000L)

    val already = spark.sql("SELECT TIMESTAMP'2024-08-12 22:00:00Z' AS ts")
    assert(Tables.normalizeEventTs(already).schema("ts").dataType == TimestampType)
  }

  private def unixMicros =
    org.apache.spark.sql.functions.unix_micros(
      org.apache.spark.sql.functions.col("ts"))
}
