package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.functions.{col, input_file_name, max, min}
import org.scalatest.funsuite.AnyFunSuite

/** Post-compact pruning PAYOFF witness (round-15 verdict task 5).
  *
  * CompactTableSpec pins that index-aware COMPACT leaves files
  * range-disjoint; this spec proves why that is worth paying for: a
  * point predicate on the indexed column materializes only the row
  * groups whose parquet min/max admit the key. The observable is the
  * SCAN's own `numOutputRows` metric — Spark's parquet reader applies
  * pushed predicates at row-group/page granularity and (with
  * record-level filtering off, the default) emits every row of the
  * surviving groups for the Filter node to re-check, so scan output
  * rows == rows NOT skipped by statistics. On the fragmented layout
  * every fragment spans the whole key space and nothing is skipped;
  * on the compacted layout only the one covering file survives. At
  * 100 TB this is the difference between a point lookup reading the
  * table and reading one file.
  */
class CompactPruningSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS cpr")
    val loc = java.nio.file.Files.createTempDirectory("cpr").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE cpr LOCATION '$loc'")
    e
  }

  /** Rows the parquet scan MATERIALIZED for this predicate (statistics
    * pruning already applied, record-level re-filter not yet). */
  private def scanRows(pred: org.apache.spark.sql.Column): Long = {
    val df = spark.table("cpr.t").where(pred)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet FileSourceScanExec leaf")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  /** (lo, hi, rows) per data file — the range-overlap bound's inputs. */
  private def fileRanges(): Seq[(Long, Long, Long)] =
    spark.table("cpr.t")
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getAs[Number]("lo").longValue(),
        r.getAs[Number]("hi").longValue(), r.getAs[Long]("n"))).toSeq

  test("point predicate: scan materialization collapses to the range-overlap bound after COMPACT") {
    g.execute("CREATE TABLE cpr.t (k INTEGER, v STRING)")
    // Keys are SHUFFLED within each batch (multiplicative permutation
    // mod 10000 — 104729 is prime): the insert path splits a batch
    // into several write tasks by CONTIGUOUS id range, and a monotone
    // key would hand each written file a narrow disjoint key span —
    // i.e. an accidentally prunable layout. Real DML fragments span
    // the key space; the permutation reproduces that worst case.
    def batch(i: Int) =
      s"INSERT INTO cpr.t SELECT cast(pmod(id * 104729, 10000) * 12 + $i AS int), " +
        "concat(md5(cast(id AS string)), md5(cast(id + 3 AS string))) FROM range(10000)"
    g.execute(batch(0))
    g.execute("CREATE INDEX ik ON cpr.t (k)")
    // Fragment AFTER the index build, as DML rounds would: 11 more
    // full-key-range batches — every fragment's [min,max] admits every
    // key, a layout stats-based pruning cannot help.
    for (i <- 1 until 12) g.execute(batch(i))
    val total = 120000L
    val key = 60000 // = 5000*12, present in fragment 0

    val before = scanRows(col("k") === key)
    assert(before > total / 2,
      s"fragmented layout must defeat pruning (scan ~all rows), got $before of $total")

    val Payload.Select(_, Seq(stats)) = g.execute("COMPACT TABLE cpr.t TARGET 1"): @unchecked
    assert(stats(1).asInstanceOf[Number].intValue() >= 3,
      s"need >=3 output files for an observable payoff: $stats")

    // The range-overlap bound: rows of exactly the files whose
    // [min,max] covers the key. Disjointness makes that ONE file.
    val ranges = fileRanges()
    val covering = ranges.filter { case (lo, hi, _) => lo <= key && key <= hi }
    assert(covering.size == 1,
      s"disjoint layout: exactly one file covers $key, got $covering")
    val bound = covering.map(_._3).sum

    val after = scanRows(col("k") === key)
    assert(after <= bound,
      s"post-compact scan ($after rows) must not exceed the range-overlap bound ($bound)")
    assert(after * 3 <= before,
      s"pruning payoff missing: before=$before after=$after bound=$bound")

    // result correctness unchanged, for the record
    val hits = spark.table("cpr.t").where(col("k") === key).count()
    assert(hits == 1L, s"key $key occurs once, got $hits")
  }
}
