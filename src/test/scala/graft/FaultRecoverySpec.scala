package graft

import graft.operators.{CoreQueries, Dedup, DistributedPrefix}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fault-recovery witness for the truncated-lineage state (round-13
  * verdict task 5): the engine's lazy localCheckpoints and persists
  * truncate lineage, so the recovery story has two distinct tiers and
  * this spec pins the one local mode can exercise:
  *
  *  - TASK failure BEFORE a checkpoint/persist block is final →
  *    Spark retries the task (maxFailures=2 in the fixture's
  *    `local[4, 2]` master) and the query completes with CORRECT
  *    results — pinned here by injecting exactly one task failure
  *    into q30 (both DistributedPrefix branches) and d13 (the
  *    4-consumer persist) and comparing against the clean run.
  *  - BLOCK loss AFTER materialization (executor death on a cluster)
  *    → lineage is truncated, so recovery is rerun-the-query, not
  *    silent recompute; the storage levels are 2-replica disk
  *    (DistributedPrefix.shared, Dedup's posting checkpoint,
  *    Engine.StagingLevel) so a SINGLE executor loss serves from the
  *    replica. Local mode has one block manager — replication is a
  *    no-op and block loss cannot be injected without killing the
  *    JVM — so that tier is a documented design property
  *    (2 replicas + fail-fast), not a local test.
  *
  * The injected fault is a value-deterministic flaky expression: it
  * throws on the FIRST invocation (per JVM) and passes its argument
  * through ever after, so a retried task recomputes identical values
  * — the exact semantics of a transient executor hiccup.
  */
class FaultRecoverySpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  /** One fault per arm(): concurrent tasks race to consume it, exactly
    * one attempt throws. */
  private def arm(n: Int = 1): Unit = FaultRecoverySpec.remaining.set(n)

  private def flaky(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = udf((s: String) => {
      if (FaultRecoverySpec.consume())
        throw new RuntimeException(
          s"${SparkFixture.InjectedFaultMarker} (FaultRecoverySpec)")
      s
    })
    f(c)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("sanity: maxFailures=2 retries an injected task failure to success") {
    import spark.implicits._
    arm()
    // aggregate OVER the flaky column — count(lit(1)) would let
    // column pruning drop the UDF and the fault would never fire
    val out = (1 to 100).toDF("x")
      .repartition(4)
      .select(flaky(col("x").cast("string")).as("s"))
      .agg(count(col("s"))).head.getLong(0)
    assert(out == 100L)
    assert(FaultRecoverySpec.remaining.get() <= 0, "the fault was never consumed")
  }

  test("q30 percentiles completes correctly through one task failure (sliced branch + recompute)") {
    val base = Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val clean = rows(CoreQueries.percentilesOn(base))
    // Force the distributed sliced plan (the checkpoint/recompute
    // machinery under test); sf0.001 would otherwise take the
    // single-window fast path.
    spark.conf.set(DistributedPrefix.SmallInputBytesKey, "0")
    try {
      val flaked = base.withColumn("g", flaky(col("g")))
      arm()
      val got = rows(CoreQueries.percentilesOn(flaked))
      assert(FaultRecoverySpec.remaining.get() <= 0, "the fault was never consumed")
      assert(got == clean, "post-recovery q30 result diverged from the clean run")
    } finally spark.conf.unset(DistributedPrefix.SmallInputBytesKey)
  }

  test("d13 span near-dup completes correctly through one task failure (4-consumer persist)") {
    val docs = Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val clean = rows(Dedup.spanMinhashDupsOn(docs, Dedup.NumHashes / 2, Dedup.MaxBandBucket))
    val flaked = docs.withColumn("text", flaky(col("text")))
    arm()
    val got = rows(Dedup.spanMinhashDupsOn(flaked, Dedup.NumHashes / 2, Dedup.MaxBandBucket))
    assert(FaultRecoverySpec.remaining.get() <= 0, "the fault was never consumed")
    assert(got == clean, "post-recovery d13 result diverged from the clean run")
  }

  test("a streaming microbatch retries an injected task failure (PII ingest twin)") {
    // The ingest-time scrub is the operator most exposed to transient
    // executor failures in production (it runs first, on every
    // document); one injected failure inside a microbatch must be
    // retried WITHIN the batch — the query completes and emits
    // exactly the clean rows, never a partial or duplicated batch.
    val clean = rows(graft.operators.Pii.piiScan(spark, dir))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val flaked = graft.operators.Pii.piiColumns(
      stream.select(col("doc_id"), flaky(col("text")).as("text")))
    arm()
    val q = flaked.writeStream.format("memory")
      .queryName("fault_pii").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = rows(spark.table("fault_pii"))
    assert(FaultRecoverySpec.remaining.get() <= 0, "the fault was never consumed")
    assert(got == clean, "post-recovery streaming scrub diverged from batch")
  }

  test("a persistent failure still fails loudly (no silent wrong answers)") {
    import spark.implicits._
    // More faults than retry budget: every attempt of some task throws.
    arm(1000)
    val e = intercept[Exception] {
      (1 to 100).toDF("x").repartition(4)
        .select(flaky(col("x").cast("string")).as("s"))
        .agg(count(col("s"))).head()
    }
    arm(0)
    assert(e.getMessage != null)
  }
}

object FaultRecoverySpec {
  /** Remaining injected faults; executor-side in local mode (same
    * JVM). CAS loop so concurrent tasks consume each fault once. */
  val remaining = new java.util.concurrent.atomic.AtomicInteger(0)

  def consume(): Boolean = {
    while (true) {
      val c = remaining.get()
      if (c <= 0) return false
      if (remaining.compareAndSet(c, c - 1)) return true
    }
    false
  }
}
