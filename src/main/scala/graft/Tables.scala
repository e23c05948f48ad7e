package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (Parquet/Delta);
  * reading straight from parquet keeps the Catalyst source V2 path —
  * filter pushdown + column pruning reach the scan unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation", "supplier")

  /** Schema cache keyed by (dir, table). Without an explicit schema,
    * EVERY spark.read.parquet launches a footer-inference job at
    * DataFrame-build time (verified with the status tracker — one job
    * even for a single file); with it, building a scan costs zero
    * jobs. A battery query builds each of its tables once per run, so
    * this removes a ~50–100 ms job per table per query. The key is the
    * path alone: a DIFFERENT dir misses the cache, but regenerating
    * data in place at the same path serves the stale schema for the
    * rest of the JVM — in-place regeneration requires a JVM restart
    * (acceptable: testdata is immutable within a round). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def cachedSchema(spark: SparkSession, path: String): StructType =
    schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)

  /** Opt-in HOT-TABLE mode for the small-query floor: q2/q29-class
    * queries on local[32] are dominated by the fixed cost of a cold
    * parquet scan job (~70–100 ms) against a native engine's ~80 µs
    * point read (BASELINE.md names cached-hot-table serving as the
    * mitigation). Enabling pins the named tables as in-memory
    * columnar caches (materialized eagerly, so the first query isn't
    * the loading pass) and [[t]] serves them for every later read of
    * the same (dir, table). Deliberately NOT default-on: the round-2
    * controlled experiment showed blanket caching makes string-heavy
    * operators up to 40× slower once the storage pool churns, so the
    * battery's recorded numbers stay cold-scan honest and the mode is
    * a serving-layer switch ([[Bench]] honors SPARK_GRAFT_HOT_TABLES;
    * README records cold AND warm). Scope to the RELATIONAL tables —
    * corpus text/embeddings are the churn case. */
  private val hotTables =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Default hot set: the TPC-H-ish relational tables (dims + facts),
    * not the corpus text/media tables. */
  val defaultHotSet: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def enableHotTables(spark: SparkSession, dir: String,
                      names: Seq[String] = defaultHotSet): Unit =
    names.filterNot(_ == "events").foreach { n =>
      hotTables.computeIfAbsent(s"$dir/$n", _ => {
        val df = t(spark, dir, n)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
        df
      })
    }

  def disableHotTables(): Unit = {
    hotTables.values.forEach(df => { df.unpersist(blocking = false); () })
    hotTables.clear()
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val hot = hotTables.get(s"$dir/$name")
    if (hot != null) hot
    else if (name == "events") {
      // events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
      // parquet reader rejects outright (PARQUET_TYPE_ILLEGAL — this
      // silently killed every e-query in round 1). Read nanos as a
      // long and truncate to a µs timestamp; the DuckDB oracles use
      // epoch_us(ts), which truncates identically, so values match.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$dir/events.parquet"
      spark.read.schema(cachedSchema(spark, path)).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      val path = s"$dir/$name.parquet"
      spark.read.schema(cachedSchema(spark, path)).parquet(path)
    }
  }

  /** Raw events schema (ts as nanos-long) for the streaming reader,
    * which must declare the on-disk schema, not the converted one. */
  def rawEventsSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cachedSchema(spark, s"$dir/events.parquet")
  }

  /** Register every table as a temp view (for SQL-path queries).
    * Idempotent per (session, dir) and cached: a battery run calls
    * this from every facade query, and re-registering re-reads ten
    * parquet footers each time — measured at ~0.5–1 s per call, which
    * dominated f2-style short queries. A different dir re-registers
    * (last one wins, same as before). */
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir) {
      all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
      registeredDir.put(spark, dir)
    }
}
