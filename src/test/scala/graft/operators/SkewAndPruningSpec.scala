package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale mechanics made observable on local data: salted joins return
  * exactly the plain-join result, salted distinct-count is exact, and
  * index-clustered parquet layout actually prunes row groups (the
  * engine's CREATE INDEX story measured via scan metrics). */
class SkewAndPruningSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  import spark.implicits._

  test("salted join equals plain join under heavy key skew") {
    // 10k fact rows, 90% on one hot key
    val fact = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 5).as("k"),
        col("id").as("payload"))
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"),
      (4L, "four"), (7L, "seven")).toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "k").groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("seven") == 9000L)
  }

  test("salted distinct count is exact") {
    val df = spark.range(20000)
      .select((col("id") % 3).as("k"), (col("id") % 1234).as("v"))
    val expected = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(df, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == expected)
  }

  test("clustered layout prunes parquet row groups on range predicates") {
    val tmp = java.nio.file.Files.createTempDirectory("prune").toFile
    // small row groups so a 1M-row table has many prunable groups
    spark.range(1000000).select(col("id").as("k"), rand(42).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(s"$tmp/t")
    val scan = spark.read.parquet(s"$tmp/t").filter(col("k").between(1000, 2000))
    assert(scan.count() == 1001)
    val scanNode = scan.queryExecution.executedPlan.collectLeaves().head
    val rowsRead = scanNode.metrics("numOutputRows").value
    // without row-group pruning the scan would surface all 1M rows to
    // the filter; with the clustered layout it reads a sliver
    assert(rowsRead < 200000, s"scan read $rowsRead rows — no pruning")
  }

  test("bucketed tables co-locate joins: no shuffle exchange in the plan") {
    // The pre-shuffle strategy for repeated big-big joins at scale:
    // both sides bucketed+sorted on the join key join with zero
    // exchanges (sort-merge directly over bucket files).
    spark.sql("DROP TABLE IF EXISTS bleft")
    spark.sql("DROP TABLE IF EXISTS bright")
    spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bleft")
    spark.range(50000).select(col("id").as("k"), (col("id") + 7).as("w"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bright")
    // force the shuffle-join path (small test tables would otherwise
    // auto-broadcast, which hides what bucketing buys)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bleft").join(spark.table("bright"), "k")
        .withColumn("s", col("v") + col("w"))
      assert(joined.count() == 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join: $plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles: $plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE bleft")
    spark.sql("DROP TABLE bright")
  }

  test("uuid() produces RFC-4122-shaped distinct values") {
    val ids = spark.sql("SELECT uuid() AS u FROM range(100)")
      .collect().map(_.getString(0))
    val re = "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}".r
    assert(ids.forall(u => re.pattern.matcher(u).matches()))
    assert(ids.distinct.length == 100)
  }
}
