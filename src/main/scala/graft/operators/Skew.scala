package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution has hot
  * values — the hand tool for when AQE's runtime skew-join split
  * isn't available or a key is pathological (one key holding a double-
  * digit percentage of a 100 TB fact table).
  *
  * Measured guidance (round 17, [[ProfileSkewJoin]] on the planted
  * 30%-hot-key corpora): for a plain single-hot-key EQUI-join, AQE's
  * runtime split beats manual salting at every rung tested
  * (sf1-skewed 1.22 s vs 2.20/5.62 s at salt 4/16; sf10-skewed
  * 10.1 s vs 10.4/13.7 s) — the dim-side replication is pure
  * overhead on top of the same shuffle. Reach for [[saltedJoin]]
  * only where AQE cannot act: skew-split-ineligible shapes,
  * AQE-off deployments, or non-equi composites.
  *
  * Salted equi-join: the fact side scatters each hot key over
  * `saltFactor` sub-keys; the dimension side replicates each row
  * `saltFactor` times so every sub-key finds its match. Results are
  * identical to the plain join; the hot key's rows now land on
  * `saltFactor` reducers instead of one.
  */
object Skew {

  /** Inner equi-join of `fact` ⋈ `dim` on `key`, salted. `dim` is
    * replicated `saltFactor`× — use for genuinely smaller right sides
    * (the usual skew case: huge fact, modest dimension, hot keys). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    val salted = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(replicated(key))
      .drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. For algebraic
    * aggregates Spark's own partial aggregation already does this;
    * use for holistic aggregates (e.g. exact distinct collections)
    * where map-side combine can't help. `aggs` maps a column to its
    * (partial, final) aggregate pair. */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"distinct_$valueCol"))

  /** q33: salted fact⋈dim join, aggregated — the RESULT is identical
    * to the plain join (that is the whole point of salting), so the
    * oracle arbitrates it with the unsalted SQL while the plan
    * scatters every hot orderkey over [[saltedJoin]]'s sub-keys. */
  def q33SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val dim = t(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    // saltFactor 4 in the battery: the replication cost is the knob's
    // whole trade (uniform test data has no hot key to amortize it)
    saltedJoin(fact, dim, "k", saltFactor = 4)
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
  }

  /** q34: two-phase exact distinct over a 3-value hot group key —
    * per-(key, salt) partials keep any one reducer's distinct set
    * bounded; the sum of partials is exact because equal values
    * share a salt bucket by construction. */
  def q34SkewDistinct(spark: SparkSession, dir: String): DataFrame =
    saltedDistinctCount(t(spark, dir, "lineitem"), "l_returnflag", "l_partkey")
}
