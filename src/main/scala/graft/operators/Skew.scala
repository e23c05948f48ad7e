package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution has hot
  * values — the hand tool for when AQE's runtime skew-join split
  * isn't available or a key is pathological (one key holding a double-
  * digit percentage of a 100 TB fact table).
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
}
