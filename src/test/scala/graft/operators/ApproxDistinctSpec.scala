package graft.operators

import graft.SparkFixture
import graft.Tables.t
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q36 (approx_count_distinct, HLL++ at rsd 0.02 — round-10 decision,
  * see q36ApproxDistinct's doc) against the exact COUNT(DISTINCT)
  * anchor: per group, the estimate must land within a few multiples
  * of the configured relative standard deviation (4× rsd = 0.08) —
  * generous headroom over the published ~3σ bound, not a tuned
  * constant. The exact n_rows column anchors the grouping itself. */
class ApproxDistinctSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  test("approx_count_distinct tracks the exact distinct counts") {
    val approx = CoreQueries.q36ApproxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for (k <- exact.keySet) {
      val (ao, ap, an) = approx(k)
      val (eo, ep, en) = exact(k)
      assert(an == en, s"group $k row count drifted: $an vs $en")
      assert(math.abs(ao - eo).toDouble / eo <= 0.08, s"group $k orders: $ao vs $eo")
      assert(math.abs(ap - ep).toDouble / ep <= 0.08, s"group $k parts: $ap vs $ep")
    }
  }
}
