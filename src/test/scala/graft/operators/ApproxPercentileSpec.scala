package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** q31 (approx_percentile sketch — the at-scale tier) against q30
  * (exact percentile — the oracle anchor): per group and percentile
  * the sketch must land within a small relative tolerance of the
  * exact value, and the exact min/max must agree. At accuracy 10⁴
  * the rank error is ≤ n/10⁴ (<1 row at sf0.001), so the tolerance
  * here is generous headroom, not a tuned constant. */
class ApproxPercentileSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  test("approx_percentile tracks exact percentile within tolerance") {
    val dir = SparkFixture.Sf0001
    def keyed(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
      df.collect().map { r =>
        r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))
      }.toMap
    val exact = keyed(CoreQueries.q30Percentiles(spark, dir))
    val approx = keyed(CoreQueries.q31ApproxPercentiles(spark, dir))
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    for (k <- exact.keySet) {
      val (e, a) = (exact(k), approx(k))
      for (i <- 0 until 3) { // p50, p90, p99
        val rel = math.abs(a(i) - e(i)) / math.max(math.abs(e(i)), 1e-9)
        assert(rel <= 0.005,
          s"group $k percentile index $i: approx ${a(i)} vs exact ${e(i)} (rel $rel)")
      }
      assert(a(3) == e(3) && a(4) == e(4), s"group $k min/max must be exact")
    }
  }
}
