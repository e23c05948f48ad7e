package graft

import graft.operators.CoreQueries
import org.scalatest.funsuite.AnyFunSuite

/** Hot-table serving mode (Tables.enableHotTables): results are
  * byte-identical to the cold path, reads actually serve from the
  * in-memory cache while enabled, and disable fully restores the
  * cold-scan plan (no cache entry outlives the mode). */
class TablesHotSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  test("hot mode serves identical rows, then disable restores the cold scan") {
    val cold = CoreQueries.q2FilterProject(spark, dir).collect().map(_.toSeq).toSet
    try {
      Tables.enableHotTables(spark, dir)
      Tables.enableHotTables(spark, dir) // idempotent
      val hotDf = CoreQueries.q2FilterProject(spark, dir)
      assert(hotDf.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
        "hot mode did not serve the scan from cache")
      assert(hotDf.collect().map(_.toSeq).toSet == cold)
      assert(CoreQueries.q29PointFind(spark, dir).collect().nonEmpty)
    } finally Tables.disableHotTables()
    val after = CoreQueries.q2FilterProject(spark, dir)
    assert(!after.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "disable left a cache entry behind")
    assert(after.collect().map(_.toSeq).toSet == cold)
  }
}
