package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DistributedPrefix must produce EXACTLY the single-window results —
  * the converted operators' DuckDB oracles (t8/t8b/t11/t12) stayed
  * unchanged on that guarantee. Integer arithmetic means no
  * float-order caveats: equality is row-set equality. The generated
  * frame is larger than the shuffle-partition count and skewed (one
  * dominant group) so every group genuinely straddles partitions. */
class DistributedPrefixSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  import spark.implicits._

  private lazy val df = {
    // deterministic, skewed: group "a" holds half the rows
    val rows = (1 to 5000).map { i =>
      val g = if (i % 2 == 0) "a" else "bcdefghij" (i % 9).toString
      // value varies, order key is a scrambled hash-like long
      (i.toLong, g, (i * 2654435761L) % 997L, (i % 37).toLong)
    }
    rows.toDF("id", "grp", "ord", "v")
  }

  test("sumBefore equals the single-window running frame") {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("ord").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val got = DistributedPrefix
      .sumBefore(df, "grp", Seq("ord", "id"), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("rowNumber equals the single-window rank") {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("ord").asc, col("id").asc)
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val got = DistributedPrefix
      .rowNumber(df, "grp", Seq("ord", "id"), "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("input columns and row count are preserved") {
    val out = DistributedPrefix.sumBefore(df, "grp", Seq("ord", "id"), "v", "cum")
    assert(out.columns.toSeq == Seq("id", "grp", "ord", "v", "cum"))
    assert(out.count() == df.count())
  }

  test("q35's derived window functions equal Spark's built-ins at slice scale") {
    // q35's battery input is small; re-run its derivation logic
    // against the built-in window functions on a frame that straddles
    // many range slices per group (the boundary lag/lead path and the
    // ntile bucket formula are what this pins)
    val orders = df.select(
      col("id").as("o_orderkey"),
      col("grp").as("o_orderstatus"),
      (col("ord") * 7 % 1000).cast("double").as("o_totalprice"),
      lit(1L).as("o_custkey"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val want = orders
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cum_dist", cume_dist().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(w))
      .select("o_orderkey", "quartile", "pct_rank", "cum_dist",
        "prev_price", "next_price", "third_price")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val got = CoreQueries.windowSuiteOn(
      orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")))
      .select("o_orderkey", "quartile", "pct_rank", "cum_dist",
        "prev_price", "next_price", "third_price")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got.size == want.size)
    val bad = want.keys.filter(k => got(k) != want(k)).take(3)
    assert(bad.isEmpty, s"derived != built-in for ids $bad: " +
      bad.map(k => s"$k: got ${got(k)} want ${want(k)}").mkString("; "))
  }

  test("the range exchange is shared: offsets and slices read ONE shuffle") {
    val out = DistributedPrefix.sumBefore(df, "grp", Seq("ord", "id"), "v", "cum")
    out.collect()
    val p = out.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val finalTree = p.split("== Initial Plan ==")(0)
    assert(finalTree.contains("ReusedExchange") ||
      "rangepartitioning".r.findAllIn(finalTree).length == 1,
      s"range shuffle executed twice:\n$p")
  }
}
