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
