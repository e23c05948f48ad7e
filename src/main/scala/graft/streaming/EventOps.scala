package graft.streaming

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table. The reference has
  * no streaming at all (SURVEY.md §2.8) — this is net-new surface.
  *
  * Each aggregation exists in two forms sharing the same plan shape:
  * a batch form (oracle-checkable below) and a Structured Streaming
  * form ([[streamingTumbling]]) with watermarking, verified in the
  * ScalaTest suite via the memory sink. At scale the streaming form
  * runs the identical hash-aggregate with state kept per window.
  */
object EventOps {

  /** Tumbling 1-hour window per event type (batch form). */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** JSON prop extraction + aggregation (events.props is a JSON blob). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  /** Gap-based sessionization (30-min inactivity): session count and
    * mean session length per user. Window-lag based; deterministic
    * ordering by (ts, event_id). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
  }

  /** Funnel: per user, did view → click → purchase occur in order? */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val firstOf = (typ: String) =>
      min(when(col("event_type") === typ, col("ts"))).as(s"first_$typ")
    e.groupBy(col("user_id"))
      .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
      .select(
        col("user_id"),
        col("first_view").isNotNull.as("viewed"),
        (col("first_click") > col("first_view")).as("clicked_after_view"),
        (col("first_purchase") > col("first_click")).as("purchased_after_click"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("viewed"), 1).otherwise(0)).as("n_viewed"),
        sum(when(col("clicked_after_view"), 1).otherwise(0)).as("n_clicked"),
        sum(when(col("purchased_after_click"), 1).otherwise(0)).as("n_purchased"))
  }

  /** Structured Streaming form of [[tumblingCounts]]: file source over
    * the same parquet, 10-minute watermark, 1-hour tumbling window.
    * Used by the streaming spec via the memory sink. */
  def streamingTumbling(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.Tables.rawEventsSchema(spark, dir)
    // The file source needs a directory; glob-filter to the events
    // file inside the testdata dir.
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))
  }
}
