package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-private escape hatch into Spark internals, for the one
  * capability the public API doesn't expose: building a DataFrame
  * from an already-parsed logical plan (prepared statements — the
  * reference's `pre_parse`/`execute_parsed`, glue/mod.rs:182-187,
  * caches parsed statements the same way). */
object Shims {
  def parse(spark: SparkSession, sql: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def parseExpression(
      spark: SparkSession,
      s: String): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.sessionState.sqlParser.parseExpression(s)

  def column(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(
      c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Catalog tables a query's ANALYZED plan reads (views already
    * expanded): the opt-in read-freshness probe checks each one's
    * persisted epoch before executing. */
  def catalogTables(df: DataFrame): Seq[(String, String)] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.catalogTable.isDefined =>
        val id = lr.catalogTable.get.identifier
        (id.database.getOrElse(""), id.table)
    }.distinct
}
