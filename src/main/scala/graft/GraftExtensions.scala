package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: lets any Spark deployment
  * install the MultiSQL dialect without constructing an
  * [[graft.engine.Engine]] —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Every dialect function is a pure Catalyst expression builder
  * ([[graft.functions.Dialect.functionBuilders]]), so injection uses
  * the first-class `injectFunction` API — the functions land in the
  * session's registry at build time, before any query is analyzed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.Dialect.functionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Dialect", name),
        builder))
    }
  }
}
