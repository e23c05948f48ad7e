package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CONVERT('TEXT', x, 'MONEY'/'SEPARATED') formatting as a native
  * codegen expression (reference cast.rs:179-190): round to cents
  * half-away-from-zero like Rust's f64::round, shortest decimal
  * repr, thousands commas, optional '$'. */
case class MoneyFormat(value: Expression, dollar: Expression)
    extends BinaryExpression {

  override def left: Expression = value
  override def right: Expression = dollar
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (value.dataType == DoubleType && dollar.dataType == BooleanType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"MONEY expects (DOUBLE, BOOLEAN), got (${value.dataType.sql}, ${dollar.dataType.sql})")
  }

  override protected def nullSafeEval(v: Any, d: Any): Any =
    UTF8String.fromString(
      MoneyFormat.format(v.asInstanceOf[Double], d.asInstanceOf[Boolean]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, d) =>
      s"UTF8String.fromString(graft.functions.MoneyFormat.format($v, $d))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(value = newLeft, dollar = newRight)

  override def prettyName: String = "graft_money"
}

object MoneyFormat {
  def format(v: Double, dollar: Boolean): String = {
    val cents = math.round(math.abs(v) * 100.0)
    val r = math.signum(v) * cents / 100.0
    val repr = {
      val bd = java.math.BigDecimal.valueOf(r).stripTrailingZeros()
      if (bd.scale() <= 0) bd.setScale(0).toPlainString else bd.toPlainString
    }
    val (intPart, fracPart) = repr.span(_ != '.')
    val neg = intPart.startsWith("-")
    val digits = if (neg) intPart.drop(1) else intPart
    val grouped = digits.reverse.grouped(3).mkString(",").reverse
    val s = (if (neg) "-" else "") + grouped + fracPart
    if (dollar) "$" + s else s
  }
}
