package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `/` with the MultiSQL type dispatch (reference
  * /root/reference/src/data/value/methods/binary.rs:66-100): I64 / I64
  * is integer division (truncating, like Rust's i64 `/`); any float
  * operand promotes to F64 division.
  *
  * The dispatch can only happen once child types are resolved, so this
  * node delegates `dataType`/`eval`/codegen to the matching built-in
  * (IntegralDivide or Divide) chosen lazily from the children's
  * resolved types — the generated code is the built-in operator's,
  * nothing bespoke in the hot path. Every tree rewrite (analysis,
  * binding) copies the node, so the delegate is always rebuilt from
  * the current children.
  *
  * The [[graft.engine.Engine]] substitutes this node for every `/`
  * (and expands AVG through it) in parsed statements; DataFrame-API
  * users keep Spark's semantics and opt in per-column with `div`.
  */
case class DialectDivide(left: Expression, right: Expression)
    extends BinaryExpression {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | NullType => true
    case _ => false
  }

  private lazy val delegate: Expression =
    if (integral(left.dataType) && integral(right.dataType))
      new IntegralDivide(Cast(left, LongType), Cast(right, LongType))
    else
      new Divide(Cast(left, DoubleType), Cast(right, DoubleType))

  override def dataType: DataType = delegate.dataType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = delegate.checkInputDataTypes()
  override def eval(input: InternalRow): Any = delegate.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = delegate.genCode(ctx)
    ev.copy(code = d.code, isNull = d.isNull, value = d.value)
  }
  override def prettyName: String = "graft_div"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DialectDivide =
    copy(left = newLeft, right = newRight)
}
