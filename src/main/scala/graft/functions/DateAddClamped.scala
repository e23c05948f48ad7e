package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DATEADD(unit, n, epoch_seconds) as a native Catalyst expression
  * with whole-stage codegen — the reference's calendar arithmetic
  * with month-end clamping (timestamp.rs:147-278: Jan 31 + 1 MONTH =
  * Feb 28), on MultiSQL's epoch-second I64 timestamp carrier.
  *
  * A Scala UDF did this job first; the expression form keeps the
  * call inside generated code (no row boxing, null handling inlined)
  * — the "native Expression beats UDF" tier for a hot scalar.
  */
case class DateAddClamped(unit: Expression, n: Expression, ts: Expression)
    extends TernaryExpression {

  override def first: Expression = unit
  override def second: Expression = n
  override def third: Expression = ts

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = unit.dataType == StringType &&
      (n.dataType == IntegerType || n.dataType == LongType) &&
      (ts.dataType == LongType || ts.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DATEADD expects (STRING, INT, BIGINT), got " +
        s"(${unit.dataType.sql}, ${n.dataType.sql}, ${ts.dataType.sql})")
  }

  override protected def nullSafeEval(u: Any, nv: Any, t: Any): Any =
    DateAddClamped.add(u.asInstanceOf[UTF8String].toString,
      nv match { case i: Int => i.toLong; case l: Long => l },
      t match { case i: Int => i.toLong; case l: Long => l })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, nv, t) =>
      s"graft.functions.DateAddClamped.add($u.toString(), (long)$nv, (long)$t)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(unit = newFirst, n = newSecond, ts = newThird)

  override def prettyName: String = "dateadd"
}

object DateAddClamped {
  /** Shared by interpreted and generated paths. java.time's
    * plusMonths/plusYears clamp the day-of-month exactly like the
    * reference's hand-rolled calendar math. */
  def add(unit: String, n: Long, ts: Long): Long = {
    import java.time.{LocalDateTime, ZoneOffset}
    val ldt = LocalDateTime.ofEpochSecond(ts, 0, ZoneOffset.UTC)
    val r = unit.toUpperCase match {
      case "YEAR" => ldt.plusYears(n)
      case "MONTH" => ldt.plusMonths(n)
      case "DAY" => ldt.plusDays(n)
      case "HOUR" => ldt.plusHours(n)
      case "MINUTE" => ldt.plusMinutes(n)
      case "SECOND" => ldt.plusSeconds(n)
      case other => throw new IllegalArgumentException(s"DATEADD: bad unit $other")
    }
    r.toEpochSecond(ZoneOffset.UTC)
  }
}
