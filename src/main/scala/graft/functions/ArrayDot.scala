package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two ARRAY<DOUBLE> columns as a native codegen'd
  * expression — the hot inner loop of every pair-enumerating
  * embedding operator (d5's bucket pairs, d10's in-cell pairs).
  *
  * The `aggregate(zip_with(a, b, *), 0.0, +)` form it replaces is
  * semantically identical but runs INTERPRETED (higher-order
  * functions don't participate in whole-stage codegen): ~10 µs per
  * 64-dim pair, which dominates pair-join wall time the moment
  * candidate volume is real (measured: ~9 s of d5's 9.8 s at sf1 was
  * interpreted dot products). This form is a tight primitive loop in
  * generated code.
  *
  * Bit-parity contract: left-to-right sum of per-index products —
  * the SAME evaluation order as the interpreted fold and as DuckDB's
  * `list_sum(list_transform(...))` oracle twin, so hash-exact
  * comparisons are unaffected. Length = min of the two arrays
  * (zip_with over equal-length inputs everywhere in this library;
  * min keeps the degenerate case defined). Null arrays propagate
  * null via BinaryExpression's default null-safe wrapper; element
  * nulls do not occur in this library's vector frames (arrays come
  * from `transform(embedding, cast)` over non-null floats).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot expects ARRAY<DOUBLE>, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  import org.apache.spark.sql.Column

  /** Column-level wrapper. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Shims.column(ArrayDot(
      org.apache.spark.sql.graft.Shims.expression(a),
      org.apache.spark.sql.graft.Shims.expression(b)))

  /** Column-level wrapper for [[ArrayL2]]. */
  def l2(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Shims.column(ArrayL2(
      org.apache.spark.sql.graft.Shims.expression(a),
      org.apache.spark.sql.graft.Shims.expression(b)))
}

/** Squared L2 distance of two ARRAY<DOUBLE> columns — [[ArrayDot]]'s
  * sibling for the PQ encoder's argmin loops (s8/s9/s11: 8 subspaces
  * × 16 codebook entries of interpreted `aggregate(zip_with((x,y) ->
  * (x-y)*(x-y)))` per row). Same bit-parity contract: left-to-right
  * sum of (x_i − y_i)², identical to the fold it replaces and to the
  * oracle's `list_sum(list_transform(...))`. */
case class ArrayL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_l2 expects ARRAY<DOUBLE>, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayL2 =
    copy(left = newLeft, right = newRight)
}
