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

  /** Column-level wrapper for [[PqEncode]]. */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graft.Shims.column(PqEncode(
      org.apache.spark.sql.graft.Shims.expression(v), codebooks))

  /** Column-level wrapper for [[SqScan]]. */
  def sqScan(v: Column, mns: Array[Double], mxs: Array[Double],
             q: Array[Double]): Column =
    org.apache.spark.sql.graft.Shims.column(SqScan(
      org.apache.spark.sql.graft.Shims.expression(v), mns, mxs, q))
}

/** Product-quantization encoder: all PqM subspace argmins in one
  * fused primitive loop, the codebook riding as a reference object
  * (PqM × PqK × PqSub doubles — KBs). Replaces the hybrid form
  * (native [[ArrayL2]] inside interpreted transform/array_min/struct
  * machinery) that still paid a slice allocation, a struct and an
  * ordering comparison per (subspace, entry) per row.
  *
  * Bit-parity contract: per entry, the left-to-right (x−y)² fold
  * over the subspace slice — identical to ArrayL2 over `slice(v,
  * m·sub+1, sub)` — and the argmin keeps the SMALLEST index on ties
  * (strict <), matching the struct-ordering (d ASC, j ASC) min and
  * the DuckDB oracle's row_number tiebreak. Distances are sums of
  * squares, so NaN/-0.0 comparator corner cases cannot arise. Null
  * input propagates null; vectors are non-null-element arrays in
  * this library. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<DOUBLE>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val cbM = codebooks(mi)
      val sub = if (cbM.isEmpty) 0 else cbM(0).length
      val off = mi * sub
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cbM.length) {
        val c = cbM(j)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = v.getDouble(off + i) - c(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val sub = ctx.freshName("sub")
      val off = ctx.freshName("off")
      val bestJ = ctx.freshName("bestJ")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |Object[] $out = new Object[$cbRef.length];
         |for (int $m = 0; $m < $cbRef.length; $m++) {
         |  int $sub = $cbRef[$m].length == 0 ? 0 : $cbRef[$m][0].length;
         |  int $off = $m * $sub;
         |  int $bestJ = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $cbRef[$m].length; $j++) {
         |    double[] $c = $cbRef[$m][$j];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $x = $a.getDouble($off + $i) - $c[$i];
         |      $d += $x * $x;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
         |  }
         |  $out[$m] = java.lang.Integer.valueOf($bestJ);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  // Array-typed constructor params break case-class equality; compare
  // codebook CONTENT so expression canonicalization stays correct.
  override def equals(other: Any): Boolean = other match {
    case PqEncode(c, cb) => c == child &&
      cb.length == codebooks.length &&
      cb.zip(codebooks).forall { case (a, b) =>
        a.length == b.length && a.zip(b).forall { case (x, y) =>
          java.util.Arrays.equals(x, y)
        }
      }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(
      codebooks.asInstanceOf[Array[AnyRef]])
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

/** Scalar-quantization (FAISS SQ8) scan kernel: per-dimension encode
  * AND query reconstruction distance in ONE fused pass, returning
  * `struct(cs ARRAY<BIGINT>, adist DOUBLE)`. The min/max training
  * bounds and the query vector ride as reference objects.
  *
  * Replaces two interpreted 64-step passes per row (a `transform`
  * with when/least/greatest/floor per dimension to encode, then an
  * `aggregate` fold reconstructing each dimension and summing squared
  * error — ~128 boxed interpreter steps per row).
  *
  * Bit-parity contract, matching the retired expressions and the
  * DuckDB oracle replay exactly:
  *   code  = mx > mn ? min(255, max(0, floor((x−mn)·255/(mx−mn)))) : 0
  *           with ((x−mn)·255.0)/(mx−mn) evaluation order;
  *   recon = mn + ((c+0.5)·(mx−mn))/255.0;
  *   adist = left-to-right Σ (q_i − recon_i)².
  * Null input propagates null; vector elements are non-null in this
  * library. */
case class SqScan(child: Expression, mns: Array[Double], mxs: Array[Double],
                  q: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("cs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("adist", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq_scan expects ARRAY<DOUBLE>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = mns.length
    val cs = new Array[Any](dim)
    var adist = 0.0
    var i = 0
    while (i < dim) {
      val mn = mns(i)
      val mx = mxs(i)
      val c =
        if (mx > mn) {
          val f = math.floor((v.getDouble(i) - mn) * 255.0 / (mx - mn)).toLong
          math.min(255L, math.max(0L, f))
        } else 0L
      cs(i) = c
      val r = mn + ((c + 0.5) * (mx - mn)) / 255.0
      val d = q(i) - r
      adist += d * d
      i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(cs), adist))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sqScan", this, classOf[SqScan].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $self.evalGram($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalGram(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): SqScan =
    copy(child = newChild)

  // Array-typed params break case-class equality; compare content.
  override def equals(other: Any): Boolean = other match {
    case SqScan(c, a, b, qq) => c == child &&
      java.util.Arrays.equals(a, mns) && java.util.Arrays.equals(b, mxs) &&
      java.util.Arrays.equals(qq, q)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(mns) +
      java.util.Arrays.hashCode(mxs) + java.util.Arrays.hashCode(q)
}
