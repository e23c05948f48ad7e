package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native in-bucket pair enumeration over a sorted id list — the
  * posting-list hot loop of d2 (n-gram Jaccard), d12 (winnowing) and
  * d13's exact tier: all (i < j) element pairs as
  * `struct(<aName>, <bName>)`, in i-major j-minor order.
  *
  * The `flatten(transform(ds, (a, i) -> transform(slice(ds, i + 2,
  * size(ds) - i - 1), b -> named_struct(...))))` form it replaces ran
  * interpreted and allocated a sliced array per element plus a
  * nested array per element before the flatten — per POSTING LIST,
  * inside the cap-bounded but massively-replicated bucket stream.
  * This form writes the m·(m−1)/2 output structs in one pass with no
  * intermediate allocation. Null elements pass through into pairs
  * like the lambda (they do not occur in practice — ids come from
  * collect_list). Null input propagates null; empty and single-element
  * input yield an empty array (flatten-of-empty parity). */
case class SortedPairs(child: Expression, aName: String, bName: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs expects ARRAY<BIGINT>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField(aName, LongType, nullable = true),
      StructField(bName, LongType, nullable = true))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](Pairs.checkedPairCount("sorted_pairs", n))
    var o = 0
    var i = 0
    while (i < n) {
      val a: Any = if (xs.isNullAt(i)) null else Long.box(xs.getLong(i))
      var j = i + 1
      while (j < n) {
        val b: Any = if (xs.isNullAt(j)) null else Long.box(xs.getLong(j))
        out(o) = new GenericInternalRow(Array[Any](a, b))
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Collection/struct work — delegate to the fused Scala pass via a
    // bound reference (same pattern as WinnowSelect/GramDigests).
    val self = ctx.addReferenceObj("sortedPairs", this, classOf[SortedPairs].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalPairs($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalPairs(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

/** Native in-bucket pair enumeration WITH MinHash agreement — the
  * LSH-bucket hot loop of d3/minhashLsh (and through it d6/d7/d9)
  * and d13's near tier: over a sorted `array<struct<key, sig>>`, all
  * (i < j) pairs as `struct(<aName>, <bName>, n_eq)` where `n_eq`
  * counts positions on which the two signature arrays agree.
  *
  * Replaces the interpreted nested-transform pair build PLUS the
  * per-pair `aggregate(zip_with(a.sig, b.sig, (x, y) -> CASE WHEN
  * x = y THEN 1 ELSE 0 END), 0, +)` fold — which allocated a zipped
  * array and ran a 16-step interpreted fold per candidate pair. Same
  * null semantics as the CASE (a position with any null counts 0);
  * the key is taken from the struct's first field and may be BIGINT
  * (doc ids) or STRING (span fingerprints). Empty/single input yields
  * an empty array; null input propagates null. */
case class SigAgreePairs(child: Expression, aName: String, bName: String)
    extends UnaryExpression {

  private def keyType: DataType = child.dataType match {
    case ArrayType(st: StructType, _) if st.fields.nonEmpty => st.fields(0).dataType
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(k, s)), _)
        if (k.dataType == LongType || k.dataType == StringType) &&
          s.dataType.isInstanceOf[ArrayType] &&
          s.dataType.asInstanceOf[ArrayType].elementType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sig_agree_pairs expects ARRAY<STRUCT<key BIGINT|STRING, sig ARRAY<BIGINT>>>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField(aName, keyType, nullable = true),
      StructField(bName, keyType, nullable = true),
      StructField("n_eq", IntegerType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val ms = input.asInstanceOf[ArrayData]
    val n = ms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val kt = keyType
    val keys = new Array[Any](n)
    val sigs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = ms.getStruct(i, 2)
      keys(i) = if (row.isNullAt(0)) null else row.get(0, kt)
      sigs(i) = if (row.isNullAt(1)) null else row.getArray(1)
      i += 1
    }
    val out = new Array[Any](Pairs.checkedPairCount("sig_agree_pairs", n))
    var o = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var eq = 0
        val sa = sigs(i)
        val sb = sigs(j)
        if (sa != null && sb != null) {
          val k = math.min(sa.numElements(), sb.numElements())
          var t = 0
          while (t < k) {
            if (!sa.isNullAt(t) && !sb.isNullAt(t) && sa.getLong(t) == sb.getLong(t)) eq += 1
            t += 1
          }
        }
        out(o) = new GenericInternalRow(Array[Any](keys(i), keys(j), eq))
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sigAgreePairs", this, classOf[SigAgreePairs].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalPairs($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalPairs(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): SigAgreePairs =
    copy(child = newChild)
}

/** Native holder-set cross expansion — d13's span-instance fan-out:
  * every (da, db) pair from two holder lists with `da != db`, in
  * a-major b-minor order, exactly the
  * `filter(flatten(transform(docs_a, a -> transform(docs_b, b ->
  * struct(a, b)))), p -> p.da != p.db)` form it replaces (which
  * allocated a nested array per element and ran the filter
  * interpreted over the full cross). Null elements pair like the
  * lambda (null != x is NULL → filtered out, so pairs with a null
  * side are DROPPED — matching the SQL filter's null semantics).
  * Either input null propagates null. */
case class CrossPairsNe(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cross_pairs_ne expects two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("da", LongType, nullable = true),
      StructField("db", LongType, nullable = true))),
    containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    val out = new java.util.ArrayList[Any](
      Pairs.checkedCount("cross_pairs_ne", n.toLong * m))
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val da = xs.getLong(i)
        var j = 0
        while (j < m) {
          if (!ys.isNullAt(j)) {
            val db = ys.getLong(j)
            if (da != db)
              out.add(new GenericInternalRow(Array[Any](Long.box(da), Long.box(db))))
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("crossPairsNe", this, classOf[CrossPairsNe].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalPairs($a, $b);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalPairs(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CrossPairsNe =
    copy(left = newLeft, right = newRight)
}

/** Native cross-document position pairs — d14's gram-hit fan-out
  * over a sorted `array<struct<doc_id, pos>>` posting list: all
  * (i < j) pairs whose doc_ids DIFFER, as `struct(id_a, pos_a,
  * id_b, pos_b)` — the `flatten(transform(ms, (a, i) ->
  * transform(filter(slice(ms, i + 2, ...), b -> b.doc_id !=
  * a.doc_id), ...)))` form it replaces (slice + filter + nested
  * array allocations per element, interpreted). Null structs do not
  * occur (collect_list skips nulls); handled by skipping, matching
  * the filter's null-drop. Null input propagates null. */
case class PosPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(d, p)), _)
        if d.dataType == LongType && p.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pos_pairs expects ARRAY<STRUCT<doc_id BIGINT, pos INT>>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = true),
      StructField("pos_a", IntegerType, nullable = true),
      StructField("id_b", LongType, nullable = true),
      StructField("pos_b", IntegerType, nullable = true))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val ms = input.asInstanceOf[ArrayData]
    val n = ms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](n)
    val pos = new Array[Int](n)
    var i = 0
    while (i < n) {
      val row = ms.getStruct(i, 2)
      ids(i) = row.getLong(0)
      pos(i) = row.getInt(1)
      i += 1
    }
    val out = new java.util.ArrayList[Any](n)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (ids(i) != ids(j))
          out.add(new GenericInternalRow(Array[Any](
            Long.box(ids(i)), Int.box(pos(i)), Long.box(ids(j)), Int.box(pos(j)))))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("posPairs", this, classOf[PosPairs].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalPairs($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalPairs(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): PosPairs =
    copy(child = newChild)
}

/** Native adjacent-bigram stream over a word array — t17's
  * `transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1,
  * ws[i] AS w2))` (with the short-input empty-array guard folded in):
  * one struct per adjacent word pair, in order, duplicates kept. The
  * lambda form ran interpreted with two GetArrayItem evaluations and
  * a struct allocation per position — and t17's stream feeds two
  * consumers (the corpus bigram LM and the per-doc hit join), so the
  * tax was paid twice. Null words pass through as null fields like
  * the lambda. Inputs under 2 words yield an empty array; null input
  * propagates null. */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_bigrams expects ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = true),
      StructField("w2", StringType, nullable = true))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev: Any = if (ws.isNullAt(0)) null else ws.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur: Any = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      out(i - 1) = new GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordBigrams", this, classOf[WordBigrams].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalPairs($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalPairs(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

object Pairs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Shims

  /** n·(n−1)/2 computed in Long with a fail-fast bound: the kernels
    * are generic, and an uncapped caller handing a ≥ ~65k-element
    * list would otherwise overflow the Int sizing expression and die
    * with an opaque NegativeArraySizeException. Every in-repo caller
    * caps bucket size (≤ 1024) long before this bound. */
  private[functions] def checkedPairCount(fn: String, n: Int): Int =
    checkedCount(fn, n.toLong * (n - 1) / 2)

  private[functions] def checkedCount(fn: String, total: Long): Int = {
    if (total > Int.MaxValue)
      throw new IllegalArgumentException(
        s"$fn: input would produce $total pairs, over the 2^31-1 array " +
          "bound — cap the bucket/posting list before enumerating pairs")
    total.toInt
  }

  /** Column wrapper: all (i < j) pairs of a sorted BIGINT list. */
  def sortedPairs(ds: Column, aName: String, bName: String): Column =
    Shims.column(SortedPairs(Shims.expression(ds), aName, bName))

  /** Column wrapper: all (i < j) (key, sig) pairs with agreement count. */
  def sigAgreePairs(ms: Column, aName: String, bName: String): Column =
    Shims.column(SigAgreePairs(Shims.expression(ms), aName, bName))

  /** Column wrapper: adjacent (w1, w2) bigram structs, in order. */
  def wordBigrams(ws: Column): Column =
    Shims.column(WordBigrams(Shims.expression(ws)))

  /** Column wrapper: cross product of two id lists, unequal ids only. */
  def crossPairsNe(a: Column, b: Column): Column =
    Shims.column(CrossPairsNe(Shims.expression(a), Shims.expression(b)))

  /** Column wrapper: cross-document (i < j) position pairs. */
  def posPairs(ms: Column): Column =
    Shims.column(PosPairs(Shims.expression(ms)))
}
