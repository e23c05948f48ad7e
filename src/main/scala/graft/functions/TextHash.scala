package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass MinHash signature over a pre-hashed token array —
  * the per-span hot loop of d13 and the streaming [[graft.operators
  * .Dedup.sigExpr]].
  *
  * The `array((0 until 16).map(i => array_min(transform(hs, x ->
  * (x * A_i + B_i) % P))))` form it replaces runs INTERPRETED
  * (higher-order functions don't participate in whole-stage codegen)
  * and ALLOCATES a fresh permuted array per permutation per row —
  * 16 transient arrays per span. This form is one primitive loop
  * over the input maintaining 16 running minima: zero allocations
  * beyond the result.
  *
  * Bit-parity contract: identical integer arithmetic ((x*a + b) % p
  * with Java wrap/remainder semantics — exactly what Spark's
  * Multiply/Add/Remainder on LongType compute with ANSI off, and
  * what the DuckDB oracle's `list_min(list_transform(...))` replays;
  * a, x < p ≈ 1e9 so the product never overflows anyway). Null
  * elements are skipped like array_min; an empty or all-null input
  * yields an array of nulls, exactly as array_min-of-empty is null.
  * Null input propagates null via the null-safe wrapper. */
case class MinHashSigs(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects ARRAY<BIGINT>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (!xs.isNullAt(i)) {
        seen = true
        val x = xs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (x * as(j) + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (seen) new GenericArrayData(mins.map(Long.box))
    else new GenericArrayData(Array.fill[Any](k)(null))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as.toArray, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val k = as.length
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $seen = true;
         |    long $x = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($x * $asRef[$j] + $bsRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  $out[$j] = $seen ? (Object) java.lang.Long.valueOf($mins[$j]) : null;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** Native winnowing fingerprint selection (Schleimer et al. 2003)
  * over a word array — d12's per-document kernel: hash every
  * K-word-gram (the 60-bit md5 prefix, identical to
  * [[graft.operators.Dedup.portableHash]] =
  * `conv(substring(md5(s), 1, 15), 16, 10)`), slide a window of W
  * consecutive gram hashes, keep each window's minimum, and return
  * the distinct minima in first-occurrence order (array_distinct
  * semantics).
  *
  * The nested higher-order form it replaces allocated a fresh
  * sliced array per window per document (`array_min(slice(hs, j,
  * W))` — millions of transient arrays at sf1) and evaluated md5
  * inside an interpreted lambda. This form hashes each gram once
  * into a primitive array and keeps a rolling window minimum with
  * zero per-window allocation.
  *
  * Bit-parity contract: the gram string is the K words joined by a
  * single space with null words skipped (concat_ws semantics); the
  * 60-bit value is the first 15 hex chars of the md5 — i.e. the
  * first 8 bytes big-endian shifted right by 4 — exactly what the
  * SQL form and the DuckDB oracle (`('0x' || substr(md5(s), 1,
  * 15))::BIGINT`) compute. Window layout matches `sequence(1,
  * greatest(n_grams - W + 1, 1))` + clamping slice: full W-windows
  * when n_grams ≥ W, ONE all-gram window otherwise. Inputs with
  * fewer than K words yield an empty array (callers filter them);
  * null input propagates null. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_select expects ARRAY<STRING>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val grams = n - k + 1
    if (grams < 1) return new GenericArrayData(Array.empty[Any])
    val md = WinnowSelect.digest.get()
    val hs = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      md.reset()
      var t = i
      var emitted = false
      while (t < i + k) {
        if (!words.isNullAt(t)) {
          if (emitted) md.update(' '.toByte)
          md.update(words.getUTF8String(t).getBytes)
          emitted = true
        }
        t += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = v >>> 4
      i += 1
    }
    val m = math.max(grams - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < m) {
      var mn = Long.MaxValue
      var t = j
      val end = math.min(j + w, grams)
      while (t < end) { if (hs(t) < mn) mn = hs(t); t += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The body is md5 + collection work, not a tight primitive loop —
    // delegate to eval via a bound reference (the surrounding stage
    // stays whole-stage compiled; only this expression runs through
    // its Scala implementation, which is already a single fused pass).
    val self = ctx.addReferenceObj("winnowSelect", this, classOf[WinnowSelect].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalGram($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalGram(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  private[functions] val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
}

/** Native stride-1 gram digests over a word array — d14's gram
  * stream: one `struct(pos, md5(words[pos..pos+w-1] joined ' '))`
  * per window position, 1-based positions, lowercase 32-char hex
  * exactly like Spark's `md5(concat_ws(' ', slice(ws, p, w)))` and
  * the DuckDB oracle's `md5(array_to_string(list_slice(...), ' '))`.
  *
  * The higher-order form it replaces evaluated md5 inside an
  * interpreted lambda and allocated a sliced array + a joined string
  * per position (stride-1 windows touch every word w times). This
  * form feeds the digest incrementally — no slice, no join string —
  * and allocates only the output. Null words are skipped like
  * concat_ws; inputs shorter than w yield an empty array (callers
  * filter them); null input propagates null. */
case class GramDigests(child: Expression, w: Int, hexOut: Boolean = true)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  /** With `hexOut = false` the digest rides as the RAW 16 md5 bytes
    * (BinaryType) instead of the 32-char lowercase hex string — the
    * same value, half the shuffle bytes, for consumers that use the
    * digest purely as a group/join key (d14's census + posting
    * stages shuffle the O(corpus tokens) gram stream three times).
    * `hex(g)` of the binary form equals the hex form exactly. */
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("g",
        if (hexOut) StringType else org.apache.spark.sql.types.BinaryType,
        nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_digests expects ARRAY<STRING>, got ${t.sql}")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val grams = n - w + 1
    if (grams < 1) return new GenericArrayData(Array.empty[Any])
    val md = WinnowSelect.digest.get()
    val out = new Array[Any](grams)
    var p = 0
    while (p < grams) {
      md.reset()
      var t = p
      var emitted = false
      while (t < p + w) {
        if (!words.isNullAt(t)) {
          if (emitted) md.update(' '.toByte)
          md.update(words.getUTF8String(t).getBytes)
          emitted = true
        }
        t += 1
      }
      val d = md.digest()
      val g: Any = if (hexOut) {
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = hexDigits((d(b) >> 4) & 0xf)
          hex(2 * b + 1) = hexDigits(d(b) & 0xf)
          b += 1
        }
        UTF8String.fromString(new String(hex))
      } else d
      out(p) = new GenericInternalRow(Array[Any](p + 1, g))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // md5 + struct construction — delegate to the fused Scala pass
    // via a bound reference (same pattern as WinnowSelect).
    val self = ctx.addReferenceObj("gramDigests", this, classOf[GramDigests].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalGram($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalGram(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): GramDigests =
    copy(child = newChild)
}

/** Native one-pass repetition statistics over a word array — the t6
  * (Gopher/MassiveText quality heuristics) kernel, also composed by
  * c1's quality gate: `struct(n_words, n_distinct, top_word_n,
  * top_bigram_n, sum_word_len)`, all integral so downstream division
  * points and the DuckDB oracle are unaffected (the counts are
  * algorithm-independent).
  *
  * The form it replaces ran two interpreted `aggregate(array_sort(
  * ...))` run-length folds (one per-element struct allocation each
  * step), an `array_distinct`, a length fold, AND materialized the
  * full bigram array per document. This is one pass with two hash
  * maps. Word length counts Unicode code points (`UTF8String
  * .numChars`) exactly like Spark's `length`; bigram keys are the
  * words joined by a single space exactly like the `concat(w_i, ' ',
  * w_{i+1})` array it replaces. Null words do not occur in this
  * library's split output; for robustness they are skipped (and
  * counted distinct-once, like array_distinct) — parity on real
  * corpora is spec-pinned. Null input propagates null. */
case class RepStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_words", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_word_n", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_bigram_n", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_word_len", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rep_stats expects ARRAY<STRING>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val wordCount = new java.util.HashMap[String, Long]()
    val bigramCount = new java.util.HashMap[String, Long]()
    var sumLen = 0L
    var sawNull = false
    var prev: String = null
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) { sawNull = true; prev = null }
      else {
        val u = words.getUTF8String(i)
        val s = u.toString
        sumLen += u.numChars()
        wordCount.merge(s, 1L, (a, b) => a + b)
        if (prev != null) bigramCount.merge(prev + " " + s, 1L, (a, b) => a + b)
        prev = s
      }
      i += 1
    }
    def maxOf(m: java.util.HashMap[String, Long]): Long = {
      var best = 0L
      val it = m.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v > best) best = v }
      best
    }
    new GenericInternalRow(Array[Any](
      n.toLong,
      wordCount.size.toLong + (if (sawNull) 1L else 0L),
      maxOf(wordCount),
      if (n >= 2) maxOf(bigramCount) else 0L,
      sumLen))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("repStats", this, classOf[RepStats].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $self.evalGram($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalGram(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** Native row-local SimHash over a token array — d4's whole
  * signature in one pass: each token's 60-bit md5-prefix hash (the
  * [[graft.operators.Dedup.portableHash]] value, NO modulus), a ±1
  * vote per bit position per token, recomposed to the bits-wide
  * fingerprint. Replaces the token explode + groupBy(doc_id) with
  * `bits` conditional-sum aggregates — the signature stage sheds its
  * corpus-wide shuffle exactly like the row-local MinHash path.
  *
  * Bit-parity contract: vote arithmetic matches the aggregate form
  * term for term — bit b votes +1 when `(h >> b) & 1 = 1`, else −1
  * (a null token's CASE falls through to −1 on every bit; split
  * output contains none in practice); bit b sets `1L << b` in the
  * result when its vote sum is strictly positive. An empty array
  * (unreachable — split yields at least one element) gives all-zero
  * sums, i.e. fingerprint 0, like an all-negative vote; null input
  * propagates null. */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash expects ARRAY<STRING>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val votes = new Array[Long](bits)
    val md = WinnowSelect.digest.get()
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        md.reset()
        md.update(words.getUTF8String(i).getBytes)
        val d = md.digest()
        var v = 0L
        var t = 0
        while (t < 8) { v = (v << 8) | (d(t) & 0xffL); t += 1 }
        v = v >>> 4
        var b = 0
        while (b < bits) {
          votes(b) += (if (((v >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out += (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash", this, classOf[SimHash].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = ((java.lang.Long) $self.evalHash($a)).longValue();
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalHash(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Native distinct word w-grams over a word array — the shingle
  * builder shared by d2 (n-gram Jaccard), d8 (contamination) and the
  * MinHash signature paths: each position's w words joined by a
  * single space (concat_ws semantics — null words skipped), distinct
  * in first-occurrence order (array_distinct semantics).
  *
  * The `array_distinct(transform(sequence(1, size(w) - (k-1)), i ->
  * concat_ws(' ', slice(w, i, k))))` form it replaces ran interpreted
  * and allocated a sliced array + a joined string per position; this
  * form builds each gram into one reused StringBuilder and dedupes
  * through a LinkedHashSet. Inputs shorter than w yield an empty
  * array (callers filter them); null input propagates null. */
case class WordGrams(child: Expression, w: Int, digestOut: Boolean = false)
    extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  /** With `digestOut = true` each distinct gram rides as its RAW 16
    * md5 bytes (BinaryType) instead of the gram string — md5-as-
    * identity, the same contract d1's exact dedup makes for whole
    * documents — for consumers that use the gram purely as a
    * group/join key (d2's posting lists, d8's train-gram join):
    * same distinct set, ~half the exchange bytes. */
  override def dataType: DataType = ArrayType(
    if (digestOut) org.apache.spark.sql.types.BinaryType else StringType,
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_grams expects ARRAY<STRING>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val grams = n - w + 1
    if (grams < 1) return new GenericArrayData(Array.empty[Any])
    // Stay on UTF8String end to end: concatWs builds each gram
    // directly from the word bytes (null-skip — ConcatWs semantics)
    // and the set dedupes on byte content, no java.lang.String
    // round-trips anywhere.
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val buf = new Array[UTF8String](w)
    var i = 0
    while (i < grams) {
      var t = 0
      while (t < w) {
        buf(t) = if (words.isNullAt(i + t)) null else words.getUTF8String(i + t)
        t += 1
      }
      seen.add(UTF8String.concatWs(WordGrams.space, buf: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    if (digestOut) {
      val md = WinnowSelect.digest.get()
      while (it.hasNext) {
        md.reset()
        md.update(it.next().getBytes)
        out(o) = md.digest()
        o += 1
      }
    } else {
      while (it.hasNext) { out(o) = it.next(); o += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // String + collection work — delegate to the fused Scala pass via
    // a bound reference (same pattern as WinnowSelect/GramDigests).
    val self = ctx.addReferenceObj("wordGrams", this, classOf[WordGrams].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalGram($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalGram(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  private[functions] val space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")
}

/** Native word w-gram 60-bit hashes over a word array — the fused
  * `portableHash(gram) % p` stream the MinHash paths consume: each
  * gram is its w words joined by a single space (concat_ws null-skip
  * for w ≥ 2), hashed to the first 15 hex chars of its md5 parsed
  * base-16 (= first 8 digest bytes big-endian >>> 4 — identical to
  * [[graft.operators.Dedup.portableHash]] and the DuckDB oracle's
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`), taken `% p`.
  *
  * With `distinct = true` the grams dedupe on their STRING content in
  * first-occurrence order before hashing (array_distinct-then-hash
  * parity — dedup-by-hash would differ under an md5 collision);
  * replaces `transform(array_distinct(transform(...slice...)), g ->
  * portableHash(g) % p)`. With `distinct = false` and w = 1 it is the
  * per-word form `transform(ws, wd -> portableHash(wd) % p)` with
  * per-element null propagation (a null word yields a null hash,
  * exactly like the lambda). Inputs shorter than w yield an empty
  * array; null input propagates null. */
case class GramHashes(child: Expression, w: Int, p: Long, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = !distinct && w == 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes expects ARRAY<STRING>, got ${t.sql}")
  }

  private def hash60(md: MessageDigest, u: org.apache.spark.unsafe.types.UTF8String): Long = {
    md.reset()
    md.update(u.getBytes) // UTF-8 bytes straight off the value, no String round-trip
    val d = md.digest()
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (v >>> 4) % p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val grams = n - w + 1
    if (grams < 1) return new GenericArrayData(Array.empty[Any])
    val md = WinnowSelect.digest.get()
    if (w == 1 && !distinct) {
      // Per-word lambda parity: null word → null element.
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (words.isNullAt(i)) null
          else Long.box(hash60(md, words.getUTF8String(i)))
        i += 1
      }
      return new GenericArrayData(out)
    }
    // Grams build directly from the word bytes (concatWs null-skip)
    // and dedupe on byte content — see WordGrams.
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val kept = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    val buf = new Array[org.apache.spark.unsafe.types.UTF8String](w)
    var i = 0
    while (i < grams) {
      var t = 0
      while (t < w) {
        buf(t) = if (words.isNullAt(i + t)) null else words.getUTF8String(i + t)
        t += 1
      }
      val g = org.apache.spark.unsafe.types.UTF8String.concatWs(WordGrams.space, buf: _*)
      if (distinct) seen.add(g) else kept.add(g)
      i += 1
    }
    val src: java.util.Iterator[org.apache.spark.unsafe.types.UTF8String] =
      if (distinct) seen.iterator() else kept.iterator()
    val out = new Array[Any](if (distinct) seen.size else kept.size)
    var o = 0
    while (src.hasNext) { out(o) = Long.box(hash60(md, src.next())); o += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalGram($a);
       """.stripMargin
    })
  }

  /** Codegen entry point — public so generated code can call it. */
  def evalGram(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object TextHash {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Shims

  /** Column wrapper: all NumHashes permutation minima in one pass. */
  def minhashSigs(xs: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    Shims.column(MinHashSigs(Shims.expression(xs), as, bs, p))

  /** Column wrapper: winnowing fingerprint selection over a word array. */
  def winnowSelect(words: Column, k: Int, w: Int): Column =
    Shims.column(WinnowSelect(Shims.expression(words), k, w))

  /** Column wrapper: stride-1 (pos, md5-hex) gram digests. */
  def gramDigests(words: Column, w: Int): Column =
    Shims.column(GramDigests(Shims.expression(words), w))

  /** Column wrapper: stride-1 (pos, raw-16-byte md5) gram digests —
    * half the shuffle bytes for key-only consumers (hex(g) parity). */
  def gramDigestsBin(words: Column, w: Int): Column =
    Shims.column(GramDigests(Shims.expression(words), w, hexOut = false))

  /** Column wrapper: one-pass t6 repetition statistics. */
  def repStats(words: Column): Column =
    Shims.column(RepStats(Shims.expression(words)))

  /** Column wrapper: distinct w-gram strings in first-occurrence order. */
  def wordGrams(words: Column, w: Int): Column =
    Shims.column(WordGrams(Shims.expression(words), w))

  /** Column wrapper: distinct w-gram raw md5 digests (key-only use). */
  def wordGramDigests(words: Column, w: Int): Column =
    Shims.column(WordGrams(Shims.expression(words), w, digestOut = true))

  /** Column wrapper: w-gram 60-bit portable hashes mod p. */
  def gramHashes(words: Column, w: Int, p: Long, distinct: Boolean): Column =
    Shims.column(GramHashes(Shims.expression(words), w, p, distinct))

  /** Column wrapper: row-local SimHash fingerprint over a token array. */
  def simHash(words: Column, bits: Int): Column =
    Shims.column(SimHash(Shims.expression(words), bits))
}
