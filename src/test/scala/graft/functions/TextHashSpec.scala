package graft.functions

import graft.SparkFixture
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity pins for the native text-hash kernels that replaced the
  * interpreted higher-order forms in d12 (WinnowSelect) and d13 /
  * the streaming sigExpr (MinHashSigs). The legacy expressions are
  * reproduced here verbatim and compared element-for-element on the
  * real corpus — the same discipline AdaptiveBucketSpec applies to
  * ArrayDot. */
class TextHashSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  test("MinHashSigs equals the 16-way array_min(transform(...)) form") {
    import Dedup.{As, Bs, NumHashes, P}
    val docs = graft.Tables.t(spark, dir, "documents")
    val base = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), expr(
        s"""transform(array_distinct(transform(sequence(1, size(w) - 2), i ->
           |  concat_ws(' ', slice(w, i, 3)))),
           |  g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % $P)""".stripMargin).as("hs"))
    val legacy = array((0 until NumHashes).map(i =>
      expr(s"array_min(transform(hs, x -> (x * ${As(i)} + ${Bs(i)}) % $P))")): _*)
    val rows = base
      .select(col("doc_id"), legacy.as("a"),
        TextHash.minhashSigs(col("hs"), As, Bs, P).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("MinHashSigs edge cases: empty and null-element inputs") {
    import Dedup.{As, Bs, P}
    val r = spark.sql("SELECT 1")
      .select(
        TextHash.minhashSigs(expr("cast(array() as array<bigint>)"), As, Bs, P).as("e"),
        TextHash.minhashSigs(expr("array(cast(null as bigint))"), As, Bs, P).as("n"),
        TextHash.minhashSigs(expr("array(cast(null as bigint), 7L)"), As, Bs, P).as("m"),
        TextHash.minhashSigs(expr("cast(null as array<bigint>)"), As, Bs, P).as("nn"))
      .collect()(0)
    // empty / all-null → 16 nulls, exactly array_min-of-empty
    assert(r.getSeq[Any](0) == Seq.fill(Dedup.NumHashes)(null))
    assert(r.getSeq[Any](1) == Seq.fill(Dedup.NumHashes)(null))
    // null elements skipped like array_min
    val expected = (0 until Dedup.NumHashes).map(i => (7L * As(i) + Bs(i)) % P)
    assert(r.getSeq[Long](2) == expected)
    assert(r.isNullAt(3))
  }

  test("WordGrams equals array_distinct(transform(concat_ws(slice))) on the corpus") {
    val docs = graft.Tables.t(spark, dir, "documents")
    val rows = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))))").as("a"),
        TextHash.wordGrams(col("w"), 3).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // order-sensitive: first-occurrence distinct must match
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }

  test("GramHashes (distinct) equals hash-of-distinct-grams; (w=1) equals the per-word lambda") {
    import Dedup.P
    val docs = graft.Tables.t(spark, dir, "documents")
    val rows = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr(
          s"""transform(array_distinct(transform(sequence(1, size(w) - 2), i ->
             |  concat_ws(' ', slice(w, i, 3)))),
             |  g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % $P)""".stripMargin).as("a"),
        TextHash.gramHashes(col("w"), 3, P, distinct = true).as("b"),
        expr(s"transform(w, wd -> cast(conv(substring(md5(wd), 1, 15), 16, 10) as bigint) % $P)").as("c"),
        TextHash.gramHashes(col("w"), 1, P, distinct = false).as("d"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)} grams")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"doc ${r.getLong(0)} words")
    }
  }

  test("WordGrams digest form: each entry is md5 of the corresponding gram string") {
    val docs = graft.Tables.t(spark, dir, "documents")
    val rows = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        expr("transform(" +
          "array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))))," +
          " g -> md5(g))").as("a"),
        TextHash.wordGramDigests(col("w"), 3).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[String](1)
      val b = r.getSeq[Array[Byte]](2).map(_.map("%02x".format(_)).mkString)
      assert(a == b, s"doc ${r.getLong(0)}")
    }
  }

  test("GramHashes edge cases: short input, null word at w=1, null input") {
    import Dedup.P
    val r = spark.sql("SELECT 1")
      .select(
        TextHash.gramHashes(expr("array('a', 'b')"), 3, P, distinct = true).as("short"),
        TextHash.gramHashes(expr("array('a', cast(null as string))"), 1, P, distinct = false).as("nw"),
        expr(s"transform(array('a', cast(null as string)), wd -> cast(conv(substring(md5(wd), 1, 15), 16, 10) as bigint) % $P)").as("nwRef"),
        TextHash.gramHashes(expr("cast(null as array<string>)"), 3, P, distinct = true).as("nn"))
      .collect()(0)
    assert(r.getSeq[Any](0) == Seq.empty)
    assert(r.getSeq[Any](1) == r.getSeq[Any](2)) // null word → null hash, like the lambda
    assert(r.isNullAt(3))
  }

  test("row-local minhashSignatures equals the explode + groupBy aggregation form") {
    import Dedup.{As, Bs, NumHashes, P}
    val docs = graft.Tables.t(spark, dir, "documents")
    // The retired batch form, verbatim: explode distinct shingles,
    // hash each, 16-way min aggregation per doc.
    val legacy = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(
        expr("array_distinct(transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))))")).as("shingle"))
      .select(col("doc_id"),
        (Dedup.portableHash(col("shingle")) % P).as("xm"))
      .groupBy(col("doc_id"))
      .agg(
        min((col("xm") * As(0) + Bs(0)) % P).as("mh0"),
        (1 until NumHashes).map(i => min((col("xm") * As(i) + Bs(i)) % P).as(s"mh$i")): _*)
    val a = legacy.orderBy("doc_id").collect().map(_.toSeq)
    val b = Dedup.minhashSignatures(spark, dir).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("WinnowSelect equals the nested higher-order winnowing form") {
    import Dedup.{WinnowK, WinnowW}
    val docs = graft.Tables.t(spark, dir, "documents")
    val legacy = expr(
      s"""flatten(transform(array(
         |  transform(sequence(1, size(w) - ${WinnowK - 1}), i ->
         |    cast(conv(substring(md5(concat_ws(' ', slice(w, i, $WinnowK))), 1, 15), 16, 10) as bigint))),
         |  hs -> array_distinct(transform(sequence(1, greatest(size(hs) - ${WinnowW - 1}, 1)), j ->
         |    array_min(slice(hs, j, $WinnowW))))))""".stripMargin)
    val rows = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= WinnowK)
      .select(col("doc_id"), legacy.as("a"),
        TextHash.winnowSelect(col("w"), WinnowK, WinnowW).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // order-sensitive comparison: first-occurrence distinct must match
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("GramDigests equals the per-position md5(concat_ws(slice)) form") {
    val w = Dedup.SpanWords
    val docs = graft.Tables.t(spark, dir, "documents")
    val legacy = expr(
      s"""transform(sequence(1, size(ws) - ${w - 1}),
         |  p -> struct(p AS pos, md5(concat_ws(' ', slice(ws, p, $w))) AS g))""".stripMargin)
    val rows = docs
      .select(col("doc_id"),
        filter(split(trim(col("text")), "\\s+"), x => length(x) > lit(0)).as("ws"))
      .filter(size(col("ws")) >= w)
      .select(col("doc_id"), legacy.as("a"),
        TextHash.gramDigests(col("ws"), w).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getString(1)))
      val b = r.getSeq[org.apache.spark.sql.Row](2).map(x => (x.getInt(0), x.getString(1)))
      assert(a == b, s"doc ${r.getLong(0)}")
    }
  }

  test("row-local SimHash equals the explode + bit-vote aggregation form") {
    import Dedup.SimHashBits
    val docs = graft.Tables.t(spark, dir, "documents")
    // The retired form, verbatim: explode tokens, hash, one ±1
    // conditional sum per bit, recompose.
    val toks = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("doc_id"), Dedup.portableHash(col("tok")).as("h"))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val legacy = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until SimHashBits).map { b =>
          when(col(s"s$b") > 0, lit(1L) * (1L << b)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
    val a = legacy.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Dedup.simhash(spark, dir).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("GramDigests binary form: hex(g) equals the hex form exactly") {
    val w = Dedup.SpanWords
    val docs = graft.Tables.t(spark, dir, "documents")
    val rows = docs
      .select(col("doc_id"),
        filter(split(trim(col("text")), "\\s+"), x => length(x) > lit(0)).as("ws"))
      .filter(size(col("ws")) >= w)
      .select(col("doc_id"),
        TextHash.gramDigests(col("ws"), w).as("a"),
        TextHash.gramDigestsBin(col("ws"), w).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getString(1)))
      val b = r.getSeq[org.apache.spark.sql.Row](2).map { x =>
        (x.getInt(0), x.getAs[Array[Byte]](1).map("%02x".format(_)).mkString)
      }
      assert(a == b, s"doc ${r.getLong(0)}")
    }
  }

  test("RepStats equals the interpreted sort/fold/distinct stat forms") {
    val docs = graft.Tables.t(spark, dir, "documents")
    // The retired forms, verbatim: run-length mode count over
    // array_sort, array_distinct size, length fold, bigram array.
    def mode(arr: String) =
      s"""aggregate(array_sort($arr),
         |  struct(cast(null as string) AS prev, 0L AS run, 0L AS best),
         |  (acc, w) -> struct(w AS prev,
         |    CASE WHEN acc.prev = w THEN acc.run + 1 ELSE 1L END AS run,
         |    greatest(acc.best,
         |      CASE WHEN acc.prev = w THEN acc.run + 1 ELSE 1L END) AS best),
         |  acc -> acc.best)""".stripMargin
    val rows = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .withColumn("bg", when(size(col("ws")) >= 2, expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("a_words"),
        expr("size(array_distinct(ws))").cast("long").as("a_distinct"),
        expr(mode("ws")).as("a_top_word"),
        when(size(col("bg")) > 0, expr(mode("bg"))).otherwise(lit(0L)).as("a_top_bigram"),
        expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").as("a_sum_len"),
        TextHash.repStats(col("ws")).as("st"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val st = r.getStruct(6)
      assert(Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        Seq(st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3), st.getLong(4)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("RepStats edges: single word, repeated words, unicode lengths") {
    val r = spark.sql("SELECT 1")
      .select(
        TextHash.repStats(expr("array('a')")).as("one"),
        TextHash.repStats(expr("array('x','x','y','x y','x y')")).as("rep"),
        TextHash.repStats(expr("array('héllo','日本')")).as("uni"))
      .collect()(0)
    val one = r.getStruct(0)
    assert((one.getLong(0), one.getLong(1), one.getLong(2), one.getLong(3), one.getLong(4)) ==
      ((1L, 1L, 1L, 0L, 1L)))
    val rep = r.getStruct(1)
    // words: x×2, y, 'x y'×2 → top word 2; bigrams "x x","x y",
    // "y x y","x y x y" all distinct → top bigram 1; distinct 3;
    // sum len 1+1+1+3+3 = 9
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getLong(3), rep.getLong(4)) ==
      ((5L, 3L, 2L, 1L, 9L)))
    val uni = r.getStruct(2)
    // code-point lengths like Spark's length(): 5 + 2
    assert((uni.getLong(0), uni.getLong(4)) == ((2L, 7L)))
  }

  test("GramDigests edges: short input empty, null words skipped") {
    val r = spark.sql("SELECT 1")
      .select(
        TextHash.gramDigests(expr("array('a','b')"), 3).as("short"),
        TextHash.gramDigests(
          expr("array('a', cast(null as string), 'b')"), 3).as("nulls"))
      .collect()(0)
    assert(r.getSeq[Any](0) == Seq.empty)
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex("a b")
    val got = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getString(1)))
    assert(got == Seq((1, hex)))
  }

  test("WinnowSelect edges: exactly K words, fewer grams than W, null words") {
    import Dedup.{WinnowK, WinnowW}
    // K words → 1 gram → 1 window (fewer grams than W clamps to one
    // all-gram window); null words are skipped like concat_ws.
    val r = spark.sql("SELECT 1")
      .select(
        TextHash.winnowSelect(expr("array('a','b','c')"), WinnowK, WinnowW).as("one"),
        TextHash.winnowSelect(
          expr("array('a', cast(null as string), 'b')"), WinnowK, WinnowW).as("nulls"),
        TextHash.winnowSelect(expr("array('a','b')"), WinnowK, WinnowW).as("short"))
      .collect()(0)
    val h = (s: String) => {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((0 until 8).foldLeft(0L)((v, b) => (v << 8) | (d(b) & 0xffL))) >>> 4
    }
    assert(r.getSeq[Long](0) == Seq(h("a b c")))
    assert(r.getSeq[Long](1) == Seq(h("a b")))
    assert(r.getSeq[Long](2) == Seq.empty)
  }
}
