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
