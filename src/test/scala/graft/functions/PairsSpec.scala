package graft.functions

import graft.SparkFixture
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity pins for the native in-bucket pair kernels that
  * replaced the interpreted nested-transform forms in d2/d12/d13
  * (SortedPairs) and minhashLsh/d13-near (SigAgreePairs). The legacy
  * expressions are reproduced verbatim and compared
  * element-for-element on real corpus posting lists and buckets. */
class PairsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  test("SortedPairs equals the nested flatten(transform(slice)) form on real posting lists") {
    val docs = graft.Tables.t(spark, dir, "documents")
    // d2's real posting lists: shingle → sorted doc list (uncapped to
    // also cover lists longer than the DF cap)
    val buckets = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(TextHash.wordGrams(col("w"), 3)).as("shingle"))
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
    val legacy = expr(
      """flatten(transform(ds, (a, i) ->
        |  transform(slice(ds, i + 2, size(ds) - i - 1), b ->
        |    named_struct('id_a', a, 'id_b', b))))""".stripMargin)
    val rows = buckets
      .select(legacy.as("a"), Pairs.sortedPairs(col("ds"), "id_a", "id_b").as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getLong(0), x.getLong(1)))
      val b = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1)))
      assert(a == b)
    }
  }

  test("SigAgreePairs equals the nested transform + zip_with fold on real LSH buckets") {
    import Dedup.{As, Bs, NumHashes, P}
    val docs = graft.Tables.t(spark, dir, "documents")
    val sigd = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        TextHash.minhashSigs(
          TextHash.gramHashes(col("w"), 3, P, distinct = true), As, Bs, P).as("sig"))
    val nBands = NumHashes / 2
    val buckets = sigd
      .select(col("doc_id"), col("sig"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band_id"),
            concat_ws(":", col("sig").getItem(2 * b), col("sig").getItem(2 * b + 1)).as("band_key"))
        }: _*)).as("bk"))
      .groupBy(col("bk.band_id"), col("bk.band_key"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sig")))).as("ms"))
      .filter(size(col("ms")) > 1)
    val legacy = expr(
      s"""flatten(transform(ms, (a, i) ->
         |  transform(slice(ms, i + 2, size(ms) - i - 1), b ->
         |    named_struct(
         |      'id_a', a.doc_id, 'id_b', b.doc_id,
         |      'n_eq', aggregate(zip_with(a.sig, b.sig,
         |        (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)))))""".stripMargin)
    val rows = buckets
      .select(legacy.as("a"), Pairs.sigAgreePairs(col("ms"), "id_a", "id_b").as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
      val b = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
      assert(a == b)
    }
  }

  test("SigAgreePairs carries STRING keys (d13's span fingerprints)") {
    val df = spark.sql(
      """SELECT array(
        |  named_struct('fp', 'aa', 'sig', array(1L, 2L, 3L)),
        |  named_struct('fp', 'bb', 'sig', array(1L, 9L, 3L)),
        |  named_struct('fp', 'cc', 'sig', array(7L, 9L, 3L))) AS ms""".stripMargin)
    val r = df.select(Pairs.sigAgreePairs(col("ms"), "fp_a", "fp_b").as("p")).collect()(0)
    val got = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getString(1), x.getInt(2)))
    assert(got == Seq(("aa", "bb", 2), ("aa", "cc", 1), ("bb", "cc", 2)))
  }

  test("WordBigrams equals the guarded transform(sequence) lambda on the corpus") {
    val docs = graft.Tables.t(spark, dir, "documents")
    val legacy = expr(
      """if(size(ws) < 2, array(),
        |   transform(sequence(1, size(ws) - 1),
        |     i -> struct(ws[i - 1] AS w1, ws[i] AS w2)))""".stripMargin)
    val rows = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), legacy.as("a"), Pairs.wordBigrams(col("ws")).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getString(1)))
      val b = r.getSeq[org.apache.spark.sql.Row](2).map(x => (x.getString(0), x.getString(1)))
      assert(a == b, s"doc ${r.getLong(0)}")
    }
  }

  test("CrossPairsNe equals the filter(flatten(transform x transform)) cross") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L), array(2L, 3L, 4L)),
        |  (array(5L), array(5L)),
        |  (array(6L, 7L), array(8L)),
        |  (cast(array() as array<bigint>), array(1L))
        |AS t(docs_a, docs_b)""".stripMargin)
    val legacy = expr(
      """filter(flatten(transform(docs_a, a ->
        |  transform(docs_b, b -> struct(a AS da, b AS db)))),
        |  p -> p.da != p.db)""".stripMargin)
    val rows = df
      .select(legacy.as("a"), Pairs.crossPairsNe(col("docs_a"), col("docs_b")).as("b"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getLong(0), x.getLong(1)))
      val b = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1)))
      assert(a == b)
    }
  }

  test("PosPairs equals the cross-doc transform/filter/slice form on real posting lists") {
    import Dedup.SpanWords
    val docs = graft.Tables.t(spark, dir, "documents")
    // d14's real gram posting lists: digest → sorted (doc_id, pos)
    val buckets = docs
      .select(col("doc_id"),
        filter(split(trim(col("text")), "\\s+"), x => length(x) > lit(0)).as("ws"))
      .filter(size(col("ws")) >= SpanWords)
      .select(col("doc_id"),
        explode(TextHash.gramDigests(col("ws"), SpanWords)).as("t"))
      .groupBy(col("t.g"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("t.pos").as("pos")))).as("ms"))
      .filter(size(col("ms")) > 1)
    val legacy = expr(
      """flatten(transform(ms, (a, i) ->
        |  transform(filter(slice(ms, i + 2, size(ms) - i - 1),
        |      b -> b.doc_id != a.doc_id),
        |    b -> struct(a.doc_id AS id_a, a.pos AS pos_a,
        |      b.doc_id AS id_b, b.pos AS pos_b))))""".stripMargin)
    val rows = buckets
      .select(legacy.as("a"), Pairs.posPairs(col("ms")).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getInt(3)))
      val b = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getInt(3)))
      assert(a == b)
    }
  }

  test("pair-count overflow fails fast with a clear error, not a negative array size") {
    // 66k elements -> ~2.18e9 pairs > 2^31-1: the Long-computed bound
    // must raise the named error (every in-repo caller caps buckets
    // at <= 1024, so this is the uncapped-reuse contract, not a path
    // production data can reach)
    val e = intercept[org.apache.spark.SparkException] {
      spark.sql("SELECT 1")
        .select(Pairs.sortedPairs(
          expr("transform(sequence(1L, 66000L), x -> x)"), "a", "b"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m =>
      m.contains("sorted_pairs") && m.contains("cap the bucket")),
      s"expected the sorted_pairs overflow error, got: ${msgs(e)}")
  }

  test("edge cases: empty, single-element, null input") {
    val r = spark.sql("SELECT 1")
      .select(
        Pairs.sortedPairs(expr("cast(array() as array<bigint>)"), "a", "b").as("e"),
        Pairs.sortedPairs(expr("array(5L)"), "a", "b").as("s"),
        Pairs.sortedPairs(expr("cast(null as array<bigint>)"), "a", "b").as("n"),
        Pairs.sigAgreePairs(
          expr("cast(array() as array<struct<doc_id: bigint, sig: array<bigint>>>)"),
          "a", "b").as("se"))
      .collect()(0)
    assert(r.getSeq[Any](0).isEmpty && r.getSeq[Any](1).isEmpty)
    assert(r.isNullAt(2))
    assert(r.getSeq[Any](3).isEmpty)
  }
}
