package graft.operators

import graft.SparkFixture
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property check for [[Dedup.sigExpr]]: on RANDOM documents (not
  * just the real corpus in PipelineOpsSpec) the narrow per-row
  * signature must bit-equal the batch explode/groupBy MinHash — the
  * equivalence the streaming ingest-dedup twin (DedupStream) rests
  * on. Generator covers the awkward cases: docs under 3 words (NULL
  * signature on both paths), repeated words (distinct-shingle
  * collapse), leading/trailing/multiple spaces (trim + \s+ split),
  * and short/degenerate tokens. */
object SigExprPropSpec extends Properties("sigExpr") {

  private lazy val spark = SparkFixture.session

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val word: Gen[String] =
    Gen.oneOf(Gen.oneOf("a", "bb", "the", "data", "spark", "x1"),
      Gen.stringOfN(3, Gen.alphaLowerChar))
  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, word)
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + ws.mkString(" ") + pad

  property("narrowSignatureEqualsBatchSignature") = Prop.forAll(Gen.listOfN(6, doc)) { texts =>
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val narrow = docs.select(col("doc_id"), Dedup.sigExpr(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toIndexedSeq))).toMap
    // batch form, inlined from minhashSignatures over an arbitrary frame
    val sh = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))"
      ))).as("shingle"))
      .select(col("doc_id"), (Dedup.portableHash(col("shingle")) % Dedup.P).as("xm"))
    val aggs = (0 until Dedup.NumHashes).map(i =>
      min((col("xm") * Dedup.As(i) + Dedup.Bs(i)) % Dedup.P).as(s"mh$i"))
    val batch = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (0 until Dedup.NumHashes).map(i => r.getLong(i + 1)).toIndexedSeq).toMap
    val ok = narrow.forall { case (id, sig) => sig == batch.get(id) }
    val coverage = narrow.keySet.size == texts.length
    ok && coverage
  }
}
