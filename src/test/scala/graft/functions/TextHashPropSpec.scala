package graft.functions

import graft.SparkFixture
import graft.operators.Dedup
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property checks for the native text/vector kernels against the
  * interpreted expression forms they replaced, on RANDOM inputs the
  * real corpus cannot cover: non-ASCII and supplementary-plane words
  * (where `length()` counts code points, not UTF-16 units — the trap
  * for a String.length-based reimplementation), repeated words,
  * single-word and exactly-boundary-length documents. Each case runs
  * the real Spark expressions side by side. */
object TextHashPropSpec extends Properties("textHash") {

  private lazy val spark = SparkFixture.session

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  // Words spanning ASCII, Latin-1, CJK, and the supplementary plane
  // (U+1D538 𝔸, U+1F600 😀 — 2 UTF-16 units, 1 code point each).
  private val word: Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "bb", "the", "héllo", "日本", "𝔸x", "a😀b", "ß"),
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.stringOfN(2, Gen.oneOf('é', '中', 'ß', 'q')))

  private val wordsGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 14)
    ws <- Gen.listOfN(n, word)
  } yield ws

  property("repStatsEqualsInterpretedForms") = Prop.forAll(Gen.listOfN(5, wordsGen)) { docs =>
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def mode(arr: String) =
      s"""aggregate(array_sort($arr),
         |  struct(cast(null as string) AS prev, 0L AS run, 0L AS best),
         |  (acc, w) -> struct(w AS prev,
         |    CASE WHEN acc.prev = w THEN acc.run + 1 ELSE 1L END AS run,
         |    greatest(acc.best,
         |      CASE WHEN acc.prev = w THEN acc.run + 1 ELSE 1L END) AS best),
         |  acc -> acc.best)""".stripMargin
    val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("doc_id", "ws")
      .withColumn("bg", when(size(col("ws")) >= 2, expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .otherwise(array().cast("array<string>")))
    val rows = df.select(
      size(col("ws")).cast("long").as("a1"),
      expr("size(array_distinct(ws))").cast("long").as("a2"),
      expr(mode("ws")).as("a3"),
      when(size(col("bg")) > 0, expr(mode("bg"))).otherwise(lit(0L)).as("a4"),
      expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").as("a5"),
      TextHash.repStats(col("ws")).as("st")).collect()
    rows.forall { r =>
      val st = r.getStruct(5)
      (0 until 5).forall(i => r.getLong(i) == st.getLong(i))
    }
  }

  property("winnowSelectEqualsInterpretedForm") = Prop.forAll(Gen.listOfN(5, wordsGen)) { docs =>
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import Dedup.{WinnowK, WinnowW}
    val legacy = expr(
      s"""flatten(transform(array(
         |  transform(sequence(1, size(ws) - ${WinnowK - 1}), i ->
         |    cast(conv(substring(md5(concat_ws(' ', slice(ws, i, $WinnowK))), 1, 15), 16, 10) as bigint))),
         |  hs -> array_distinct(transform(sequence(1, greatest(size(hs) - ${WinnowW - 1}, 1)), j ->
         |    array_min(slice(hs, j, $WinnowW))))))""".stripMargin)
    val rows = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("doc_id", "ws")
      .filter(size(col("ws")) >= WinnowK)
      .select(legacy.as("a"),
        TextHash.winnowSelect(col("ws"), WinnowK, WinnowW).as("b"))
      .collect()
    rows.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  property("wordGramsAndGramHashesEqualInterpretedForms") = Prop.forAll(Gen.listOfN(5, wordsGen)) { docs =>
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val P = Dedup.P
    val rows = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("doc_id", "ws")
      .filter(size(col("ws")) >= 3)
      .select(
        expr("array_distinct(transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3))))").as("a"),
        TextHash.wordGrams(col("ws"), 3).as("b"),
        expr(
          s"""transform(array_distinct(transform(sequence(1, size(ws) - 2), i ->
             |  concat_ws(' ', slice(ws, i, 3)))),
             |  g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % $P)""".stripMargin).as("c"),
        TextHash.gramHashes(col("ws"), 3, P, distinct = true).as("d"),
        expr(s"transform(ws, wd -> cast(conv(substring(md5(wd), 1, 15), 16, 10) as bigint) % $P)").as("e"),
        TextHash.gramHashes(col("ws"), 1, P, distinct = false).as("f"))
      .collect()
    rows.forall(r =>
      r.getSeq[String](0) == r.getSeq[String](1) &&
        r.getSeq[Long](2) == r.getSeq[Long](3) &&
        r.getSeq[Long](4) == r.getSeq[Long](5))
  }

  property("gramDigestsEqualsInterpretedForm") = Prop.forAll(Gen.listOfN(5, wordsGen)) { docs =>
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Dedup.SpanWords
    val legacy = expr(
      s"""transform(sequence(1, size(ws) - ${w - 1}),
         |  p -> struct(p AS pos, md5(concat_ws(' ', slice(ws, p, $w))) AS g))""".stripMargin)
    val rows = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("doc_id", "ws")
      .filter(size(col("ws")) >= w)
      .select(legacy.as("a"), TextHash.gramDigests(col("ws"), w).as("b"))
      .collect()
    rows.forall { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getInt(0), x.getString(1)))
      val b = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getString(1)))
      a == b
    }
  }

  property("minHashSigsEqualsInterpretedForm") = Prop.forAll(
    Gen.listOfN(5, Gen.listOfN(6, Gen.chooseNum(0L, Dedup.P - 1)))) { hsLists =>
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import Dedup.{As, Bs, NumHashes, P}
    val legacy = array((0 until NumHashes).map(i =>
      expr(s"array_min(transform(hs, x -> (x * ${As(i)} + ${Bs(i)}) % $P))")): _*)
    val rows = hsLists.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
      .toDF("doc_id", "hs")
      .select(legacy.as("a"), TextHash.minhashSigs(col("hs"), As, Bs, P).as("b"))
      .collect()
    rows.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  // Texts mixing punctuation, digit/letter runs, space RUNS (the
  // collapse rule), leading/trailing spaces, and multi-byte chars
  // (every byte of which must strip wholly, like the regex's
  // per-character class test).
  private val rawText: Gen[String] = for {
    n <- Gen.chooseNum(0, 24)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf("a", "Zz", "42", "Hello,", "WORLD!", " ", "  ", "   ",
        "é", "日本", "𝔸", "😀", "a-b_c", "x.y", "§¶", "\t", "\n"),
      Gen.stringOfN(4, Gen.asciiPrintableChar)))
  } yield parts.mkString

  property("normalizeAsciiEqualsRegexChain") = Prop.forAll(Gen.listOfN(8, rawText)) { texts =>
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = texts.toDF("text").select(
      regexp_replace(
        lower(regexp_replace(col("text"), lit("[^A-Za-z0-9 ]"), lit(""))),
        lit(" +"), lit(" ")).as("a"),
      CharNorm.normalizeAscii(col("text")).as("b")).collect()
    rows.forall(r => r.getString(0) == r.getString(1))
  }
}
