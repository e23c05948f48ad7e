package graft.operators

import graft.functions.Bpe

import org.scalacheck.{Gen, Prop, Properties}

/** Property check for [[Bpe.wordTokens]]: on RANDOM words the
  * zero-allocation span walk must equal the separator-string replace
  * fold it replaced (TextOps.bpeTokenCountScala) — same one-pass-
  * per-rule discipline, including the boundary-blocking quirk after a
  * merge. The generator skews toward the hazardous shapes: words
  * built from merge-rule letters (dense rule hits, chained merges),
  * same-pair runs ("llll…"), and mixed alphabets. Also pins the
  * whitespace splitter: docTokens over a randomly-spaced document
  * equals the per-word sum under a \s+ split. */
object BpePropSpec extends Properties("bpe") {

  private val ruleChars = Gen.oneOf("thenadorisucklmwfgpqb".toSeq)
  private val word: Gen[String] = Gen.oneOf(
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, ruleChars)),
    Gen.chooseNum(1, 10).flatMap(n => Gen.stringOfN(n, Gen.oneOf('l', 't', 'h'))),
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar)))

  property("spanWalkEqualsReplaceFold") = Prop.forAll(Gen.listOfN(40, word)) { ws =>
    ws.forall(w =>
      Bpe.wordTokens(w) == TextOps.bpeTokenCountScala(w))
  }

  property("docTokensEqualsPerWordSum") = Prop.forAll(
    for {
      n <- Gen.chooseNum(0, 10)
      ws <- Gen.listOfN(n, word)
      seps <- Gen.listOfN(n + 1, Gen.oneOf(" ", "  ", "\t", " \n "))
    } yield (ws, seps)
  ) { case (ws, seps) =>
    val doc = seps.head + ws.zip(seps.tail).map { case (w, s) => w + s }.mkString
    val expected = ws.filter(_.nonEmpty).map(w => Bpe.wordTokens(w).toLong).sum
    Bpe.docTokens(org.apache.spark.unsafe.types.UTF8String.fromString(doc)) == expected
  }
}
