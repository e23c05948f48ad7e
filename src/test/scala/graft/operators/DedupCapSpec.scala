package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** d3's MaxBandBucket cap under a degenerate corpus: 100 byte-identical
  * docs put all 100 into the same bucket in EVERY band (identical
  * signatures), which uncapped means 8 × 100²/2 generated pairs from
  * one key. With the cap the mega-bucket is dropped whole — zero
  * pairs from the clone set, while a small (2-doc) near-dup bucket
  * elsewhere in the corpus still surfaces. */
class DedupCapSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("dedup_cap").toFile.getAbsolutePath
    import spark.implicits._
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pairText = "one two three four five six seven eight nine ten"
    val docs =
      (1L to 100L).map(i => (i, boiler)) ++
        Seq((201L, pairText), (202L, pairText))
    docs.toDF("doc_id", "text").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("mega-bucket is dropped whole; small buckets still pair") {
    val capped = Dedup.minhashLsh(spark, corpusDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((201L, 202L)),
      s"expected only the small-bucket pair, got ${capped.size} pairs")
  }

  test("raising the cap reinstates the quadratic clone pairs (exactness check)") {
    val uncapped = Dedup.minhashLsh(spark, corpusDir, maxBucket = 1000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 100 * 99 / 2 + 1)
    assert(uncapped.contains((201L, 202L)))
  }

  test("d13: edited boilerplate span is caught; unrelated spans are not") {
    import spark.implicits._
    // doc 1 and 2 share a 10-word template with ONE word substituted
    // (9/10 word overlap — exact d11 fingerprints differ); doc 3 is
    // disjoint vocabulary
    val tpl = "terms of service apply to all users of this site"
    val edited = "terms of service apply to all members of this site"
    val other = "quick brown fox jumps over the lazy dog again today"
    val docs = Seq((1L, tpl), (2L, edited), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.spanMinhashDupsOn(docs, Dedup.NumHashes / 2, Dedup.MaxBandBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1L)),
      s"expected exactly the edited-template pair, got $pairs")
  }

  test("d13: identical spans inside one doc collapse to one unit, no self pairs") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, s"$span\n\n$span"), (2L, span)).toDF("doc_id", "text")
    val pairs = Dedup.spanMinhashDupsOn(docs, Dedup.NumHashes / 2, Dedup.MaxBandBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1L)), s"got $pairs")
  }

  test("d13: exact-tier short-circuit equals the minhash path it bypasses") {
    import spark.implicits._
    // Identical spans route through the exact fp-groupBy tier; their
    // signatures would agree 16/16 ≥ minEq, so the short-circuit must
    // produce exactly the pairs the band+verify path would have.
    // Mixed corpus: one span identical across 3 docs (exact tier),
    // one edited pair (near tier), one disjoint doc (no pairs) —
    // evidence counts must combine both tiers per doc pair.
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tpl = "terms of service apply to all users of this site"
    val edited = "terms of service apply to all members of this site"
    val lone = "quick brown fox jumps over the lazy dog again today"
    val docs = Seq(
      (1L, s"$same\n\n$tpl"), (2L, s"$same\n\n$edited"),
      (3L, same), (4L, lone)).toDF("doc_id", "text")
    val got = Dedup.spanMinhashDupsOn(docs, Dedup.NumHashes / 2, Dedup.MaxBandBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (1,2): identical `same` span + near-dup tpl/edited span = 2
    // (1,3), (2,3): identical `same` span only = 1; doc 4 pairs with no one
    assert(got == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L), s"got $got")
  }

  test("d13: contents held by more docs than the cap drop out whole") {
    import spark.implicits._
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pairText = "one two three four five six seven eight nine ten"
    val docs = ((1L to 60L).map(i => (i, boiler)) ++
      Seq((201L, pairText), (202L, pairText))).toDF("doc_id", "text")
    // cap 50 < 60 holders: the boilerplate content contributes no
    // pairs; the 2-doc content still surfaces through the exact tier
    val pairs = Dedup.spanMinhashDupsOn(docs, Dedup.NumHashes / 2, Dedup.MaxBandBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((201L, 202L)), s"got $pairs")
  }
}
