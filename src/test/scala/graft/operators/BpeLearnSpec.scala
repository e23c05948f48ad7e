package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** t18 BPE vocabulary learning (Sennrich et al. 2016).
  *
  * Pins three properties:
  *  1. the distributed learner equals a sequential in-spec reference
  *     learner (same semantics, independent implementation) on the
  *     real sf0.001 corpus — the aggregation/argmax/re-segment loop
  *     is exact, not approximately right;
  *  2. on a crafted weighted corpus, the learned table reproduces
  *     t10's full 48-rule merge table rule-for-rule (the round-9/10
  *     verdict's "learning reproduces the applied table" property);
  *  3. every learned rule is well-formed BPE: each side is a single
  *     character or the surface of an earlier merge.
  */
class BpeLearnSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session
  private val Sep = "\u0001"

  /** Sequential reference learner: driver-side word counting and the
    * same separator-string replace schedule. */
  private def referenceLearn(wordCounts: Map[String, Long],
                             rounds: Int): Seq[(Long, String, String, Long)] = {
    var segs = wordCounts.map { case (w, n) => (Sep + w.mkString(Sep) + Sep, n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seg, n) <- segs) {
        val ls = seg.split(Sep).filter(_.nonEmpty)
        var i = 0
        while (i + 1 < ls.length) {
          counts((ls(i), ls(i + 1))) = counts.getOrElse((ls(i), ls(i + 1)), 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // Tie-break in UTF-8 byte order (what DuckDB's ORDER BY and
        // the production learner use) — Java tuple ordering would
        // compare UTF-16 code units, which diverges off the BMP
        // (round-11 ADVICE).
        val ((l, rr), c) = counts.min(Ordering.fromLessThan[((String, String), Long)] {
          case (((a1, b1), n1), ((a2, b2), n2)) =>
            if (n1 != n2) n1 > n2
            else if (a1 != a2) TextOps.utf8Less(a1, a2)
            else TextOps.utf8Less(b1, b2)
        })
        out += ((r + 1L, l, rr, c))
        segs = segs.groupBy { case (seg, _) =>
          seg.replace(Sep + l + Sep + rr + Sep, Sep + l + rr + Sep)
        }.map { case (seg, m) => (seg, m.values.sum) }
      }
      r += 1
    }
    out.toSeq
  }

  private def learned(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("incremental learner equals the sequential reference on the real corpus") {
    val docs = graft.Tables.t(spark, SparkFixture.Sf0001, "documents")
    val words = docs.selectExpr("explode(split(trim(lower(text)), '\\\\s+')) AS w")
      .where("length(w) > 0").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceLearn(words, TextOps.BpeLearnRounds)
    val got = learned(TextOps.bpeLearn(spark, SparkFixture.Sf0001))
    assert(got == want)
    // At the production k=256 the 31-word corpus DRIES before the
    // round budget — both learners must stop the same round, with
    // every learnable merge found.
    assert(got.nonEmpty && got.size <= TextOps.BpeLearnRounds)
    assert(got.size == want.size)
  }

  /** Carrier weights solved offline so that at every round the
    * intended pair of [[graft.functions.Bpe.Merges]] wins the argmax
    * (carrier r = the merged surface of rule r; cross-contributions
    * from later carriers' partial segments are what make a naive
    * monotone schedule fail). Verified against the reference learner
    * here, then against the distributed learner. */
  private val CarrierWeights = Seq(
    201, 822, 513, 200, 619, 214, 114, 417, 109, 315, 111, 314, 313, 313,
    313, 312, 312, 312, 312, 311, 310, 310, 309, 308, 307, 306, 306, 306,
    306, 305, 304, 304, 304, 304, 303, 303, 100, 203, 203, 202, 202, 202,
    100, 101, 101, 101, 101, 100)

  test("learned merges reproduce t10's 48-rule table on the crafted corpus") {
    val rules = graft.functions.Bpe.Merges.map { m =>
      val Array(a, b) = m.split(" "); (a, b)
    }
    val vocab = rules.map { case (a, b) => a + b }.zip(CarrierWeights)
      .map { case (w, n) => w -> n.toLong }.toMap
    // Reference learner agrees the crafting is right...
    val ref = referenceLearn(vocab, rules.size)
    assert(ref.map(m => (m._2, m._3)) == rules)
    // ...and the distributed learner reproduces the full table.
    import spark.implicits._
    val docs = vocab.toSeq.map { case (w, n) => (w + " ") * n.toInt }.toDF("text")
    val got = learned(TextOps.bpeLearnOn(docs, rules.size))
    assert(got.map(m => (m._2, m._3)) == rules)
    assert(got.map(m => m._2 + " " + m._3) == graft.functions.Bpe.Merges)
  }

  test("vocab prune defaults change nothing on the battery corpus") {
    // The default top-2²⁰ backstop and min_count = 1 must be
    // invisible at battery scale (31-word vocab): capped == uncapped,
    // rule for rule — the CORRECTNESS hash contract for t18/t19.
    val docs = graft.Tables.t(spark, SparkFixture.Sf0001, "documents")
    val capped = learned(TextOps.bpeLearnOn(docs, TextOps.BpeLearnRounds))
    val uncapped = learned(TextOps.bpeLearnOn(docs, TextOps.BpeLearnRounds,
      minCount = 1L, maxVocab = 0))
    assert(capped == uncapped)
  }

  test("min_count prunes rare words: learn equals learning without them") {
    import spark.implicits._
    // 4 frequent words + a hapax tail that would otherwise steer
    // several early merges ("zq" pairs appear 60× across the tail —
    // dropping the tail MUST change the learned table, or this test
    // pins nothing)
    val frequent = Seq("banana" -> 40, "bandana" -> 35, "cabana" -> 30,
      "nab" -> 25)
    val tail = (1 to 60).map(i => s"zq${('a' + i % 26).toChar}$i" -> 1)
    val docs = (frequent ++ tail)
      .map { case (w, n) => (w + " ") * n }.toDF("text")
    val freqOnly = frequent.map { case (w, n) => (w + " ") * n }.toDF("text")
    val pruned = learned(TextOps.bpeLearnOn(docs, 12, minCount = 2L))
    val wantFreq = learned(TextOps.bpeLearnOn(freqOnly, 12))
    assert(pruned == wantFreq,
      "min_count=2 must equal learning over a corpus lacking the hapax tail")
    val unpruned = learned(TextOps.bpeLearnOn(docs, 12))
    assert(unpruned != pruned, "tail did not alter the unpruned table — " +
      "the prune test is vacuous, craft a stronger tail")
  }

  test("max_vocab caps the collect: learn equals learning over the top-N words") {
    import spark.implicits._
    // zebra+zebu rank 6th/7th by count but share ("z","e")/("ze","b")
    // pairs of strength 15 — above wasp's count-10 merges — so
    // capping at 5 words genuinely reroutes the late rounds
    val words = Seq("alpha" -> 50, "alps" -> 40, "paws" -> 30, "swap" -> 20,
      "wasp" -> 10, "zebra" -> 8, "zebu" -> 7)
    val docs = words.map { case (w, n) => (w + " ") * n }.toDF("text")
    // top-5 by (count DESC, word ASC): the 2- and 1-count words drop
    val top5 = words.sortBy { case (w, n) => (-n, w) }.take(5)
      .map { case (w, n) => (w + " ") * n }.toDF("text")
    val capped = learned(TextOps.bpeLearnOn(docs, 16, maxVocab = 5))
    val want = learned(TextOps.bpeLearnOn(top5, 16))
    assert(capped == want)
    assert(learned(TextOps.bpeLearnOn(docs, 16)) != capped,
      "cap at 5 of 7 words did not alter the table — strengthen the corpus")
  }

  test("generic merge application equals t10's native expression on the fixed table") {
    val rules = graft.functions.Bpe.defaultRules
    val docs = graft.Tables.t(spark, SparkFixture.Sf0001, "documents")
    val generic = TextOps.bpeApplyMergesOn(docs, rules)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val native = TextOps.bpeTokenCounts(spark, SparkFixture.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(generic.toSeq == native.toSeq)
  }

  test("native parameterized apply equals the independent replace-fold on a learned table") {
    // The production apply path (span walk, rules as a reference
    // object) against the separator-string replace fold — two
    // implementations of the replace semantics, same learned table.
    val docs = graft.Tables.t(spark, SparkFixture.Sf0001, "documents")
    val merges = learned(TextOps.bpeLearn(spark, SparkFixture.Sf0001))
      .map(m => (m._2, m._3))
    assert(merges.size > 48, s"expected a deep learned table, got ${merges.size}")
    val native = TextOps.bpeApplyMergesOn(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val fold = TextOps.bpeApplyMergesFoldOn(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(native.toSeq == fold.toSeq)
  }

  test("t19: learned-token counts are consistent with the learner's own table") {
    val docs = graft.Tables.t(spark, SparkFixture.Sf0001, "documents")
    val merges = learned(TextOps.bpeLearn(spark, SparkFixture.Sf0001))
      .map(m => (m._2, m._3))
    val direct = TextOps.bpeApplyMergesOn(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val viaT19 = TextOps.bpeLearnedTokens(spark, SparkFixture.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(viaT19 == direct)
    // Every merge strictly reduces the corpus token total vs raw chars.
    val rawChars = TextOps.bpeApplyMergesOn(docs, Seq.empty)
      .collect().map(_.getLong(2)).sum
    assert(viaT19.values.sum < rawChars)
  }

  test("every learned rule builds on characters or earlier merges") {
    val got = learned(TextOps.bpeLearn(spark, SparkFixture.Sf0001))
    val available = scala.collection.mutable.Set.empty[String]
    got.foreach { case (_, l, r, c) =>
      assert(l.length == 1 || available.contains(l), s"lhs '$l' unavailable")
      assert(r.length == 1 || available.contains(r), s"rhs '$r' unavailable")
      assert(c > 0)
      available += l + r
    }
  }
}
