package graft.operators

import graft.SparkFixture
import graft.Tables.t
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** d8 contamination, d9 canonical selection, t9 corpus-frequency
  * scoring: each checked against an independent driver-side
  * brute-force over the sf0.001 corpus (plain Scala collections — a
  * second implementation, not a replay of the Spark plan), on top of
  * the battery's DuckDB oracle. */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  /** Same portable 60-bit hash as Dedup.portableHash, via JDK md5. */
  private def pHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def splitOf(docId: Long, salt: String = "graft_v1"): String = {
    val b = pHash(s"$salt:$docId") % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  private def grams(text: String): Set[String] = {
    val w = text.trim.split("\\s+")
    if (w.length < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  private lazy val docs: Seq[(Long, String, Long)] =
    t(spark, dir, "documents").select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("d8 contamination matches a driver-side brute force") {
    val trainGrams = docs.iterator
      .filter(d => splitOf(d._1) == "train").flatMap(d => grams(d._2)).toSet
    val expected = docs.iterator
      .filter(d => splitOf(d._1) == "test")
      .map { case (id, text, _) =>
        val g = grams(text)
        id -> (g.size.toLong, g.count(trainGrams).toLong)
      }
      .filter(_._2._1 > 0) // <3-word docs produce no shingle rows
      .toMap
    val got = Dedup.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    val fr = Dedup.contamination(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    fr.foreach { case (n, o, c) =>
      assert(o >= 0 && o <= n && math.abs(c - o.toDouble / n) < 1e-15)
    }
  }

  test("d9 canonical selection: one keeper per group, longest wins") {
    val groups = Dedup.dupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // doc_id -> canonical_id
    val nChars = docs.map(d => d._1 -> d._3).toMap
    val expected = groups.groupBy(_._2).map { case (canon, members) =>
      val keep = members.map(_._1).maxBy(id => (nChars(id), -id))
      canon -> (keep, members.length.toLong, nChars(keep))
    }
    val got = Dedup.canonicalSelect(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("s8 PQ: codes, ADC distances and top-k match a driver-side brute force") {
    import Similarity.{PqM, PqSub, PqK}
    val vecs = t(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .sortBy(_._1)
    val cb = (0 until PqM).map(m => vecs.take(PqK).map(_._2.slice(m * PqSub, (m + 1) * PqSub)))
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      (0 until PqSub).foldLeft(0.0)((acc, i) => { val d = a(i) - b(i); acc + d * d })
    def codes(v: IndexedSeq[Double]): Seq[Int] = (0 until PqM).map { m =>
      val sub = v.slice(m * PqSub, (m + 1) * PqSub)
      (0 until PqK).minBy(j => (l2(sub, cb(m)(j)), j))
    }
    val qv = vecs.find(_._1 == 0L).get._2
    val dtab = (0 until PqM).map(m => (0 until PqK).map(j =>
      l2(qv.slice(m * PqSub, (m + 1) * PqSub), cb(m)(j))))
    val expected = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val cs = codes(v)
      val ad = (0 until PqM).foldLeft(0.0)((acc, m) => acc + dtab(m)(cs(m)))
      (id, cs.mkString("-"), ad)
    }.sortBy(x => (x._3, x._1)).take(10)
    val got = Similarity.pqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.map(x => (x._1, x._2)).toSeq == expected.map(x => (x._1, x._2)).toSeq)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) <= 1e-12 * math.max(1.0, e._3.abs),
        s"adist mismatch for vec ${g._1}: ${g._3} vs ${e._3}")
    }
  }

  test("s10 SQ8: codes, reconstruction distances and top-k match a brute force") {
    val vecs = t(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq).sortBy(_._1)
    val dim = vecs.head._2.length
    val mns = (0 until dim).map(i => vecs.map(_._2(i)).min)
    val mxs = (0 until dim).map(i => vecs.map(_._2(i)).max)
    def code(v: IndexedSeq[Double], i: Int): Long =
      if (mxs(i) > mns(i))
        math.min(255L, math.max(0L, math.floor((v(i) - mns(i)) * 255.0 / (mxs(i) - mns(i))).toLong))
      else 0L
    val qv = vecs.find(_._1 == 0L).get._2
    val expected = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val d = (0 until dim).foldLeft(0.0) { (acc, i) =>
        val r = mns(i) + (code(v, i) + 0.5) * (mxs(i) - mns(i)) / 255.0
        val diff = qv(i) - r
        acc + diff * diff
      }
      (id, (0 until dim).map(i => code(v, i)).mkString("-"), d)
    }.sortBy(p => (p._3, p._1)).take(10)
    val got = Similarity.sqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
    // recall sanity: with 255 levels per dim, SQ8 top-10 should agree
    // almost perfectly with the exact-L2 top-10
    val exact = vecs.filter(_._1 != 0L).map { case (id, v) =>
      id -> (0 until dim).foldLeft(0.0) { (acc, i) =>
        val diff = qv(i) - v(i); acc + diff * diff
      }
    }.sortBy(p => (p._2, p._1)).take(10).map(_._1).toSet
    assert(got.map(_._1).count(exact.contains) >= 8,
      s"SQ8 top-10 overlaps exact-L2 top-10 in fewer than 8 ids")
  }

  test("d10 semantic dedup: within-cluster pairs only, exact cosines, soft cap") {
    import org.apache.spark.sql.functions.col
    val e = Similarity.vectors(spark, dir)
    val assign = Similarity.ivfAssign(e, Similarity.trainCentroids(e))
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = e.select(col("vec_id"), col("v"), col("nrm")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1).toIndexedSeq, r.getDouble(2))).toMap
    val thr = 0.2 // lower than battery so the check is non-vacuous at sf0.001
    val got = Similarity.semanticDedup(spark, dir, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // brute-force expectation: all within-cluster pairs above threshold
    val expected = (for {
      (a, (va, na)) <- vecs.toSeq
      (b, (vb, nb)) <- vecs.toSeq
      if a < b && assign(a) == assign(b)
      cos = (0 until va.length).foldLeft(0.0)((acc, i) => acc + va(i) * vb(i)) / (na * nb)
      if cos >= thr
    } yield (assign(a), a, b)).toSet
    assert(got.map(g => (g._1, g._2, g._3)).toSet == expected)
    got.foreach { case (cid, a, b, cos) =>
      assert(assign(a) == cid && assign(b) == cid)
      val (va, na) = vecs(a); val (vb, nb) = vecs(b)
      val direct = (0 until va.length).foldLeft(0.0)((acc, i) => acc + va(i) * vb(i)) / (na * nb)
      assert(math.abs(cos - direct) <= 1e-12)
    }
    // cap binds: at maxCluster = 1 every multi-member cell is over-cap
    // and switches to the representative star — pairs anchor at the
    // cell's min id, never member-vs-member (the round-12 census-cap
    // contract; the pre-cap drop-whole policy silently KEPT over-cap
    // clusters).
    val starred = Similarity
      .semanticDedup(spark, dir, threshold = thr, maxCluster = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val minByCell = vecs.keys.toSeq.groupBy(assign).map { case (c, ids) => c -> ids.min }
    assert(starred.nonEmpty)
    starred.foreach { case (cid, a, b) =>
      assert(a == minByCell(cid) && b != a && assign(b) == cid)
    }
    // and the star tier is the threshold-filtered subset of the
    // rep-anchored expected pairs
    assert(starred.map(s => (s._2, s._3)).toSet ==
      expected.filter { case (cid, a, _) => a == minByCell(cid) }
        .map(p => (p._2, p._3)))
  }

  test("narrow sigExpr equals the explode/groupBy minhash signatures") {
    import org.apache.spark.sql.functions._
    val fromAgg = Dedup.minhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> (0 until Dedup.NumHashes).map(i => r.getLong(i + 1)))
      .toMap
    val fromExpr = t(spark, dir, "documents")
      .select(col("doc_id"), Dedup.sigExpr(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    assert(fromExpr.keySet == fromAgg.keySet)
    fromExpr.foreach { case (id, sig) => assert(sig == fromAgg(id), s"doc $id") }
  }

  test("s9 PQ re-rank: candidates from stage 1, exact cosines, ordered") {
    import org.apache.spark.sql.functions.col
    val cands = Similarity.pqTopK(spark, dir, 0L, 50).collect()
      .map(_.getLong(0)).toSet
    val exact = Similarity.bruteTopK(spark, dir, 0L, 1000).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Similarity.pqRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length == 10)
    // every result came from the PQ candidate set
    got.foreach { case (id, _) => assert(cands.contains(id), s"vec $id not a candidate") }
    // re-ranked cosines are the exact ones (same values brute force computes)
    got.foreach { case (id, cos) =>
      assert(math.abs(cos - exact(id)) <= 1e-12, s"vec $id cosine drifted") }
    // descending, vec_id tiebreak
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("d11 paragraph dedup: blank-line split, span chunking, cross-doc boilerplate") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // exactly one span
    val rows = Seq(
      (1L, boiler + "\n\n" + (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, boiler + "\n\n" + (1 to 10).map(i => s"c$i").mkString(" ")),
      (3L, (1 to 5).map(i => s"d$i").mkString(" ")),   // short doc: 1 span
      (4L, boiler + "\n\n" + boiler),                   // boiler twice
      (5L, (1 to 15).map(i => s"e$i").mkString(" ")),   // 15 words: 2 spans
      (6L, "f1 f2 f3\n\nf4 f5 f6"),                    // 2 paras → 2 spans
      (7L, "f1 f2 f3 f4 f5 f6"))                        // 1 para → 1 DIFFERENT span
    val got = Dedup.paragraphDedupOn(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 1L)), s"docA: ${got(1L)}") // boiler in docs 1,2,4
    assert(got(2L) == ((2L, 1L)))
    assert(got(3L) == ((1L, 0L)))
    assert(got(4L) == ((2L, 2L)))                       // both spans are boiler
    assert(got(5L) == ((2L, 0L)))                       // 10+5 word chunks, unique
    assert(got(6L) == ((2L, 0L)))                       // para split ≠ flat split
    assert(got(7L) == ((1L, 0L)))
  }

  test("t11 sequence packing: per-lang streams are contiguous, no gaps") {
    // reconstruct each doc's stream position: cum = example_id*ctx + offset;
    // within a language, sorted by cum, each doc must start exactly where
    // the previous one ended (concatenate-and-chunk leaves no holes)
    val ctx = 512L
    val rows = TextOps.sequencePack(spark, dir, ctx).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3) * ctx + r.getLong(4)))
    rows.groupBy(_._1).foreach { case (lang, ds) =>
      val sorted = ds.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"$lang stream does not start at 0")
      sorted.sliding(2).foreach {
        case Array((_, n, cum), (_, _, cum2)) =>
          assert(cum + n == cum2, s"$lang stream has a gap at $cum")
        case _ =>
      }
    }
    assert(rows.nonEmpty)
  }

  test("c1 corpus prep composes the standalone tiers exactly") {
    val c1 = CorpusPrep.cleanCorpus(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    // membership: kept == (t6 keep) ∩ (d1 canonical keeper)
    val keep = TextOps.repetitionFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    val keepers = Dedup.exactDedup(spark, dir).collect()
      .map(_.getAs[Long]("keep_id")).toSet
    val expectedIds = keep.collect { case (id, true) if keepers(id) => id }.toSet
    assert(c1.keySet == expectedIds,
      s"membership diverges: extra=${c1.keySet -- expectedIds} missing=${expectedIds -- c1.keySet}")
    // per-doc values: split == t5, tokens == t10
    val t5 = TextOps.splitAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val t10 = TextOps.bpeTokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    c1.foreach { case (id, (split, nBpe)) =>
      assert(split == t5(id), s"doc $id split diverges from t5")
      assert(nBpe == t10(id), s"doc $id token count diverges from t10")
    }
    assert(c1.nonEmpty)
  }

  test("t10 BPE tokenizer: known merges, bounds, Spark = Scala reference") {
    // hand-checked words through the rank-ordered merge table
    assert(TextOps.bpeTokenCountScala("the") == 1)      // t h → th; th e → the
    assert(TextOps.bpeTokenCountScala("theory") == 3)   // the | or | y
    assert(TextOps.bpeTokenCountScala("and") == 1)      // a n → an; an d → and
    assert(TextOps.bpeTokenCountScala("for") == 1)      // o r → or; f or → for
    assert(TextOps.bpeTokenCountScala("nation") == 2)   // n | ation (o-n, a-t, i-on, at-ion)
    assert(TextOps.bpeTokenCountScala("xyz") == 3)      // no merges apply
    assert(TextOps.bpeTokenCountScala("q") == 1)        // single char
    // the native span-walk expression must equal the separator-string
    // reference EXACTLY — including the boundary-blocking quirk on
    // same-pair runs ("llll": the pair right after a merge can't
    // match in the same pass) and multi-char merged symbols
    // ("" excluded: both paths only ever see \s+-split nonempty words,
    // and the reference's length formula is meaningless on "")
    val adversarial = Seq("llll", "llllll", "ststst", "thththth", "thethethe",
      "ananan", "forfor", "ationation", "qu", "a", "the")
    adversarial.foreach { w =>
      assert(graft.functions.Bpe.wordTokens(w) == TextOps.bpeTokenCountScala(w),
        s"span walk diverges from replace semantics on '$w'")
    }
    docs.flatMap(_._2.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty).distinct.foreach { w =>
      assert(graft.functions.Bpe.wordTokens(w) == TextOps.bpeTokenCountScala(w),
        s"span walk diverges on corpus word '$w'")
    }
    val expected = docs.map { case (id, text, _) =>
      val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> (ws.length.toLong, ws.map(TextOps.bpeTokenCountScala(_).toLong).sum)
    }.toMap
    val got = TextOps.bpeTokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // bounds: 1 ≤ tokens(w) ≤ len(w) for every nonempty word ⇒ per doc
    // n_words ≤ n_bpe_tokens ≤ total chars
    got.foreach { case (id, (nw, nb)) =>
      assert(nb >= nw, s"doc $id: fewer BPE tokens than words") }
  }

  private def winnowOf(words: Seq[String]): Set[Long] =
    if (words.length < Dedup.WinnowK) Set.empty
    else {
      val hs = words.sliding(Dedup.WinnowK).map(g => pHash(g.mkString(" "))).toVector
      val wins = math.max(hs.length - (Dedup.WinnowW - 1), 1)
      (0 until wins).map(j => hs.slice(j, j + Dedup.WinnowW).min).toSet
    }

  test("d12 winnowing pairs match a driver-side brute force") {
    val fps = docs.map { case (id, text, _) =>
      id -> winnowOf(text.trim.split("\\s+").toSeq)
    }.filter(_._2.nonEmpty)
    val postings = fps.flatMap { case (id, s) => s.map(fp => fp -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      .filter { case (_, ds) => ds.length > 1 && ds.length <= Dedup.MaxShingleDf }
    val expected = postings.toSeq
      .flatMap { case (_, ds) => for (i <- ds.indices; j <- (i + 1) until ds.length) yield (ds(i), ds(j)) }
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L)
      .map { case ((a, b), n) => (a, b, n) }.toSet
    val got = Dedup.winnowDups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("d12 winnowing guarantee: a shared W+K-1 word run shares a fingerprint") {
    // Schleimer et al.'s correctness property, exercised on crafted
    // streams the corpus can't guarantee: two word sequences sharing
    // a contiguous run of >= W + K - 1 words must select at least
    // one common fingerprint, wherever the run sits in either doc.
    val runLen = Dedup.WinnowW + Dedup.WinnowK - 1
    val rng = new scala.util.Random(7)
    def word(i: Int) = s"w${i}x${rng.nextInt(1000)}"
    for (trial <- 0 until 25) {
      val run = Seq.tabulate(runLen)(i => s"shared${trial}n$i")
      val a = Seq.fill(rng.nextInt(20))(word(trial)) ++ run ++ Seq.fill(rng.nextInt(20))(word(trial + 1))
      val b = Seq.fill(rng.nextInt(20))(word(trial + 2)) ++ run ++ Seq.fill(rng.nextInt(20))(word(trial + 3))
      assert(winnowOf(a).intersect(winnowOf(b)).nonEmpty,
        s"trial $trial: shared $runLen-word run produced no shared fingerprint")
    }
  }

  test("t13 shuffle-shard: permutation is total, balanced, growth-stable") {
    val rows = TextOps.shuffleShard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // total: every doc addressed exactly once
    assert(rows.map(_._1).distinct.length == docs.length && rows.length == docs.length)
    // within each shard, pos is exactly 0..n-1 (a dense training index)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard $shard positions not dense")
    }
    // shard assignment is a pure (salt, doc_id) function: recomputing
    // it over a corpus PREFIX changes nobody's shard (growth
    // stability — new docs never re-shard old ones). pos may shift.
    val half = docs.map(_._1).sorted.take(docs.length / 2).toSet
    val fullShard = rows.map(r => r._1 -> r._2).toMap
    val prefixShard = TextOps.shuffleShard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => half.contains(p._1)).toMap
    assert(prefixShard.forall { case (id, s) => fullShard(id) == s })
  }

  test("t14 mixture: rates follow the weight spec, membership is pure") {
    val kept = TextOps.mixtureSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = kept.groupBy(_._2).view.mapValues(_.size).toMap
    // only weighted sources appear
    val weighted = TextOps.MixtureWeights.map(_._1).toSet
    assert(bySource.keySet.subsetOf(weighted))
    // driver-side replay of the rate arithmetic: counts, integer-ppm
    // rates, hash filter — must reproduce the kept set exactly
    val srcOf = graft.Tables.t(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val counts = srcOf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val budget = 60L
    val rate = TextOps.MixtureWeights.map { case (s, w) =>
      s -> math.min(1000000L, 1000000L * budget * w / (100L * counts(s)))
    }.toMap
    val expected = srcOf.filter { case (id, s) =>
      rate.get(s).exists(r => pHash(s"graft_m1:$id") % 1000000L < r)
    }.toSet
    assert(kept.toSet == expected && kept.nonEmpty)
  }

  test("t9 corpus-frequency score matches a driver-side brute force") {
    val allToks = docs.flatMap(_._2.trim.split("\\s+"))
    val freq = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = docs.map { case (id, text, _) =>
      val toks = text.trim.split("\\s+").toSeq
      val tfs = toks.map(freq)
      id -> (toks.size.toLong, tfs.sum, tfs.min)
    }.toMap
    val got = TextOps.corpusFreqScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    TextOps.corpusFreqScore(spark, dir).collect().foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getLong(2).toDouble / r.getLong(1)) < 1e-12)
    }
  }
}
