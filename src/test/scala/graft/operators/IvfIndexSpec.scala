package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The materialized IVF index: built ONCE per corpus dir (trained
  * centroids + cid-partitioned posting lists on disk), after which
  * every query only probes — no re-training, no full-corpus
  * re-assignment (the round-6 weak point: each ivfTopK call recomputed
  * the whole vec→centroid assignment). */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  test("repeat queries probe the index without rebuilding it") {
    val r1 = Similarity.ivfTopK(spark, dir, qid = 1L).collect().toSeq
    val builds = Similarity.indexBuilds.get()
    val r2 = Similarity.ivfTopK(spark, dir, qid = 1L).collect().toSeq
    assert(Similarity.indexBuilds.get() == builds,
      "second identical query rebuilt the IVF index")
    assert(r1 == r2, "index probe is not deterministic")
    // a different query against the same corpus also reuses the index
    val r3 = Similarity.ivfTopK(spark, dir, qid = 7L).collect().toSeq
    assert(Similarity.indexBuilds.get() == builds,
      "new query id rebuilt the IVF index")
    assert(r3.nonEmpty)
  }

  test("s11 IVF-PQ: ADC scores agree with s8 on the probed subset") {
    val builds = Similarity.indexBuilds.get()
    val s11 = Similarity.ivfPqTopK(spark, dir, qid = 0L, k = 10).collect()
    assert(s11.length == 10)
    // composing the tiers must not rebuild the index (cache shared
    // with s4/s7) ...
    assert(Similarity.indexBuilds.get() == builds || builds == 0)
    // ... results come sorted by approximate distance ...
    val adists = s11.map(_.getDouble(2)).toSeq
    assert(adists == adists.sorted, "s11 not sorted by adist")
    // ... and each candidate's ADC distance is EXACTLY s8's for the
    // same vec_id (global codebooks: cell pruning must not change
    // the quantized score, only the candidate set).
    val s8 = Similarity.pqTopK(spark, dir, qid = 0L, k = 100000)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    s11.foreach { r =>
      val id = r.getLong(0)
      assert(s8.contains(id), s"s11 candidate $id missing from s8 scan")
      assert(s8(id) == r.getDouble(2), s"ADC mismatch for $id")
    }
  }
}
