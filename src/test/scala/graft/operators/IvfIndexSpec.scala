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
}
