package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** d7 incremental dedup: the battery entry exercises the near/unique
  * classes on the real corpus, but the testdata has NO cross-source
  * exact text dups — so the exact branch and the exact-beats-near
  * precedence are driven here through the override hooks. */
class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  test("exact, near, unique classes and exact>near precedence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "old", "alpha beta gamma"),
      (2L, "old", "delta epsilon zeta"),
      (3L, "new", "alpha beta gamma"),  // exact dup of 1 (and a near pair too)
      (4L, "new", "delta epsilon zeta eta"), // near dup of 2 (via pair)
      (5L, "new", "totally different words") // unique
    ).toDF("doc_id", "source", "text")
    val pairs = Seq(
      (1L, 3L, 0.9), // crosses the boundary; doc 3 is ALSO exact
      (2L, 4L, 0.5),
      (1L, 2L, 0.3)  // old-old pair must be ignored
    ).toDF("id_a", "id_b", "est_sim")
    val out = Dedup.incrementalDedup(spark, dir, newSource = "new",
        docsOverride = Some(docs), pairsOverride = Some(pairs))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getLong(2), Option(r.get(3)), r.getString(4))).toMap
    assert(out.keySet == Set(3L, 4L, 5L))
    // doc 3: exact match wins over its near pair; both are reported
    assert(out(3L) == (Some(1L), 1L, Some(1L), "exact"))
    assert(out(4L) == (None, 1L, Some(2L), "near"))
    assert(out(5L) == (None, 0L, None, "unique"))
  }

  test("battery shape on the real corpus: every new doc classified once") {
    val out = Dedup.incrementalDedup(spark, dir).collect()
    val n = graft.Tables.t(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("source") === "src19").count()
    assert(out.length == n, s"expected one row per new doc: ${out.length} vs $n")
    assert(out.map(_.getString(4)).forall(Set("exact", "near", "unique")))
  }
}
