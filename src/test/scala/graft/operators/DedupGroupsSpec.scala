package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** d6 dup-group resolution: the distributed min-label propagation
  * must produce EXACTLY the connected components of the d3 pair
  * graph. Proven against an independent driver-side union-find over
  * the same pairs (tiny at test scale), not against another Spark
  * formulation — so a propagation bug can't cancel itself out. */
class DedupGroupsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = "/root/testdata/sf0.01"

  test("labels equal union-find components; canonical is min member; sizes consistent") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pairs at sf0.01 — vacuous test")

    // driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(id => id -> find(id)).toMap

    val got = Dedup.dupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (id, canon, _) =>
      assert(canon == expected(id), s"doc $id: got canonical $canon, expected ${expected(id)}")
    }
    // group_size agrees with the component census, and each canonical
    // is a member of its own group
    val census = expected.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    got.foreach { case (_, canon, sz) => assert(sz == census(canon)) }
    assert(got.filter { case (id, canon, _) => id == canon }.map(_._2).toSet == census.keySet)
  }

  test("propagation crosses a chain topology, not just cliques") {
    // A-B, B-C, C-D: a diameter-3 path must collapse to one
    // component — driven through the REAL operator via its pair
    // override, so the production loop (convergence check included)
    // is what's under test
    import spark.implicits._
    val pairs = Seq((10L, 20L), (20L, 30L), (30L, 40L)).toDF("id_a", "id_b")
    val out = Dedup.dupGroups(spark, dir, pairsOverride = Some(pairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(x => x._1 -> x._2).toMap ==
      Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L))
    assert(out.forall(_._3 == 4L))
  }

  test("a 30-node chain converges via the star-contraction fallback") {
    // Diameter 30 > maxIters: label propagation hands off to
    // large-star/small-star instead of aborting (the round-6 behavior
    // was require(converged) — a 26-doc chain killed the query).
    // maxIters = 2 forces the fallback quickly; the result must still
    // be the exact components.
    import spark.implicits._
    val chain = (0 until 29).map(i => (100L + i, 101L + i)).toDF("id_a", "id_b")
    val out = Dedup.dupGroups(spark, dir, pairsOverride = Some(chain), maxIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 30)
    assert(out.forall(_._2 == 100L), s"canonical ids: ${out.map(_._2).distinct.mkString(",")}")
    assert(out.forall(_._3 == 30L))
    // two disjoint chains stay separate components
    val two = ((0 until 9).map(i => (100L + i, 101L + i)) ++
      (0 until 9).map(i => (300L + i, 301L + i))).toDF("id_a", "id_b")
    val out2 = Dedup.dupGroups(spark, dir, pairsOverride = Some(two), maxIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out2.count(_._2 == 100L) == 10 && out2.count(_._2 == 300L) == 10)
    assert(out2.forall(_._3 == 10L))
  }

  test("empty pair graph yields an empty result, not a crash") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dupGroups(spark, dir, pairsOverride = Some(none)).isEmpty)
  }
}
