package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The adaptive-granularity contract behind d5/d10's linear scaling
  * (round-12 sf1 finding: fixed 8-bit LSH buckets made d5 37.8× and
  * d10 23.5× for 10× data):
  *
  *  - the pure-integer bit ladders ([[Similarity.adaptiveBits]] /
  *    [[Similarity.refineBits]]) are pinned at the scales that
  *    matter — driver test SFs resolve to the LEGACY granularity
  *    (8 bits / 0 refine), so small-SF results are bit-identical to
  *    the fixed-bit history, while sf1-and-up actually adapts;
  *  - the native [[graft.functions.ArrayDot]] that replaced the
  *    interpreted zip_with fold in the pair loops is bit-identical
  *    to that fold (same left-to-right order), interpreted AND
  *    codegen'd.
  */
class AdaptiveBucketSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  test("adaptiveBits ladder: legacy 8 bits at test scales, grows with n") {
    import Similarity.{adaptiveBits, NumPlanes, MaxPlanes, TargetBucket}
    assert(adaptiveBits(0) == NumPlanes)
    assert(adaptiveBits(200) == NumPlanes)    // sf0.001 / sf0.01
    assert(adaptiveBits(2000) == NumPlanes)   // sf0.1
    assert(adaptiveBits(TargetBucket << 8) == 8)
    assert(adaptiveBits((TargetBucket << 8) + 1) == 9)
    assert(adaptiveBits(20000) == 12)         // sf1
    assert(adaptiveBits(Long.MaxValue) == MaxPlanes)
    // occupancy invariant: n / 2^bits <= TargetBucket
    for (n <- Seq(1L, 100L, 2048L, 5000L, 20000L, 1000000L, 100000000L)) {
      val b = adaptiveBits(n)
      assert(b == MaxPlanes || n <= (TargetBucket << b), s"n=$n bits=$b")
    }
  }

  test("refineBits ladder: 0 at test scales, grows with n") {
    import Similarity.{refineBits, NCentroids, RefineTarget}
    assert(refineBits(200) == 0)
    assert(refineBits(2000) == 0)             // sf0.1: unchanged results
    assert(refineBits(RefineTarget * NCentroids) == 0)
    assert(refineBits(RefineTarget * NCentroids + 1) == 1)
    assert(refineBits(20000) == 4)            // sf1
  }

  test("ArrayDot is bit-identical to the interpreted zip_with fold") {
    // Deterministic pseudo-random doubles incl. negatives/denormal-ish
    val df = spark.range(0, 64)
      .selectExpr("cast(id as int) i",
        "transform(sequence(0, 63), d -> cast(hash(id, d) as double) / 1e9) as a",
        "transform(sequence(0, 63), d -> cast(hash(d, id) as double) / 1e7) as b")
    val interp = expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)")
    val native = graft.functions.ArrayDot.dot(col("a"), col("b"))
    val rows = df.select(interp.as("x"), native.as("y")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    // interpreted path too (no codegen): force via eval on the expression
    val e = graft.functions.ArrayDot(
      org.apache.spark.sql.graft.Shims.expression(col("a")),
      org.apache.spark.sql.graft.Shims.expression(col("b")))
    assert(e.dataType == org.apache.spark.sql.types.DoubleType)
  }

  test("ArrayDot nulls propagate; empty arrays dot to 0") {
    val r = spark.sql("SELECT 1")
      .select(
        graft.functions.ArrayDot.dot(
          expr("cast(null as array<double>)"), expr("array(1.0d)")).as("n"),
        graft.functions.ArrayDot.dot(
          expr("cast(array() as array<double>)"),
          expr("cast(array() as array<double>)")).as("z"))
      .collect()(0)
    assert(r.isNullAt(0) && r.getDouble(1) == 0.0)
  }

  test("d5 at test scale equals the legacy fixed-8-bit zip_with form") {
    val emb = graft.Tables.t(spark, SparkFixture.Sf0001, "embeddings")
    val legacy = {
      val e = emb
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", expr(
          "sqrt(aggregate(transform(v, x -> x * x), cast(0.0 as double), (acc, x) -> acc + x))"))
        .withColumn("bucket", Similarity.bucketExprBits(Similarity.NumPlanes))
      val dot = expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)")
      e.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          (dot / (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
        .filter(col("cos_sim") >= 0.4)
    }
    val got = Dedup.embeddingDupOn(emb, 0.4).collect().map(_.toSeq).toSet
    assert(got == legacy.collect().map(_.toSeq).toSet && got.nonEmpty)
  }

  /** Synthetic embeddings frame: a 10-member near-identical cluster
    * (scalar multiples of one base vector — identical hyperplane sign
    * pattern by construction, so ONE bucket that finer hashing can
    * never split) plus hash-derived fillers in other buckets. */
  private def adversarialEmb = {
    import spark.implicits._
    val base = (0 until 64).map(d => (((d * 37 + 11) % 23) - 11).toFloat / 7f)
    val cluster = (0 until 10).map(c => (c.toLong, base.map(_ * (c + 1))))
    val fillers = (0 until 4).map { i =>
      (100L + i, (0 until 64).map(d =>
        (((d * 13 + i * 7 + 5) % 19) - 9).toFloat / (3f + i % 2)))
    }
    // fillers 100/102 share sign patterns pairwise with nothing else;
    // what matters below is only that their buckets stay under-cap.
    (cluster ++ fillers).toDF("vec_id", "embedding")
  }

  test("d5 census cap: over-cap buckets emit representative-star pairs only") {
    val emb = adversarialEmb
    val rows = Dedup.embeddingDupOn(emb, 0.9, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val clusterPairs = rows.filter { case (a, b, _) => b <= 9 || a <= 9 }
    // Star shape: every cluster pair anchors at the min-id rep (0) —
    // 9 pairs, never a non-rep (i, j) pair, linear in cluster size.
    assert(clusterPairs.length == 9)
    assert(clusterPairs.forall { case (a, b, cos) =>
      a == 0L && b >= 1L && b <= 9L && cos > 0.999
    })
    // The same corpus UNCAPPED enumerates all 45 cluster pairs — the
    // quadratic volume the cap is bounding.
    val uncapped = Dedup.embeddingDupOn(emb, 0.9, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => b <= 9 || a <= 9 }
    assert(uncapped.length == 45)
  }

  test("d10 census cap: over-cap cells emit representative-star pairs only") {
    // Uncapped at threshold -2 reveals every cell's full membership
    // (all in-cell pairs survive a cos floor below -1), so the capped
    // expectation is derivable without re-touching the index: for
    // cells over the cap keep only pairs anchored at the cell's min
    // id, then apply the real threshold.
    val all = Similarity
      .semanticDedup(spark, SparkFixture.Sf0001, -2.0, maxCluster = Int.MaxValue)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byCell = all.groupBy(_._1).map { case (cid, ps) =>
      cid -> ps.flatMap(p => Seq(p._2, p._3)).distinct.sorted
    }
    val cap = 3
    val expected = all.filter { case (cid, a, b, cos) =>
      val members = byCell(cid)
      (if (members.length <= cap) true else a == members.min) && cos >= 0.4
    }.map(p => (p._1, p._2, p._3, p._4)).toSet
    assert(byCell.values.exists(_.length > cap),
      "fixture must contain at least one over-cap cell")
    val got = Similarity
      .semanticDedup(spark, SparkFixture.Sf0001, 0.4, maxCluster = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected && got.nonEmpty)
  }

  test("PqEncode equals the hybrid transform/array_min/struct encoder") {
    import Similarity.{PqK, PqM, PqSub}
    val e = Similarity.vectors(spark, SparkFixture.Sf0001)
    val cb = Similarity.pqCodebooks(e)
    val cbLit = array(cb.map(cbM =>
      array(cbM.map(c => array(c.map(lit): _*)): _*)): _*)
    val legacy = transform(sequence(lit(0), lit(PqM - 1)), m =>
      array_min(transform(sequence(lit(0), lit(PqK - 1)), j =>
        struct(
          graft.functions.ArrayDot.l2(
            slice(col("v"), m * PqSub + 1, lit(PqSub)),
            element_at(element_at(cbLit, m + 1), j + 1)).as("d"),
          j.as("j")))).getField("j"))
    val rows = e.select(col("vec_id"), legacy.as("a"),
        graft.functions.ArrayDot.pqEncode(col("v"),
          cb.map(_.map(_.toArray).toArray).toArray).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"vec ${r.getLong(0)}")
    }
  }

  test("d5 census cap: default cap is inert at battery scales") {
    val emb = graft.Tables.t(spark, SparkFixture.Sf0001, "embeddings")
    val capped = Dedup.embeddingDupOn(emb, 0.4).collect().map(_.toSeq).toSet
    val unbounded =
      Dedup.embeddingDupOn(emb, 0.4, maxBucket = Int.MaxValue)
        .collect().map(_.toSeq).toSet
    assert(capped == unbounded && capped.nonEmpty)
  }
}
