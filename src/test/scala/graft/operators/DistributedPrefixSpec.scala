package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DistributedPrefix must produce EXACTLY the single-window results —
  * the converted operators' DuckDB oracles (t8/t8b/t11/t12) stayed
  * unchanged on that guarantee. Integer arithmetic means no
  * float-order caveats: equality is row-set equality. The generated
  * frame is larger than the shuffle-partition count and skewed (one
  * dominant group) so every group genuinely straddles partitions. */
class DistributedPrefixSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private lazy val spark = SparkFixture.session
  import spark.implicits._

  // These frames are tiny, so the size gate would route every call
  // onto the single-window fast path and the sliced-vs-single parity
  // below would compare the reference with itself. Force the sliced
  // branch for the suite; the fast path has its own test at the end.
  override def beforeAll(): Unit =
    spark.conf.set(DistributedPrefix.SmallInputBytesKey, "0")
  override def afterAll(): Unit =
    spark.conf.unset(DistributedPrefix.SmallInputBytesKey)

  private lazy val df = {
    // deterministic, skewed: group "a" holds half the rows
    val rows = (1 to 5000).map { i =>
      val g = if (i % 2 == 0) "a" else "bcdefghij" (i % 9).toString
      // value varies, order key is a scrambled hash-like long
      (i.toLong, g, (i * 2654435761L) % 997L, (i % 37).toLong)
    }
    rows.toDF("id", "grp", "ord", "v")
  }

  test("logSlice is weakly monotone and rankedSlices matches the single window") {
    // doubles spanning many octaves, with ties and tiny values
    val vals = df.select(col("id"), col("grp"),
      (col("ord").cast("double") * col("ord").cast("double") + 0.5).as("dv"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("dv").asc, col("id").asc)
    val want = vals.withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val got = DistributedPrefix.rankedSlices(vals, "grp",
      Seq(col("dv").asc, col("id").asc),
      DistributedPrefix.logSlice(col("dv")),
      "s", "loc", "cnt", "rk", "n")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
    val slices = vals.select(DistributedPrefix.logSlice(col("dv")))
      .distinct().count()
    assert(slices > 50, s"log slices degenerate: $slices")
  }

  test("input columns and row count are preserved") {
    val out = DistributedPrefix
      .sumBeforeHashOrdered(hdf, "grp", "h", "id", "v", "cum")
    assert(out.columns.toSeq == Seq("id", "grp", "h", "v", "cum"))
    assert(out.count() == hdf.count())
  }

  // 60-bit-uniform "hash" column for the hash-ordered variants: top
  // HashSliceBits bits must actually vary or slicing degenerates
  private lazy val hdf = {
    val rows = (1 to 5000).map { i =>
      val g = if (i % 2 == 0) "a" else "bcdefghij" (i % 9).toString
      val h = (i.toLong * 0x9E3779B97F4A7C15L) & ((1L << 60) - 1)
      (i.toLong, g, h, (i % 37).toLong)
    }
    rows.toDF("id", "grp", "h", "v")
  }

  test("sumBeforeHashOrdered equals the single-window running frame") {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("h").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = hdf
      .withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val got = DistributedPrefix
      .sumBeforeHashOrdered(hdf, "grp", "h", "id", "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
    // and the slices genuinely split the data
    val slices = hdf.select(
      expr(s"h div ${1L << (60 - DistributedPrefix.HashSliceBits)}"))
      .distinct().count()
    assert(slices > 100, s"hash slices degenerate: $slices")
  }

  test("recomputeInput=true downgrades a nondeterministic input to the checkpoint path, correctly") {
    // The recompute branch re-derives the input in BOTH internal
    // branches; a nondeterministic projection would diverge the slice
    // counts from the slice contents and silently corrupt every rank.
    // The guard downgrades such inputs to the always-correct
    // checkpoint path (rows materialize once) instead of throwing —
    // callers like percentilesOn hardcode the flag, so an error would
    // be unrecoverable for them.
    val nondet = hdf.withColumn("v", (rand() * 10).cast("long"))
    val out = DistributedPrefix
      .sumBeforeHashOrdered(nondet, "grp", "h", "id", "v", "cum",
        recomputeInput = true)
    // (a) the plan took the checkpoint path: the input is fronted by
    // a materialized-RDD scan, not recomputed from source
    assert(out.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"),
      "nondeterministic input did not downgrade to the checkpoint path")
    // (b) the result is internally consistent: cum equals the prefix
    // sum computed from the RETURNED rows themselves (the materialized
    // v values are the single source of truth after the checkpoint)
    val rows = out.select(col("grp"), col("h"), col("id"), col("v"), col("cum"))
      .as[(String, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, grp) =>
      var acc = 0L
      grp.sortBy(r => (r._2, r._3)).foreach { case (_, _, id, v, cum) =>
        assert(cum == acc, s"row $id: cum $cum != running sum $acc")
        acc += v
      }
    }
    // (c) deterministic inputs keep the recompute branch's exact
    // single-window parity
    val ok = DistributedPrefix
      .sumBeforeHashOrdered(hdf, "grp", "h", "id", "v", "cum",
        recomputeInput = true)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("h").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = hdf
      .withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(ok == want)
  }

  test("recomputeInput=true downgrades plan-level SET nondeterminism (LIMIT/Sample) too") {
    // Round-14 ADVICE: a LIMIT above a shuffle has all-deterministic
    // EXPRESSIONS yet may keep a different row SET on each
    // recomputation (which rows arrive first is a race), and a
    // seedless Sample re-rolls entirely — exactly the divergence the
    // guard exists to prevent. Both must take the checkpoint path.
    for ((label, in) <- Seq(
        "limit" -> hdf.limit(1000),
        "sample" -> hdf.sample(0.5))) {
      val out = DistributedPrefix
        .sumBeforeHashOrdered(in, "grp", "h", "id", "v", "cum",
          recomputeInput = true)
      assert(out.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"),
        s"$label input did not downgrade to the checkpoint path")
      // internal consistency: cum equals the prefix sum over the
      // RETURNED rows (the materialized set is the source of truth)
      val rows = out.select(col("grp"), col("h"), col("id"), col("v"), col("cum"))
        .as[(String, Long, Long, Long, Long)].collect()
      rows.groupBy(_._1).foreach { case (_, grp) =>
        var acc = 0L
        grp.sortBy(r => (r._2, r._3)).foreach { case (_, _, id, v, cum) =>
          assert(cum == acc, s"$label row $id: cum $cum != running sum $acc")
          acc += v
        }
      }
    }
  }

  test("rowNumberHashOrdered equals the single-window rank") {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("h").asc, col("id").asc)
    val want = hdf
      .withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val got = DistributedPrefix
      .rowNumberHashOrdered(hdf, "grp", "h", "id", "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("q35's derived window functions equal Spark's built-ins at slice scale") {
    // q35's battery input is small; re-run its derivation logic
    // against the built-in window functions on a frame that straddles
    // many range slices per group (the boundary lag/lead path and the
    // ntile bucket formula are what this pins)
    val orders = df.select(
      col("id").as("o_orderkey"),
      col("grp").as("o_orderstatus"),
      (col("ord") * 7 % 1000).cast("double").as("o_totalprice"),
      lit(1L).as("o_custkey"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val want = orders
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cum_dist", cume_dist().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(w))
      .select("o_orderkey", "quartile", "pct_rank", "cum_dist",
        "prev_price", "next_price", "third_price")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val got = CoreQueries.windowSuiteOn(
      orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")))
      .select("o_orderkey", "quartile", "pct_rank", "cum_dist",
        "prev_price", "next_price", "third_price")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got.size == want.size)
    val bad = want.keys.filter(k => got(k) != want(k)).take(3)
    assert(bad.isEmpty, s"derived != built-in for ids $bad: " +
      bad.map(k => s"$k: got ${got(k)} want ${want(k)}").mkString("; "))
  }

  test("hash-ordered variants survive adversarial ties: many rows per hash") {
    // only 7 distinct h values — every slice boundary is a tie pile,
    // ordering falls to the id tiebreak, and most slices are empty
    val tied = (1 to 2000).map { i =>
      val g = if (i % 3 == 0) "x" else "y"
      val h = ((i % 7).toLong << 57) + 12345L // huge tie groups, top bits vary
      (i.toLong, g, h, (i % 11).toLong)
    }.toDF("id", "grp", "h", "v")
    val w = Window.partitionBy(col("grp")).orderBy(col("h").asc, col("id").asc)
    val wantRk = tied.withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val gotRk = DistributedPrefix.rowNumberHashOrdered(tied, "grp", "h", "id", "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(gotRk == wantRk)
    val wb = w.rowsBetween(Window.unboundedPreceding, -1)
    val wantCum = tied.withColumn("cum", coalesce(sum(col("v")).over(wb), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val gotCum = DistributedPrefix
      .sumBeforeHashOrdered(tied, "grp", "h", "id", "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotCum == wantCum)
  }

  test("percentilesOn: all-NULL group appears with NULL percentiles; ties exact") {
    val base = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 2.0), ("a", 100.0),
      ("b", 7.5), ("b", null), ("c", null), ("c", null),
      ("d", 42.0),
      // negatives and zero: logSlice collapses them into one slice
      // (balance degrades, order does NOT — still weakly monotone)
      ("e", -10.0), ("e", -2.0), ("e", 0.0), ("e", 4.0), ("e", 8.0)
    ).toDF("g", "v")
    val out = CoreQueries.percentilesOn(base).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c", "d", "e"))
    // e: mixed-sign ordering is (-10, -2, 0, 4, 8) — p50 = 0.0, and
    // p90 interpolates ranks 4..5: 4*0.4 + 8*0.6 = 6.4
    assert(out("e").getDouble(1) == 0.0)
    assert(math.abs(out("e").getDouble(2) - 6.4) < 1e-9)
    // c: all NULL — present, NULL stats and percentiles
    assert(out("c").isNullAt(1) && out("c").isNullAt(4))
    // d: single row — every percentile is the value itself
    assert(out("d").getDouble(1) == 42.0 && out("d").getDouble(3) == 42.0)
    // b: NULLs excluded — single ranked row
    assert(out("b").getDouble(1) == 7.5)
    // a: 5 values with a tie pile at 2.0 — p50 = rank-3 value = 2.0,
    // p90 interpolates between ranks 4 and 5: 2*(0.4)+100*(0.6)... as
    // quantile_cont: pos=0.9*4=3.6 -> 2.0*0.4 + 100.0*0.6 = 60.8
    assert(out("a").getDouble(1) == 2.0)
    assert(math.abs(out("a").getDouble(2) - 60.8) < 1e-9)
  }

  test("NaN order keys land in the top slice and rank last, like the built-in") {
    val vals = Seq[(Long, String, java.lang.Double)](
      (1L, "a", 2.0), (2L, "a", Double.NaN), (3L, "a", 3.0),
      (4L, "a", 1.0), (5L, "b", Double.NaN), (6L, "b", 0.5)
    ).toDF("id", "grp", "dv")
    val w = Window.partitionBy(col("grp")).orderBy(col("dv").asc, col("id").asc)
    val want = vals.withColumn("rk", row_number().over(w).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    val got = DistributedPrefix.rankedSlices(vals, "grp",
      Seq(col("dv").asc, col("id").asc), DistributedPrefix.logSlice(col("dv")),
      "s", "loc", "cnt", "rk", "n")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got(2L) == 4L, s"NaN must rank last in its group: $got")
  }

  test("a slice whose values are all NULL does not poison later offsets") {
    // slice = top 12 bits of h: rows 1..50 share one slice with v all
    // NULL; rows 51..100 sit in a HIGHER slice — their cum must be 0
    // (NULLs skipped), not NULL
    val rows = (1 to 100).map { i =>
      val slice = if (i <= 50) 1L else 2L
      val h = (slice << 48) + i
      val v: java.lang.Long = if (i <= 50) null else java.lang.Long.valueOf(1L)
      (i.toLong, "g", h, v)
    }.toDF("id", "grp", "h", "v")
    val w = Window.partitionBy(col("grp")).orderBy(col("h").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = rows.withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val got = DistributedPrefix
      .sumBeforeHashOrdered(rows, "grp", "h", "id", "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got(51L) == 0L, s"first post-NULL-slice row must carry cum 0: $got")
  }

  test("small-input fast path: same rows, no slice machinery in the plan") {
    spark.conf.set(DistributedPrefix.SmallInputBytesKey,
      (1L << 40).toString) // everything is "small"
    try {
      val fast = DistributedPrefix
        .sumBeforeHashOrdered(hdf, "grp", "h", "id", "v", "cum")
      val fastRows = fast.select("id", "cum").as[(Long, Long)].collect().toMap
      val fastRk = DistributedPrefix
        .rowNumberHashOrdered(hdf, "grp", "h", "id", "rk")
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val vals = df.select(col("id"), col("grp"),
        (col("ord").cast("double") + 0.5).as("dv"))
      val fastRanked = DistributedPrefix.rankedSlices(vals, "grp",
        Seq(col("dv").asc, col("id").asc),
        DistributedPrefix.logSlice(col("dv")),
        "s", "loc", "cnt", "rk", "n")
      val rankedRows = fastRanked
        .select("id", "rk", "loc", "cnt", "n", "s")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      spark.conf.set(DistributedPrefix.SmallInputBytesKey, "0")
      val want = DistributedPrefix
        .sumBeforeHashOrdered(hdf, "grp", "h", "id", "v", "cum")
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val wantRk = DistributedPrefix
        .rowNumberHashOrdered(hdf, "grp", "h", "id", "rk")
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(fastRows == want)
      assert(fastRk == wantRk)
      // degenerate one-slice bookkeeping: s = 0, local = rank,
      // cnt = total — the consumer identities rest on exactly this
      rankedRows.values.foreach { case Seq(rk, loc, cnt, n, s) =>
        assert(s == 0L && loc == rk && cnt == n,
          s"degenerate slice contract broken: rk=$rk loc=$loc cnt=$cnt n=$n s=$s")
      }
      val p = fast.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("__dp_s"), s"fast path still slices:\n$p")
      assert(!p.contains("Join"), s"fast path still pays the offsets join:\n$p")
    } finally spark.conf.set(DistributedPrefix.SmallInputBytesKey, "0")
  }

  test("the sliced frame materializes ONCE: both consumers read the checkpoint") {
    val out = DistributedPrefix
      .sumBeforeHashOrdered(hdf, "grp", "h", "id", "v", "cum")
    out.collect()
    val p = out.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val finalTree = p.split("== Initial Plan ==")(0)
    // no range partitioner (no sampling pass re-executing the child);
    // the input projection + (slice, grp) shuffle ran inside the lazy
    // localCheckpoint, so the visible plan reads the SAME materialized
    // RDD in both branches and re-shuffles neither (the checkpoint
    // preserves the hash partitioning — the only exchange left is the
    // tiny per-group offsets window)
    assert(!p.contains("rangepartitioning"),
      s"hash-ordered variant pays a range-sampling pass:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(finalTree).length >= 2,
      s"consumers do not share the checkpointed slice frame:\n$p")
    assert(!finalTree.contains("LocalTableScan"),
      s"a consumer recomputed the source instead of the checkpoint:\n$p")
    val dataExchanges = finalTree.linesIterator
      .count(l => l.contains("- Exchange") && l.contains("__dp_s"))
    assert(dataExchanges == 0,
      s"a consumer re-shuffled the checkpointed frame:\n$p")
  }
}
