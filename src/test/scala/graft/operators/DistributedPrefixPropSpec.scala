package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Generator sweep certifying the DistributedPrefix primitives against
  * Spark's own single-window forms on ARBITRARY inputs — random group
  * counts and sizes (incl. empty and singleton groups), adversarial
  * value distributions (negatives, zero, denormals, ±Infinity, NaN,
  * heavy tie piles), and hash keys that pile onto few slices. The
  * edge-case suite (DistributedPrefixSpec) pins named scenarios; this
  * is what certifies the slice-monotonicity argument ([[
  * DistributedPrefix.logSlice]] is only WEAKLY monotone, so parity
  * must hold however ties straddle slice boundaries). Cases are
  * Spark-job-sized, so the count is kept deliberately small — each
  * case runs four distributed plans. */
object DistributedPrefixPropSpec extends Properties("distributedPrefix") {

  private lazy val spark = SparkFixture.session

  // Each case executes several Spark jobs (~0.5 s): 12 well-seeded
  // random frames per property beat 100 trivial ones on wall budget.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxDiscardRatio(10)

  /** Force the sliced branch — these frames are tiny, and parity of
    * the FAST path with the single window is trivially true. */
  private def withSliced[A](body: => A): A = {
    spark.conf.set(DistributedPrefix.SmallInputBytesKey, "0")
    try body
    finally spark.conf.unset(DistributedPrefix.SmallInputBytesKey)
  }

  private val genDouble: Gen[Double] = Gen.frequency(
    5 -> Gen.chooseNum(-1e6, 1e6),
    3 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0, 2.0, 1e-300, -1e-300,
      java.lang.Double.MIN_VALUE, java.lang.Double.MIN_NORMAL,
      Double.MaxValue, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.NaN),
    2 -> Gen.oneOf(3.25, 7.5, 100.0) // deliberate cross-row ties
  )

  private val genHash: Gen[Long] = Gen.frequency(
    5 -> Gen.chooseNum(0L, (1L << 60) - 1),
    3 -> Gen.oneOf(0L, 1L, (1L << 60) - 1, 5L << 57, 5L << 57 | 3L),
    2 -> Gen.const(42L << 52) // tie pile on one slice boundary
  )

  private val genGroups: Gen[List[Int]] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 120)))

  /** (id, group, double-value, hash, long-weight) rows: group sizes
    * from genGroups, payloads per row. */
  private val genFrame: Gen[List[(Long, String, Double, Long, Long)]] =
    genGroups.flatMap { sizes =>
      val tagged = sizes.zipWithIndex.flatMap { case (sz, g) =>
        List.fill(sz)(s"g$g")
      }
      Gen.sequence[List[(Double, Long, Long)], (Double, Long, Long)](
        tagged.map(_ => Gen.zip(genDouble, genHash,
          Gen.chooseNum(-50L, 50L)))).map { payloads =>
        tagged.zip(payloads).zipWithIndex.map { case ((g, (d, h, v)), i) =>
          (i.toLong, g, d, h, v)
        }
      }
    }

  property("rankedSlicesMatchesSingleWindow") =
    Prop.forAllNoShrink(genFrame.suchThat(_.nonEmpty)) { rows =>
      import spark.implicits._
      val vals = rows.toDF("id", "grp", "dv", "h", "v")
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("dv").asc, col("id").asc)
      val want = vals
        .withColumn("rk", row_number().over(w).cast("long"))
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val got = withSliced {
        DistributedPrefix.rankedSlices(vals, "grp",
          Seq(col("dv").asc, col("id").asc),
          DistributedPrefix.logSlice(col("dv")),
          "s", "loc", "cnt", "rk", "n")
          .select("id", "rk").as[(Long, Long)].collect().toMap
      }
      Prop(got == want) :| s"ranks diverge: ${
        want.keys.filter(k => got(k) != want(k)).take(5).map(k =>
          s"$k got ${got(k)} want ${want(k)}").mkString(", ")}"
    }

  property("sumBeforeHashOrderedMatchesSingleWindow") =
    Prop.forAllNoShrink(genFrame.suchThat(_.nonEmpty)) { rows =>
      import spark.implicits._
      val hdf = rows.toDF("id", "grp", "dv", "h", "v")
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("h").asc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = hdf
        .withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val got = withSliced {
        DistributedPrefix
          .sumBeforeHashOrdered(hdf, "grp", "h", "id", "v", "cum")
          .select("id", "cum").as[(Long, Long)].collect().toMap
      }
      Prop(got == want) :| s"cums diverge: ${
        want.keys.filter(k => got(k) != want(k)).take(5).map(k =>
          s"$k got ${got(k)} want ${want(k)}").mkString(", ")}"
    }

  property("rowNumberHashOrderedMatchesSingleWindow") =
    Prop.forAllNoShrink(genFrame.suchThat(_.nonEmpty)) { rows =>
      import spark.implicits._
      val hdf = rows.toDF("id", "grp", "dv", "h", "v")
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("h").asc, col("id").asc)
      val want = hdf
        .withColumn("rk", row_number().over(w).cast("long"))
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val got = withSliced {
        DistributedPrefix.rowNumberHashOrdered(hdf, "grp", "h", "id", "rk")
          .select("id", "rk").as[(Long, Long)].collect().toMap
      }
      Prop(got == want)
    }

  property("rankedSlicesRecomputeBranchMatchesSingleWindow") =
    Prop.forAllNoShrink(genFrame.suchThat(_.nonEmpty)) { rows =>
      import spark.implicits._
      // recomputeInput = true (q30/q35/t12/t13's branch): no shared
      // checkpoint — the offsets aggregate and the slice window each
      // re-derive the input. Parity must hold exactly as in the
      // checkpointed branch (deterministic input by construction).
      val vals = rows.toDF("id", "grp", "dv", "h", "v")
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("dv").asc, col("id").asc)
      val want = vals
        .withColumn("rk", row_number().over(w).cast("long"))
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val got = withSliced {
        DistributedPrefix.rankedSlices(vals, "grp",
          Seq(col("dv").asc, col("id").asc),
          DistributedPrefix.logSlice(col("dv")),
          "s", "loc", "cnt", "rk", "n", recomputeInput = true)
          .select("id", "rk").as[(Long, Long)].collect().toMap
      }
      Prop(got == want) :| s"recompute-branch ranks diverge: ${
        want.keys.filter(k => got(k) != want(k)).take(5).map(k =>
          s"$k got ${got(k)} want ${want(k)}").mkString(", ")}"
    }

  /** Finite values + NULLs (None) — the percentile comparison is
    * against Spark's own exact `percentile` aggregate, whose linear
    * interpolation over ±Inf produces NaN arithmetic that has no
    * defined parity target; NaN/Inf ORDERING is covered by the rank
    * properties above and the edge-case suite. */
  private val genPctFrame: Gen[List[(String, Option[Double])]] =
    genGroups.flatMap { sizes =>
      val tagged = sizes.zipWithIndex.flatMap { case (sz, g) =>
        List.fill(sz)(s"g$g")
      }
      Gen.sequence[List[Option[Double]], Option[Double]](tagged.map(_ =>
        Gen.frequency(
          6 -> Gen.chooseNum(-1e6, 1e6).map(Some(_)),
          2 -> Gen.oneOf(3.25, 7.5, 100.0, -0.0, 0.0, 1e-300).map(Some(_)),
          1 -> Gen.const(None)))).map(tagged.zip(_))
    }

  property("percentilesOnMatchesBuiltinExactPercentile") =
    Prop.forAllNoShrink(genPctFrame.suchThat(_.nonEmpty)) { rows =>
      import spark.implicits._
      val base = rows.toDF("g", "v")
      val want = base.groupBy(col("g")).agg(
        expr("percentile(v, array(0.5, 0.9, 0.99))").as("ps"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
        .collect().map { r =>
          val ps = if (r.isNullAt(1)) Seq[Any](null, null, null)
                   else r.getSeq[Any](1)
          (r.getString(0), (ps, r.get(2), r.get(3)))
        }.toMap
      val got = withSliced { CoreQueries.percentilesOn(base).collect() }
        .map(r => (r.getString(0),
          (Seq(r.get(1), r.get(2), r.get(3)), r.get(4), r.get(5)))).toMap
      def close(a: Any, b: Any): Boolean = (a, b) match {
        case (null, null) => true
        case (x: Double, y: Double) =>
          x == y || math.abs(x - y) <= 1e-9 * math.max(math.abs(x), math.abs(y))
        case _ => a == b
      }
      val ok = want.keySet == got.keySet && want.forall { case (g, (ps, lo, hi)) =>
        val (gps, glo, ghi) = got(g)
        ps.zip(gps).forall((close _).tupled) && close(lo, glo) && close(hi, ghi)
      }
      Prop(ok) :| s"percentiles diverge:\n want=$want\n got=$got"
    }

  property("logSliceWeaklyMonotoneOnArbitraryDoubles") =
    Prop.forAllNoShrink(Gen.listOfN(40, genDouble)) { ds =>
      import spark.implicits._
      // NaN slices to Long.MaxValue by construction; for the rest,
      // sort by value and require the slice sequence non-decreasing
      val rows = ds.filterNot(_.isNaN).sorted.zipWithIndex
        .map { case (d, i) => (i.toLong, d) }
      if (rows.isEmpty) Prop.passed
      else {
        val slices = rows.toDF("i", "dv")
          .select(col("i"), DistributedPrefix.logSlice(col("dv")).as("s"))
          .collect().sortBy(_.getLong(0)).map(_.getLong(1))
        Prop(slices.zip(slices.tail).forall { case (a, b) => a <= b }) :|
          s"slice ids not monotone over sorted values: ${slices.mkString(",")}"
      }
    }
}
