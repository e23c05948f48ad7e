package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks of the value semantics the engine pins down
  * (SURVEY.md §1.2): MultiSQL integer division/AVG, truncating
  * float→int casts, portable-hash determinism, MONEY formatting.
  * These run the real Spark expressions, not Scala re-implementations.
  * Native ScalaCheck `Properties` (sbt's test runner executes them
  * alongside the ScalaTest suites).
  */
object SemanticsPropSpec extends Properties("semantics") {

  private lazy val spark = SparkFixture.session

  private val smallLong = Gen.chooseNum(-1000000L, 1000000L)

  property("intDivisionTruncatesTowardZero") =
    Prop.forAll(smallLong, smallLong.suchThat(_ != 0L)) { (a: Long, b: Long) =>
      import spark.implicits._
      val got = Seq((a, b)).toDF("a", "b")
        .selectExpr("a div b").collect()(0).getLong(0)
      // JVM Long division truncates toward zero, like the reference's
      // Rust i64 `/` (binary.rs:66-100)
      got == a / b
    }

  property("floatToIntCastTruncates") =
    Prop.forAll(Gen.chooseNum(-1e9, 1e9)) { (x: Double) =>
      import spark.implicits._
      val got = Seq(x).toDF("x")
        .selectExpr("CAST(x AS BIGINT)").collect()(0).getLong(0)
      got == x.toLong // reference cast.rs:92: f64.trunc() as i64
    }

  property("integerAvgIsTruncatedMean") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-10000L, 10000L))) { (xs: List[Long]) =>
      import spark.implicits._
      val got = xs.toDF("x")
        .selectExpr("sum(x) div count(*) AS m").collect()(0).getLong(0)
      got == xs.sum / xs.length
    }

  property("portableHashDeterministicAnd60Bit") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { (s: String) =>
      import spark.implicits._
      val hs = Seq(s, s).toDF("s")
        .select(graft.operators.Dedup.portableHash(
          org.apache.spark.sql.functions.col("s")).as("h"))
        .collect().map(_.getLong(0))
      hs(0) == hs(1) && hs(0) >= 0L && hs(0) < (1L << 60)
    }

  property("moneyFormattingRoundTripsValue") =
    Prop.forAll(Gen.chooseNum(-999999L, 999999L), Gen.chooseNum(0, 99)) { (whole: Long, cents: Int) =>
      graft.functions.Dialect.register(spark)
      val v = whole.toDouble + (if (whole < 0) -cents else cents) / 100.0
      val s = spark.sql(s"SELECT graft_money(CAST($v AS DOUBLE), false)")
        .collect()(0).getString(0)
      math.abs(s.replace(",", "").toDouble - v) < 0.005 + 1e-9
    }
}
