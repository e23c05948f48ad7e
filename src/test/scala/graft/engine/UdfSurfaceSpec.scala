package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** The user-defined-function surface (SURVEY.md §2.9): the reference
  * has only a compile-time fn-pointer registry; here users register
  * Scala scalar UDFs and typed Aggregator UDAFs into the session and
  * call them from engine SQL. */
class UdfSurfaceSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = new Engine(spark)

  test("scalar udf registered and callable through engine sql") {
    spark.udf.register("shout", (s: String) => s.toUpperCase + "!")
    val Payload.Select(_, rows) = g.execute("SELECT shout('hi') AS s"): @unchecked
    assert(rows == Seq(Seq("HI!")))
  }

  /** Typed UDAF: numerically-stable range (max - min). */
  object RangeAgg extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (Double.MaxValue, Double.MinValue)
    def reduce(b: (Double, Double), a: Double): (Double, Double) =
      (math.min(b._1, a), math.max(b._2, a))
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (math.min(x._1, y._1), math.max(x._2, y._2))
    def finish(r: (Double, Double)): Double = r._2 - r._1
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  test("typed Aggregator UDAF works in grouped engine sql") {
    spark.udf.register("val_range", F.udaf(RangeAgg))
    g.execute("DROP DATABASE IF EXISTS udfdb")
    val loc = java.nio.file.Files.createTempDirectory("udfdb").toFile.getAbsolutePath
    g.execute(s"CREATE DATABASE udfdb LOCATION '$loc'")
    g.execute("CREATE TABLE udfdb.m (k INTEGER, v FLOAT)")
    g.execute("INSERT INTO udfdb.m VALUES (1, 1.0), (1, 4.5), (2, 10.0), (2, 3.0), (2, 7.0)")
    val Payload.Select(_, rows) = g.execute(
      "SELECT k, val_range(v) AS r FROM udfdb.m GROUP BY k ORDER BY k"): @unchecked
    assert(rows == Seq(Seq(1L, 3.5d), Seq(2L, 7.0d)))
  }
}
