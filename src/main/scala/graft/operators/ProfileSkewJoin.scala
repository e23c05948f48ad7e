package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-join strategy witness (round-16 verdict task 7): on the
  * planted-skew corpus (30% of lineitem rows on one hot orderkey),
  * which plan actually wins — Spark's default shuffle join with AQE's
  * runtime hot-partition split, or the repo's own salted join
  * ([[Skew.saltedJoin]], q33's battery plan) at salt factors 4/16?
  *
  * All variants compute the identical q33 aggregate (fact ⋈ dim on
  * orderkey → groupBy(o_orderstatus) → SUM(l_quantity)) and are
  * cross-checked for exact result equality before any number is
  * printed — a faster wrong plan is a failure, not a win. 3 samples
  * per variant, min, interleaved variant-major so one host stall
  * cannot land on all samples of one variant.
  *
  * Run: `tools/runmain.sh graft.operators.ProfileSkewJoin localdata/sf10skew`
  * Prints one JSON line; nonzero exit on a result mismatch.
  */
object ProfileSkewJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "localdata/sf1skew"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-skewjoin-witness")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables.t

    def fact = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    def dim = t(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    def agg(joined: org.apache.spark.sql.DataFrame) =
      joined.groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("sum_qty"))

    // The hot-key census, so the artifact names what it measured.
    val hot = fact.groupBy("k").count().orderBy(desc("count")).limit(1).head
    val nFact = fact.count()
    println(f"[skewjoin] corpus: $nFact rows, hottest key ${hot.get(0)} holds " +
      f"${hot.getLong(1)} rows (${100.0 * hot.getLong(1) / nFact}%.1f%%)")

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      // Spark's own answer: plain shuffle join, AQE skew split ON
      // (default). What a user gets without reaching for the operator.
      "aqe_plain" -> (() => agg(fact.join(dim, "k"))),
      "salted_4" -> (() => agg(Skew.saltedJoin(fact, dim, "k", saltFactor = 4))),
      "salted_16" -> (() => agg(Skew.saltedJoin(fact, dim, "k", saltFactor = 16))))

    // Exact-equality gate first (one run each, sorted collect).
    val results = variants.map { case (name, mk) =>
      name -> mk().orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    }.toMap
    val ref = results("aqe_plain")
    for ((name, r) <- results if r != ref)
      { System.err.println(s"[skewjoin] $name result differs from aqe_plain"); sys.exit(1) }

    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
    for (_ <- 1 to 3; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      samples(name) = samples.getOrElse(name, Vector.empty) :+ dt
    }
    def ms(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val mins = variants.map { case (name, _) => name -> samples(name).min }
    val body = mins.map { case (n, v) => "\"" + n + "\":" + ms(v) }.mkString(",")
    val best = mins.minBy(_._2)
    println(s"""{"metric":"skewjoin_sec","sf":"$sfDir",$body,"winner":"${best._1}"}""")
    spark.stop()
  }
}
