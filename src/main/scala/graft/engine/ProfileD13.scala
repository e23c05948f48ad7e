package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 profiling main for d13's span-contents persist tier
  * (round-13 verdict watch item 1 / task 2): times d13 under
  * MEMORY_AND_DISK vs DISK_ONLY at the given scale, then runs a
  * q33-style skew join right after each d13 in the SAME session to
  * surface any pool-squatting the tier leaves behind (the hazard the
  * round-13 disk-tier sweep found for the lazy checkpoints).
  *
  * Run: SPARK_GRAFT_SF_DIR=localdata/sf1 tools/runmain.sh graft.engine.ProfileD13
  */
object ProfileD13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[d13prof] $name%-34s $dt%8.3f s")
      dt
    }
    def runD13(): Unit =
      graft.operators.Dedup.spanMinhashDups(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def runAfterJoin(): Unit =
      graft.operators.Skew.q33SkewJoin(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Warm-up: one pass of each shape so JIT/codegen/scan caches are
    // hot before any measured number.
    time("warmup d13")(runD13())
    time("warmup q33")(runAfterJoin())
    val results = scala.collection.mutable.Map.empty[String, Vector[Double]]
    for (pass <- 1 to 3; lvl <- Seq("MEMORY_AND_DISK", "DISK_ONLY")) {
      spark.conf.set(graft.operators.Dedup.SpanCacheLevelKey, lvl)
      val d = time(s"d13 [$lvl] pass$pass")(runD13())
      val a = time(s"q33-after [$lvl] pass$pass")(runAfterJoin())
      results(s"d13/$lvl") = results.getOrElse(s"d13/$lvl", Vector.empty) :+ d
      results(s"after/$lvl") = results.getOrElse(s"after/$lvl", Vector.empty) :+ a
    }
    results.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      System.err.println(f"[d13prof] MIN $k%-22s ${vs.min}%8.3f s  (all: ${vs.map(v => f"$v%.2f").mkString("/")})")
    }
    spark.stop()
  }
}
