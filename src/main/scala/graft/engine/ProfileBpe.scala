package graft.engine

import org.apache.spark.sql.SparkSession

/** t18/t19 k-scaling witness (round-12 verdict item: "a recorded
  * time that scales ~linearly in k"). Runs the production learner at
  * doubling round budgets over sf0.1 and prints per-k wall times for
  * learn (one corpus pass + driver-local merges) and learned-apply
  * (one codegen'd projection). The corpus pass is k-independent, so
  * learn time = constant + (incremental merge loop ~ linear in
  * merges actually performed); the corpus dries near k≈90 on the
  * 31-word vocab, after which added rounds are free pops. */
object ProfileBpe {
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
    import graft.operators.TextOps
    val docs = graft.Tables.t(spark, sfDir, "documents")
    // Session warm-up so k=32 isn't charged the JIT bill.
    TextOps.bpeLearnedTokens(spark, sfDir, 8).write.format("noop").mode("overwrite").save()
    for (k <- Seq(32, 64, 128, 256, 512)) {
      val t0 = System.nanoTime()
      val merges = TextOps.bpeLearnOn(docs, k).collect()
      val tLearn = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      TextOps.bpeLearnedTokens(spark, sfDir, k)
        .write.format("noop").mode("overwrite").save()
      val tApply = (System.nanoTime() - t1) / 1e9
      System.err.println(
        f"[bpeprof] k=$k%4d merges=${merges.length}%4d learn=$tLearn%6.3f s  learn+apply=$tApply%6.3f s")
    }
    spark.stop()
  }
}
