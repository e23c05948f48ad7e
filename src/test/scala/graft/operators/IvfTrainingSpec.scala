package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** IVF k-means training: deterministic (same centroids on every run —
  * the property the DuckDB oracle replay depends on), actually moves
  * the centroids off the seed set, and improves recall on clustered
  * data.
  *
  * The recall comparison runs on a synthetic CLUSTERED corpus, not
  * the driver's uniform-random embeddings: with no cluster structure
  * k-means has nothing to learn and recall differences are noise
  * (measured: seed and trained list sizes are both near-balanced on
  * the testdata). On clustered vectors — the workload IVF exists for
  * — a trained centroid sits at its cluster's mean, so a cluster's
  * members land in ONE list and the query's probe finds them; a seed
  * centroid is a single noisy member and splits clusters across
  * lists. */
class IvfTrainingSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  test("training is deterministic and moves centroids off the seeds") {
    val e = Similarity.vectors(spark, "/root/testdata/sf0.01")
    val c1 = Similarity.trainCentroids(e)
    val c2 = Similarity.trainCentroids(e)
    assert(c1 == c2, "k-means must be bit-deterministic across runs")
    assert(c1.map(_._1) == (0L until Similarity.NCentroids.toLong))
    val seeds = e.filter(org.apache.spark.sql.functions.col("vec_id") < Similarity.NCentroids)
      .orderBy("vec_id").select("v").collect().map(_.getSeq[Double](0).toSeq)
    assert(c1.map(_._2) != seeds.toSeq, "training left every centroid at its seed")
  }

  /** 20 well-separated clusters × 40 members in 64-dim, deterministic
    * integer-LCG generation. Members are BLOCKED by cluster (cluster
    * of vec_id i is i / 40) — the realistic corpus layout (data
    * arrives ordered by source), and exactly the one where
    * first-N-by-id seed centroids are pathological: all 16 seeds come
    * from cluster 0, so seed assignment scatters every other cluster
    * by noise correlation, while k-means walks the centroids out to
    * the true cluster means. */
  private lazy val clusteredDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ivf_clustered").toFile.getAbsolutePath
    def lcg(seed: Long): Double = {
      val x = (1103515245L * seed + 12345L) % 1000003L
      ((x + 1000003L) % 1000003L).toDouble / 1000003.0
    }
    val nClusters = 20
    val rows = (0 until 800).map { i =>
      val c = i / 40
      val v = (0 until Similarity.Dim).map { d =>
        val center = if (lcg(c * 64L + d) < 0.5) -1.0f else 1.0f
        center + (1.6 * (lcg(i * 64L + d + 7919L) - 0.5)).toFloat
      }.toArray
      (i.toLong, v)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("trained recall@10 beats seed-centroid recall on clustered data") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val qids = Seq(3L, 77L, 201L, 404L, 555L, 666L)
    var trainedHits = 0
    var seedHits = 0
    for (q <- qids) {
      val truth = ids(Similarity.bruteTopK(spark, clusteredDir, q, 10))
      trainedHits += (truth & ids(Similarity.ivfTopK(spark, clusteredDir, q, 10, trained = true))).size
      seedHits += (truth & ids(Similarity.ivfTopK(spark, clusteredDir, q, 10, trained = false))).size
    }
    info(s"trained recall $trainedHits/60, seed recall $seedHits/60")
    assert(trainedHits >= seedHits,
      s"trained recall $trainedHits/60 fell below seed recall $seedHits/60")
    assert(trainedHits >= 45, s"trained recall $trainedHits/60 too low for clustered data")
  }

  test("training improves quantization quality (k-means objective)") {
    import org.apache.spark.sql.functions._
    val e = Similarity.vectors(spark, clusteredDir)
    def meanAssignedCos(cents: Seq[(Long, Seq[Double])]): Double =
      Similarity.ivfAssign(e, cents)
        .agg(avg(col("cos_c"))).collect()(0).getDouble(0)
    val seedQ = meanAssignedCos(Similarity.seedCentroids(e))
    val trainedQ = meanAssignedCos(Similarity.trainCentroids(e))
    info(f"mean cos to assigned centroid: seed $seedQ%.4f, trained $trainedQ%.4f")
    assert(trainedQ > seedQ,
      f"training must tighten the lists: trained $trainedQ%.4f vs seed $seedQ%.4f")
  }
}
