package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: Array[Float]`, 64-dim).
  *
  * Two tiers:
  *  - [[bruteTopK]] — exact cosine top-k. At 100 TB this is a single
  *    narrow map (query broadcast as literals) + TakeOrderedAndProject:
  *    no shuffle of the vectors, only the top-k heap per partition.
  *  - [[annLsh]] — random-hyperplane LSH: bucket every vector by the
  *    sign pattern of NumPlanes deterministic hyperplanes, probe only
  *    the query's bucket. The scale path: the bucket id is a tiny int,
  *    candidates are an equi-match on it, and bucket skew is bounded by
  *    2^NumPlanes spread.
  *
  * Hyperplanes use integer LCG arithmetic (no platform RNG / libm) so
  * the DuckDB oracle reproduces them exactly.
  */
object Similarity {

  val NumPlanes = 8
  val Dim = 64

  /** Deterministic hyperplane component in [-0.5, 0.5): LCG over the
    * flattened (plane, dim) index. Pure integer math → portable. */
  def planeComponent(p: Int, d: Int): Double = {
    val idx = p * Dim + d
    (((1103515245L * idx + 12345L) % 1000003L + 1000003L) % 1000003L).toDouble / 1000003.0 - 0.5
  }

  private def asDouble = expr("transform(embedding, x -> cast(x as double))")
  private def normExpr = expr(
    "sqrt(aggregate(transform(v, x -> x * x), cast(0.0 as double), (acc, x) -> acc + x))")

  /** vec_id + double vector + precomputed L2 norm. */
  private[operators] def vectors(spark: SparkSession, dir: String): DataFrame =
    vectorsOn(t(spark, dir, "embeddings"))

  private[operators] def vectorsOn(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), asDouble.as("v"))
      .withColumn("nrm", normExpr)

  /** Exact cosine similarity against the vector with vec_id = qid,
    * top k by similarity (vec_id tiebreak). Sums run in index order
    * for oracle-exact arithmetic. */
  def bruteTopK(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10): DataFrame =
    bruteTopKOn(t(spark, dir, "embeddings"), qid, k)

  /** Source-parameterized form (SQL facade: `EXECUTE OPERATOR
    * brute_topk(source = …, qid = …, k = …)`). */
  def bruteTopKOn(emb: DataFrame, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = vectorsOn(emb)
    val q = e.filter(col("vec_id") === qid).select(col("v").as("qv"), col("nrm").as("qn"))
    val dot = graft.functions.ArrayDot.dot(col("v"), col("qv"))
    e.filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), (dot / (col("nrm") * col("qn"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** LSH bucket id: bit b set iff dot(v, plane_b) >= 0.
    *
    * Each plane's dot product is one `aggregate(zip_with(...))` over an
    * array literal — a compact expression tree that stays inside
    * whole-stage codegen (the round-1 form unrolled 8×64 multiply-adds
    * into 512 nodes and fell out of codegen). Left-fold from 0.0 adds
    * in the same index order as the oracle's sum, so signs match
    * bit-for-bit. */
  def bucketExpr: Column = bucketExprBits(NumPlanes)

  /** [[bucketExpr]] generalized to an explicit plane count — the
    * adaptive-granularity form the PAIR-ENUMERATING operators (d5,
    * d10's refinement) use so bucket count scales with the corpus
    * instead of occupancy. Query-side ANN (s2/s3/s5) stays at the
    * fixed [[NumPlanes]]: its per-query cost is one bucket's
    * occupancy — linear in data at fixed bits — and recall is the
    * tunable there, not pair volume. */
  def bucketExprBits(bits: Int): Column = {
    (0 until bits).map { p =>
      val plane = array((0 until Dim).map(d => lit(planeComponent(p, d))): _*)
      // Native codegen'd dot (graft.functions.ArrayDot) — the plane
      // is a foldable literal array; fold order matches the previous
      // interpreted zip_with/aggregate form bit-for-bit.
      val dot = graft.functions.ArrayDot.dot(col("v"), plane)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Adaptive hyperplane-bit count for pair enumeration: the smallest
    * b in [NumPlanes, MaxPlanes] with n ≤ TargetBucket·2^b, i.e.
    * expected bucket occupancy stays ≤ [[TargetBucket]] at any corpus
    * size, so all-pairs-within-bucket work is LINEAR in n (occupancy
    * is a constant factor), not quadratic. Pure-integer comparison
    * ladder — the DuckDB oracle's [[adaptiveBitsSql]] CASE ladder
    * reproduces it exactly with no float-log boundary hazard. At the
    * driver test scales (n ≤ 2048 embeddings) this equals NumPlanes,
    * so small-SF results are unchanged; the sf1 scaling run (20k
    * vectors → 12 bits) exercises the adaptive path end-to-end.
    * Residual caveat: a corpus of near-identical vectors still lands
    * in one bucket — adversarial skew needs a d3-style census cap on
    * top, not finer hashing. */
  val TargetBucket = 8L
  val MaxPlanes = 20
  def adaptiveBits(n: Long): Int =
    (NumPlanes to MaxPlanes).find(b => n <= (TargetBucket << b)).getOrElse(MaxPlanes)

  /** SQL twin of [[adaptiveBits]] over a COUNT expression. */
  private[operators] def adaptiveBitsSql(cntExpr: String): String =
    (NumPlanes until MaxPlanes)
      .map(b => s"WHEN ($cntExpr) <= ${TargetBucket << b} THEN $b")
      .mkString("CASE ", " ", s" ELSE $MaxPlanes END")

  /** SQL twin of [[bucketExprBits]] with a runtime bit count: every
    * plane term up to MaxPlanes is emitted, gated on `p < bits`. */
  private[operators] def bucketSqlBits(v: String, bits: String): String =
    (0 until MaxPlanes).map { p =>
      val dot = (0 until Dim)
        .map(d => s"$v[${d + 1}] * ${planeComponent(p, d)}").mkString(" + ")
      s"CASE WHEN $p < ($bits) AND ($dot) >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("\n  + ")

  /** ANN via hyperplane-LSH: candidates share the query's bucket;
    * exact cosine re-rank within the bucket only. */
  def annLsh(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10): DataFrame =
    annLshOn(t(spark, dir, "embeddings"), qid, k)

  /** Source-parameterized form (SQL facade entry). */
  def annLshOn(emb: DataFrame, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = vectorsOn(emb).withColumn("bucket", bucketExpr)
    val q = e.filter(col("vec_id") === qid)
      .select(col("v").as("qv"), col("nrm").as("qn"), col("bucket").as("qbucket"))
    val dot = graft.functions.ArrayDot.dot(col("v"), col("qv"))
    e.crossJoin(broadcast(q))
      .filter(col("bucket") === col("qbucket") && col("vec_id") =!= qid)
      .select(col("vec_id"), col("bucket"), (dot / (col("nrm") * col("qn"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** s6: BATCH kNN join — a whole set of query vectors against the
    * corpus in ONE bucket equi-join, per-query top-k by window rank.
    * This is the shape a pipeline actually runs (dedup against an
    * index, retrieval for labeling): queries never loop; candidate
    * pairs exist only where LSH buckets collide; and the ranking
    * shuffle is keyed by query_id, so its size is bounded by the
    * candidate count, not |corpus|×Q. The query side broadcasts
    * while it is small; at huge Q the same plan degrades gracefully
    * to a shuffled equi-join on the int bucket key — never a cross
    * product. row_number (cos desc, vec_id asc) makes top-k ties
    * deterministic for the oracle. */
  def batchKnn(spark: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5): DataFrame =
    batchKnnOn(t(spark, dir, "embeddings"), nQueries, k)

  /** Source-parameterized form (SQL facade entry). */
  def batchKnnOn(emb: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vectorsOn(emb).withColumn("bucket", bucketExpr)
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val dot = graft.functions.ArrayDot.dot(col("v"), col("qv"))
    val cand = e.join(broadcast(qs),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot / (col("nrm") * col("qn"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    cand.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  def batchKnnOracleSql(nQueries: Int, k: Int): String =
    s"""$vectorsCte,
       |b AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bucket FROM n),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket
       |  FROM b WHERE vec_id < $nQueries),
       |cand AS (
       |  SELECT q.query_id, b.vec_id,
       |    list_sum(list_transform(range(1, ${Dim + 1}), i -> b.v[i] * q.qv[i])) / (b.nrm * q.qn) AS cos_sim
       |  FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id)
       |SELECT query_id, vec_id, cos_sim, rnk FROM (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM cand)
       |WHERE rnk <= $k""".stripMargin

  /** Multi-probe ANN: probe the query's bucket AND every bucket at
    * Hamming distance 1 (one hyperplane sign flipped) — the standard
    * fix for the single-probe recall cliff when the query sits near a
    * hyperplane. Candidates grow ~(NumPlanes+1)× but stay an
    * equi-match on a small int key; exact cosine re-ranks. */
  def annMultiProbe(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10): DataFrame =
    annMultiProbeOn(t(spark, dir, "embeddings"), qid, k)

  /** Source-parameterized form (SQL facade entry). */
  def annMultiProbeOn(emb: DataFrame, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = vectorsOn(emb).withColumn("bucket", bucketExpr)
    val q = e.filter(col("vec_id") === qid)
      .select(col("v").as("qv"), col("nrm").as("qn"), col("bucket").as("qbucket"))
    val probeSet = array(
      col("qbucket") +: (0 until NumPlanes).map(p =>
        col("qbucket").bitwiseXOR(lit(1L << p))): _*)
    val dot = graft.functions.ArrayDot.dot(col("v"), col("qv"))
    e.crossJoin(broadcast(q))
      .filter(array_contains(probeSet, col("bucket")) && col("vec_id") =!= qid)
      .select(col("vec_id"), (dot / (col("nrm") * col("qn"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF parameters: centroid count, probe width, k-means schedule.
    * Training is deterministic seeded k-means: init = the first
    * NCentroids vectors by id, KMeansIters fixed iterations, cosine
    * assignment (cos_c DESC, cid ASC tiebreak), new centroid =
    * per-dimension mean of its members folded in vec_id order — every
    * float reduction has a pinned order, so the DuckDB oracle replays
    * the training bit-for-bit. Training reads only `vec_id <
    * TrainCap` — the standard IVF practice of training on a bounded
    * sample, which also makes the per-centroid member lists O(TrainCap)
    * however large the corpus (the full-corpus assignment afterwards
    * is a broadcast crossJoin + window, no collected lists). */
  val NCentroids = 16
  val NProbe = 4
  val KMeansIters = 3
  val TrainCap = 4096L

  /** The round-1..5 stand-in centroids (first NCentroids vectors) —
    * kept as the k-means INIT and as the recall baseline in
    * IvfTrainingSpec. */
  private[operators] def seedCentroids(e: DataFrame): Seq[(Long, Seq[Double])] =
    e.filter(col("vec_id") < NCentroids).orderBy(col("vec_id"))
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

  /** Per-centroid score array for the NARROW argmax assignment: one
    * struct(cos_c, ncid) per centroid, each cosine an
    * aggregate(zip_with) against the centroid as an array LITERAL.
    * The centroid norm is precomputed on the driver with the same
    * left-fold order as the oracle's list_sum, so every double is
    * bit-identical to the old broadcast-join form. ncid = −cid makes
    * struct-ordering MAX equal to (cos DESC, cid ASC) FIRST — the
    * exact tiebreak the DuckDB oracle's row_number uses.
    *
    * This replaces the round-6 crossJoin(broadcast(cents)) +
    * row_number window: that plan amplified the corpus ×NCentroids
    * and shuffled the amplified set per query — at 100 TB the IVF
    * bottleneck. The argmax over a 16-element score array is a pure
    * projection: no join, no window, no exchange. */
  private[operators] def scoredExpr(cents: Seq[(Long, Seq[Double])]): Column =
    array(cents.map { case (cid, cv) =>
      val cnrm = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x))
      val cvLit = array(cv.map(lit): _*)
      val dotc = graft.functions.ArrayDot.dot(col("v"), cvLit)
      struct((dotc / (col("nrm") * lit(cnrm))).as("cos_c"), lit(-cid).as("ncid"))
    }: _*)

  /** Narrow vector→centroid assignment: vec_id, v, nrm, cid (argmax
    * cosine, ties to the lower cid), cos_c — one projection over the
    * corpus scan, shuffle-free (PlanShapeSpec pins this). */
  private[operators] def ivfAssign(e: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame =
    e.withColumn("best", array_max(scoredExpr(cents)))
      .select(col("vec_id"), col("v"), col("nrm"),
        (-col("best.ncid")).as("cid"), col("best.cos_c").as("cos_c"))

  /** The query row's NProbe nearest centroid ids, best first: sort
    * the score array descending — (cos DESC, cid ASC), matching the
    * oracle's rn <= NProbe — and slice. */
  private[operators] def probeCidsExpr(cents: Seq[(Long, Seq[Double])]): Column =
    transform(slice(reverse(array_sort(scoredExpr(cents))), 1, NProbe),
      s => -s.getField("ncid"))

  /** Deterministic seeded k-means over the training sample. Each
    * iteration: narrow-map-assign every training vector to its argmax-
    * cosine centroid, then recompute each centroid as the per-dim
    * mean over members sorted by vec_id (empty clusters keep their
    * previous centroid). Centroids (16 rows) sync through the driver
    * per iteration — the classic k-means loop shape; the only shuffle
    * per round is the 16-group aggregation of the TrainCap sample. */
  def trainCentroids(e: DataFrame): Seq[(Long, Seq[Double])] = {
    val train = e.filter(col("vec_id") < TrainCap)
    var cents = seedCentroids(e)
    for (_ <- 1 to KMeansIters) {
      val means = ivfAssign(train, cents)
        .groupBy(col("cid"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("ms"))
        .select(col("cid"), expr(
          s"""transform(sequence(0, ${Dim - 1}), d ->
             |  aggregate(ms, cast(0.0 as double), (acc, s) -> acc + s.v[d]) / size(ms))""".stripMargin).as("cv"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
      cents = cents.map { case (cid, prev) => (cid, means.getOrElse(cid, prev)) }
    }
    cents
  }

  /** A MATERIALIZED IVF index: trained centroids + the corpus stored
    * as inverted lists — parquet partitioned by assigned centroid id,
    * so a probe reads ONLY its NProbe list directories (partition
    * pruning at the scan; no assignment recompute, no join). This is
    * how a real IVF index works: built once offline, probed per
    * query. At 100 TB the build is one narrow map + one partitioned
    * write beside the corpus, and each query touches NProbe/NCentroids
    * of the files. Cached per corpus dir (the corpus is immutable for
    * the battery; rebuild = evict the dir key). */
  private[operators] final case class IvfIndex(cents: Seq[(Long, Seq[Double])], path: String)
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]()
  /** Build counter — observable so IvfIndexSpec can assert repeat
    * queries do NOT re-train or re-assign the corpus. */
  private[operators] val indexBuilds = new java.util.concurrent.atomic.AtomicLong(0)

  private def buildIndex(spark: SparkSession, dir: String): IvfIndex = {
    indexBuilds.incrementAndGet()
    val e = vectors(spark, dir)
    val cents = trainCentroids(e)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_index")
      .toFile.getAbsolutePath
    // Session-lifetime index: reaped on JVM exit so repeated runs
    // don't accrete corpus copies under the temp root (a production
    // deployment would write the index to managed storage instead).
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      val root = Path.of(path)
      if (Files.exists(root))
        Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
    }))
    ivfAssign(e, cents)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    IvfIndex(cents, path)
  }

  /** ANN via IVF: probe the query's NProbe nearest centroid lists,
    * exact cosine re-rank within them only. The second ANN tier next
    * to [[annLsh]] — inverted lists bound candidate count by
    * NProbe/NCentroids of the corpus. `trained = false` skips the
    * materialized index and assigns inline from the seed centroids
    * (recall baseline in IvfTrainingSpec). */
  def ivfTopK(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10,
              trained: Boolean = true): DataFrame = {
    val e = vectors(spark, dir)
    val (cents, lists) =
      if (trained) {
        val idx = indexCache.computeIfAbsent(dir, _ => buildIndex(spark, dir))
        // Explicit schema (incl. the cid partition column) — schema
        // inference would burn a footer-listing job per query.
        (idx.cents, spark.read
          .schema("vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE, cid LONG")
          .parquet(idx.path))
      } else {
        val cs = seedCentroids(e)
        (cs, ivfAssign(e, cs))
      }
    // Probe set: ≤NProbe ints from ONE row — a driver sync of the
    // same class as the centroid collect; the literal cid list is
    // what lets the index scan prune to the probed partitions.
    val probeIds = e.filter(col("vec_id") === qid)
      .select(explode(probeCidsExpr(cents)).as("cid"))
      .collect().map(_.getLong(0)).toSeq
    val q = e.filter(col("vec_id") === qid)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val dot = graft.functions.ArrayDot.dot(col("v"), col("qv"))
    lists.filter(col("cid").isin(probeIds: _*) && col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), (dot / (col("nrm") * col("qn"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** s7: BATCH ANN over the MATERIALIZED IVF index — the production
    * retrieval shape (dedup-against-index, labeling retrieval): N
    * query vectors probe their NProbe inverted lists in ONE equi-join
    * on cid against the partitioned index; per-query top-k via
    * row_number. Candidates are bounded by the probed list sizes
    * (≈ NProbe/NCentroids of the corpus per query), the exploded
    * (query, cid) probe set broadcasts, and the ranking shuffle is
    * keyed by query_id over candidates only — never a cross product
    * (PlanShapeSpec). Complements [[batchKnn]] (s6, LSH buckets) with
    * the trained-index tier. */
  def ivfBatchKnn(spark: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vectors(spark, dir)
    val idx = indexCache.computeIfAbsent(dir, _ => buildIndex(spark, dir))
    val lists = spark.read
      .schema("vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE, cid LONG")
      .parquet(idx.path)
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(probeCidsExpr(idx.cents)).as("cid"))
    val dot = graft.functions.ArrayDot.dot(col("v"), col("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    lists.join(broadcast(qs), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot / (col("nrm") * col("qn"))).as("cos_sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Cluster-size cap for [[semanticDedup]]: in-cluster pair
    * generation is quadratic in cluster size, so a degenerate
    * clustering (everything in one cell) must fail soft, like d2's
    * DF cap and d3's band cap. SemDeDup at scale keeps cells small
    * by growing k with the corpus (k ∝ n), so a binding cap signals
    * a mis-sized k, not normal data. Over-cap cells are not dropped
    * whole (d5's census-cap argument: no exact-dedup tier sits
    * upstream of the embedding path to catch a degenerate cluster) —
    * they switch to a REPRESENTATIVE STAR, each member verified
    * against the cell's min-vec_id vector only, linear in cell
    * size. */
  val MaxSemCluster = 10000

  /** d10: SEMANTIC dedup (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the trained
    * k-means index, then compare pairs ONLY within a cluster — the
    * trained-centroid complement of d5's random-hyperplane buckets
    * (data-adapted cells catch near-dups that straddle a random
    * hyperplane). Reuses the MATERIALIZED IVF index (s4): cluster
    * membership comes from the cid-partitioned posting lists, so the
    * dedup pass reads the index, groups each cell once, and generates
    * pairs inside the (capped) cell locally — identical scale shape
    * to d2/d3, one shuffle on cid, never an embedding self-join.
    * Exact within-cell cosine, fold order matching the oracle. */
  /** d10 sub-bucket refinement target: expected members per
    * (cell, LSH sub-bucket) stays ≤ this, so within-cell all-pairs
    * work is linear in corpus size — cell COUNT is pinned by the
    * trained index (NCentroids, oracle-replayed k-means), so the
    * granularity that scales with data is the refinement, not the
    * cells. refineBits = 0 at the driver test scales (n ≤ 2048):
    * small-SF results are unchanged; sf1 (20k vectors) refines at
    * 4 bits. Same pure-integer ladder contract as [[adaptiveBits]]. */
  val RefineTarget = 128L
  def refineBits(n: Long): Int =
    (0 to 12).find(b => n <= ((RefineTarget * NCentroids) << b)).getOrElse(12)

  /** SQL twin of [[refineBits]] over a COUNT expression. */
  private[operators] def refineBitsSql(cntExpr: String): String =
    (0 until 12)
      .map(b => s"WHEN ($cntExpr) <= ${(RefineTarget * NCentroids) << b} THEN $b")
      .mkString("CASE ", " ", " ELSE 12 END")

  def semanticDedup(spark: SparkSession, dir: String, threshold: Double = 0.4,
                    maxCluster: Int = MaxSemCluster): DataFrame = {
    val idx = indexCache.computeIfAbsent(dir, _ => buildIndex(spark, dir))
    val lists = spark.read
      .schema("vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE, cid LONG")
      .parquet(idx.path)
    // Count is parquet-metadata-cheap; it sizes the refinement only.
    val rb = refineBits(lists.count())
    val refined =
      if (rb == 0) lists.withColumn("rbkt", lit(0L))
      else lists.withColumn("rbkt", bucketExprBits(rb))
    // Same two-tier join shape as d5's census cap (Dedup.embeddingDupOn):
    // a window census over the (cid, rbkt) partitioning the pair join
    // shuffles on — no giant collect_list cell rows (the old shape
    // materialized an over-cap cell as one multi-MB array row BEFORE
    // the cap filter could drop it), no extra shuffles, and the pair
    // dot runs through the native codegen'd ArrayDot instead of the
    // interpreted per-pair zip_with fold the array-lambda form was
    // stuck with. Under-cap cells enumerate all (i < j) pairs;
    // over-cap cells emit representative-star pairs only. The b side
    // is a re-read of the materialized index parquet, not a pipeline
    // recompute.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid"), col("rbkt"))
    val a = refined.withColumn("n_c", count(lit(1)).over(w))
      .withColumn("rep", min(col("vec_id")).over(w))
    val dot = graft.functions.ArrayDot.dot(col("a.v"), col("b.v"))
    a.as("a").join(refined.as("b"),
        col("a.cid") === col("b.cid") && col("a.rbkt") === col("b.rbkt") && (
          (col("a.n_c") <= maxCluster && col("a.vec_id") < col("b.vec_id")) ||
          (col("a.n_c") > maxCluster && col("a.vec_id") === col("a.rep") &&
            col("b.vec_id") =!= col("a.rep"))))
      .select(col("a.cid").as("cid"), col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        (dot / (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  // ------------------------------------------------------------------
  // s8: product quantization (PQ) — the compression tier of ANN
  // ------------------------------------------------------------------

  /** PQ geometry: 64 dims → [[PqM]] subspaces × [[PqSub]] dims, each
    * encoded as the index of its nearest codebook entry (L2), so a
    * vector becomes PqM small ints — 8 codes vs 64 doubles ≈ 64×
    * smaller, the representation FAISS-style IVF-PQ scans at scale. */
  val PqM = 8
  val PqSub = Dim / PqM
  val PqK = 16

  /** Codebooks: per subspace, the sub-slices of the first PqK vectors
    * (vec_id < PqK) — seed-only, deterministically replayable by the
    * oracle (a production build would k-means each subspace exactly
    * like s4's [[trainCentroids]]; the plan shape downstream is
    * identical). Driver footprint: PqM × PqK × PqSub doubles = 8 KB,
    * the same class as s4's centroid sync. */
  private[operators] def pqCodebooks(e: DataFrame): Seq[Seq[Seq[Double]]] = {
    val seeds = e.filter(col("vec_id") < PqK)
      .select(col("vec_id"), col("v")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toIndexedSeq)
    (0 until PqM).map(m => seeds.toSeq.map(v => v.slice(m * PqSub, (m + 1) * PqSub)))
  }

  /** All PqM codes in ONE nested higher-order expression over a 2D
    * codebook literal ([m][j][i]): per subspace, squared-L2 to each
    * entry via an in-order zip_with fold (bit-identical to the
    * oracle's list_sum), argmin via struct-ordering MIN — (dist ASC,
    * j ASC), the oracle's row_number tiebreak. A pure projection: no
    * join, no window, no shuffle. Deliberately NOT unrolled into
    * per-(m,j,i) scalar terms: that variant generated a ~10k-node
    * tree that blew janino's 64 KB method limit (whole-stage codegen
    * bailed to interpreted) and cost seconds of optimizer time. */
  /** The query's ADC table as a 2D array literal: dtab(m)(j) =
    * L2²(q_sub m, codebook(m)(j)), left-fold in index order —
    * bit-identical to the corpus-side expression arithmetic and to
    * the oracle's replay. Driver cost: one query-row collect plus
    * PqM × PqK doubles (1 KB of literals). */
  private def pqQueryDtabLit(e: DataFrame, cb: Seq[Seq[Seq[Double]]], qid: Long): Column = {
    val qv = e.filter(col("vec_id") === qid)
      .select(col("v")).collect()(0).getSeq[Double](0).toIndexedSeq
    val dtab: Seq[Seq[Double]] = (0 until PqM).map { m =>
      (0 until PqK).map { j =>
        (0 until PqSub).foldLeft(0.0) { (acc, i) =>
          val d = qv(m * PqSub + i) - cb(m)(j)(i)
          acc + d * d
        }
      }
    }
    array(dtab.map(row => array(row.map(lit): _*)): _*)
  }

  private def pqCodesExpr(cb: Seq[Seq[Seq[Double]]]): Column =
    // Fully native encoder (graft.functions.PqEncode): the codebook
    // rides as a reference object and all PqM argmins run as one
    // fused primitive loop. The previous hybrid (native ArrayL2
    // inside interpreted transform/array_min/struct machinery) still
    // paid a slice allocation + a struct + an ordering comparison per
    // (m, j) per row — 128 of each. Identical argmin contract:
    // left-to-right (x−y)² fold per entry, strict-< tie-break to the
    // smallest j (the struct-ordering (d ASC, j ASC) min and the
    // oracle's row_number tiebreak).
    graft.functions.ArrayDot.pqEncode(col("v"),
      cb.map(_.map(_.toArray).toArray).toArray)

  /** s8: PQ top-k by asymmetric distance computation (ADC). Encoding
    * AND scoring are one narrow projection over the corpus scan: each
    * vector's 8 codes come from [[pqCodeExpr]], and its approximate
    * distance to the query is 8 literal-table lookups (the query's
    * per-subspace distance table, computed on the driver from the
    * collected query row — PqM × PqK doubles) summed in fixed order.
    * Zero shuffle + TakeOrderedAndProject: at 100 TB this is THE
    * memory-bound ANN scan — codes are 8 bytes/vector, the distance
    * table is 1 KB broadcast as literals, and nothing else moves. */
  def pqTopK(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = vectors(spark, dir)
    val cb = pqCodebooks(e)
    val dtabLit = pqQueryDtabLit(e, cb, qid)
    e.select(col("vec_id"), pqCodesExpr(cb).as("cs"))
      .select(col("vec_id"),
        array_join(transform(col("cs"), c => c.cast("string")), "-").as("code_str"),
        // ADC: 8 table lookups summed in m order (left fold from 0.0
        // == the oracle's left-assoc chain for non-negative terms).
        aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0), (acc, m) =>
          acc + element_at(element_at(dtabLit, m + 1),
            element_at(col("cs"), m + 1) + 1)).as("adist"))
      .filter(col("vec_id") =!= qid)
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Oracle: replay codebooks, encoding argmin, the query's distance
    * table and the fixed-order ADC sum from the same parquet. */
  def pqTopKOracleSql(qid: Long, k: Int): String = {
    val adChain = (1 to PqM).map(m => s"t.dss[$m][c.cs[$m] + 1]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cb AS (
       |  SELECT r.m, CAST(s.vec_id AS INT) AS j,
       |    list_slice(s.v, r.m * $PqSub + 1, r.m * $PqSub + $PqSub) AS c
       |  FROM e s, range($PqM) r(m) WHERE s.vec_id < $PqK),
       |dists AS (
       |  SELECT e.vec_id, cb.m, cb.j,
       |    list_sum(list_transform(range(1, ${PqSub + 1}), i ->
       |      (e.v[cb.m * $PqSub + i] - cb.c[i]) * (e.v[cb.m * $PqSub + i] - cb.c[i]))) AS d
       |  FROM e, cb),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |    FROM dists) WHERE rn = 1),
       |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
       |qd AS (SELECT m, list(d ORDER BY j) AS ds FROM dists WHERE vec_id = $qid GROUP BY m),
       |qdt AS (SELECT list(ds ORDER BY m) AS dss FROM qd)
       |SELECT c.vec_id, array_to_string(c.cs, '-') AS code_str,
       |  $adChain AS adist
       |FROM codes c, qdt t
       |WHERE c.vec_id <> $qid
       |ORDER BY adist ASC, c.vec_id ASC LIMIT $k""".stripMargin
  }

  /** s9: TWO-STAGE retrieval — PQ candidates, exact re-rank (the
    * FAISS `refine` pattern; how production ANN actually serves):
    * stage 1 scans 8-byte codes with s8's ADC projection and keeps
    * `candidates` ids; stage 2 recomputes EXACT cosine for that tiny
    * set only and returns the top k. The candidate frame (vec_id,
    * adist) resolves on the DRIVER — ≤`candidates` (id, adist) pairs,
    * the same sync class as the IVF probe sets — and stage 2 is one
    * id-pruned scan (`isin` pushes to the parquet reader) +
    * TakeOrdered. (First cut kept stage 1 lazy and broadcast it into
    * a join; materializing a TakeOrdered subtree inside a broadcast
    * exchange re-planned stage 1 per sample and measured 7.5 s — the
    * driver sync is the honest, fast shape, and it is exactly how a
    * serving system uses an ANN index: candidates out, fetch, rank.)
    * At 100 TB: stage 1 reads the compressed index (64× smaller),
    * stage 2 touches `candidates` full vectors — the memory/recall
    * trade PQ exists for. */
  def pqRerank(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10,
               candidates: Int = 50): DataFrame = {
    // Collect the stage-1 rows WHOLE: re-projecting (vec_id, adist)
    // here lets CollapseProject inline the shared `cs` codes column
    // into every ADC lookup of the pruned plan — 8× the encode work
    // per row, measured 1.8 → 9.1 s at sf0.1. Full rows keep `cs`
    // referenced twice, which blocks the collapse; the extra column
    // costs nothing on ≤50 collected rows.
    val cands = pqTopK(spark, dir, qid, candidates).collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
    val adistOf = map(cands.flatMap { case (id, ad) => Seq(lit(id), lit(ad)) }: _*)
    val e = vectors(spark, dir)
    val q = e.filter(col("vec_id") === qid)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val dot = graft.functions.ArrayDot.dot(col("v"), col("qv"))
    e.filter(col("vec_id").isin(cands.map(_._1): _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), element_at(adistOf, col("vec_id")).as("adist"),
        (dot / (col("nrm") * col("qn"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Oracle: s8's replay limited to the candidate set, joined back to
    * the vectors for the exact-cosine re-rank. */
  def pqRerankOracleSql(qid: Long, k: Int, candidates: Int): String = {
    val adChain = (1 to PqM).map(m => s"t.dss[$m][c.cs[$m] + 1]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v,
       |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |cb AS (
       |  SELECT r.m, CAST(s.vec_id AS INT) AS j,
       |    list_slice(s.v, r.m * $PqSub + 1, r.m * $PqSub + $PqSub) AS c
       |  FROM e s, range($PqM) r(m) WHERE s.vec_id < $PqK),
       |dists AS (
       |  SELECT e.vec_id, cb.m, cb.j,
       |    list_sum(list_transform(range(1, ${PqSub + 1}), i ->
       |      (e.v[cb.m * $PqSub + i] - cb.c[i]) * (e.v[cb.m * $PqSub + i] - cb.c[i]))) AS d
       |  FROM e, cb),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |    FROM dists) WHERE rn = 1),
       |codes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM enc GROUP BY vec_id),
       |qd AS (SELECT m, list(d ORDER BY j) AS ds FROM dists WHERE vec_id = $qid GROUP BY m),
       |qdt AS (SELECT list(ds ORDER BY m) AS dss FROM qd),
       |cand AS (
       |  SELECT c.vec_id, $adChain AS adist
       |  FROM codes c, qdt t WHERE c.vec_id <> $qid
       |  ORDER BY adist ASC, c.vec_id ASC LIMIT $candidates),
       |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = $qid)
       |SELECT n.vec_id, cand.adist,
       |  list_sum(list_transform(range(1, ${Dim + 1}), i -> n.v[i] * q.qv[i])) / (n.nrm * q.qn) AS cos_sim
       |FROM n JOIN cand ON n.vec_id = cand.vec_id, q
       |ORDER BY cos_sim DESC, n.vec_id ASC LIMIT $k""".stripMargin
  }

  /** s10: SCALAR-QUANTIZED top-k (FAISS SQ8): per-dimension linear
    * int8 quantization — the other point on the compression/recall
    * curve from s8's PQ (4× smaller index vs 32×, far higher recall,
    * no codebook training). Train = one tiny min/max aggregate (2×Dim
    * doubles to the driver — the centroid sync class); encode =
    * clamp(floor((x−mn)·255/(mx−mn))) as ONE narrow expression;
    * search = asymmetric distance against the float query over
    * RECONSTRUCTED values (mn + (code+0.5)·span/255), summed in
    * index order via a left fold so the oracle's replay is
    * bit-identical (the d5/s1 convention). A constant dimension
    * (mx = mn) encodes 0 and reconstructs its midpoint. At 100 TB
    * the scan reads the int8 index, never the float vectors. */
  def sqTopK(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10): DataFrame =
    sqTopKOn(t(spark, dir, "embeddings"), qid, k)

  /** Source-parameterized form (SQL facade entry). */
  def sqTopKOn(emb: DataFrame, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = vectorsOn(emb)
    val aggs = (0 until Dim).flatMap { i =>
      Seq(min(element_at(col("v"), i + 1)).as(s"mn$i"),
        max(element_at(col("v"), i + 1)).as(s"mx$i"))
    }
    val mmRow = e.agg(aggs.head, aggs.tail: _*).collect()(0)
    val mns = (0 until Dim).map(i => mmRow.getDouble(2 * i))
    val mxs = (0 until Dim).map(i => mmRow.getDouble(2 * i + 1))
    val qv = e.filter(col("vec_id") === qid)
      .select(col("v")).collect()(0).getSeq[Double](0).toIndexedSeq
    // Encode + reconstruction distance in ONE fused native pass
    // (graft.functions.SqScan; bounds and query ride as reference
    // objects) — the per-dimension transform + aggregate pair it
    // replaces ran ~128 boxed interpreter steps per row. `st` is
    // projected in its own Select (referenced twice, non-cheap) so
    // CollapseProject cannot inline the kernel per field reference.
    val st = graft.functions.ArrayDot.sqScan(
      col("v"), mns.toArray, mxs.toArray, qv.toArray)
    e.select(col("vec_id"), st.as("st"))
      .select(col("vec_id"),
        array_join(transform(col("st.cs"), c => c.cast("string")), "-").as("code_str"),
        col("st.adist").as("adist"))
      .filter(col("vec_id") =!= qid)
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Oracle: replay min/max training, encoding and the fixed-order
    * reconstruction-distance sum from the same parquet. */
  def sqTopKOracleSql(qid: Long, k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |mm0 AS (
       |  SELECT r.i AS i, min(e.v[r.i + 1]) AS mn, max(e.v[r.i + 1]) AS mx
       |  FROM e, range($Dim) r(i) GROUP BY r.i),
       |mm AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM mm0),
       |codes AS (
       |  SELECT e.vec_id, list_transform(range($Dim), i ->
       |    CASE WHEN mm.mxs[i + 1] > mm.mns[i + 1]
       |      THEN CAST(least(255, greatest(0,
       |        floor((e.v[i + 1] - mm.mns[i + 1]) * 255.0 / (mm.mxs[i + 1] - mm.mns[i + 1])))) AS BIGINT)
       |      ELSE 0 END) AS cs
       |  FROM e, mm),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $qid)
       |SELECT c.vec_id,
       |  array_to_string(c.cs, '-') AS code_str,
       |  list_sum(list_transform(range($Dim), i ->
       |    (q.qv[i + 1] - (mm.mns[i + 1] + (c.cs[i + 1] + 0.5) * (mm.mxs[i + 1] - mm.mns[i + 1]) / 255.0))
       |    * (q.qv[i + 1] - (mm.mns[i + 1] + (c.cs[i + 1] + 0.5) * (mm.mxs[i + 1] - mm.mns[i + 1]) / 255.0)))) AS adist
       |FROM codes c, mm, q
       |WHERE c.vec_id <> $qid
       |ORDER BY adist ASC, c.vec_id ASC LIMIT $k""".stripMargin

  /** s11: IVF-PQ — the FAISS production index shape, composed from
    * the battery's two tiers: s4's TRAINED inverted lists prune the
    * scan to the query's NProbe cells (partition pruning on the
    * materialized index), and s8's PQ codes + query ADC table score
    * only the survivors. Codes are GLOBAL, not per-cell residual
    * (FAISS `by_residual=false`), so s8's codebooks, encode
    * expression and oracle replay compose unchanged with s4's
    * trained assignment. At 100 TB this is the memory-AND-io-bound
    * sweet spot the flat tiers bracket: the probe touches
    * NProbe/NCentroids of the index files, each candidate costs
    * PqM table lookups on an 8-byte code, and only (vec_id, cid,
    * adist) ever moves. */
  def ivfPqTopK(spark: SparkSession, dir: String, qid: Long = 0L, k: Int = 10): DataFrame = {
    val e = vectors(spark, dir)
    val idx = indexCache.computeIfAbsent(dir, _ => buildIndex(spark, dir))
    val lists = spark.read
      .schema("vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE, cid LONG")
      .parquet(idx.path)
    val probeIds = e.filter(col("vec_id") === qid)
      .select(explode(probeCidsExpr(idx.cents)).as("cid"))
      .collect().map(_.getLong(0)).toSeq
    val cb = pqCodebooks(e)
    val dtabLit = pqQueryDtabLit(e, cb, qid)
    lists.filter(col("cid").isin(probeIds: _*) && col("vec_id") =!= qid)
      .select(col("vec_id"), col("cid"), pqCodesExpr(cb).as("cs"))
      .select(col("vec_id"), col("cid"),
        aggregate(sequence(lit(0), lit(PqM - 1)), lit(0.0), (acc, m) =>
          acc + element_at(element_at(dtabLit, m + 1),
            element_at(col("cs"), m + 1) + 1)).as("adist"))
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Oracle: the trained-index CTEs give the assignment + probe set;
    * s8's PQ replay (CTEs renamed to avoid colliding with the
    * training chain) scores the probed cells; same fixed-order ADC
    * chain, same (adist, vec_id) tiebreak. */
  def ivfPqTopKOracleSql(qid: Long, k: Int): String = {
    val adChain = (1 to PqM).map(m => s"t.dss[$m][c.cs[$m] + 1]").mkString(" + ")
    s"""$trainedIndexCtes,
       |probes AS (SELECT cid FROM r WHERE vec_id = $qid AND rn <= $NProbe),
       |pcb AS (
       |  SELECT rm.m, CAST(s.vec_id AS INT) AS j,
       |    list_slice(s.v, rm.m * $PqSub + 1, rm.m * $PqSub + $PqSub) AS c
       |  FROM e s, range($PqM) rm(m) WHERE s.vec_id < $PqK),
       |pdists AS (
       |  SELECT e.vec_id, pcb.m, pcb.j,
       |    list_sum(list_transform(range(1, ${PqSub + 1}), i ->
       |      (e.v[pcb.m * $PqSub + i] - pcb.c[i]) * (e.v[pcb.m * $PqSub + i] - pcb.c[i]))) AS d
       |  FROM e, pcb),
       |penc AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |    FROM pdists) WHERE rn = 1),
       |pcodes AS (SELECT vec_id, list(code ORDER BY m) AS cs FROM penc GROUP BY vec_id),
       |pqd AS (SELECT m, list(d ORDER BY j) AS ds FROM pdists WHERE vec_id = $qid GROUP BY m),
       |pqdt AS (SELECT list(ds ORDER BY m) AS dss FROM pqd)
       |SELECT c.vec_id, va.cid, $adChain AS adist
       |FROM pcodes c JOIN va ON c.vec_id = va.vec_id
       |JOIN probes p ON va.cid = p.cid, pqdt t
       |WHERE c.vec_id <> $qid
       |ORDER BY adist ASC, c.vec_id ASC LIMIT $k""".stripMargin
  }

  /** Bucket histogram — sanity view of LSH spread (skew check). */
  def lshBucketStats(spark: SparkSession, dir: String): DataFrame =
    lshBucketStatsOn(t(spark, dir, "embeddings"))

  /** Source-parameterized form (SQL facade entry). */
  def lshBucketStatsOn(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), asDouble.as("v"))
      .withColumn("bucket", bucketExpr)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"))

  // ------------------------------------------------------------------
  // DuckDB oracle SQL — same constants, same summation order.
  // ------------------------------------------------------------------

  private def vectorsCte: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)""".stripMargin

  /** SQL text of the bucket id for a vector column named `v`
    * (1-based indexing in DuckDB vs getItem's 0-based). Shared with
    * [[Dedup.embeddingDupOracleSql]]. */
  private[operators] def bucketSql(v: String): String =
    (0 until NumPlanes).map { p =>
      val dot = (0 until Dim)
        .map(d => s"$v[${d + 1}] * ${planeComponent(p, d)}").mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("\n  + ")

  def bruteTopKOracleSql(qid: Long, k: Int): String =
    s"""$vectorsCte,
       |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = $qid)
       |SELECT e2.vec_id,
       |  list_sum(list_transform(range(1, ${Dim + 1}), i -> e2.v[i] * q.qv[i])) / (e2.nrm * q.qn) AS cos_sim
       |FROM n e2, q WHERE e2.vec_id <> $qid
       |ORDER BY cos_sim DESC, vec_id LIMIT $k""".stripMargin

  def annLshOracleSql(qid: Long, k: Int): String =
    s"""$vectorsCte,
       |b AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bucket FROM n),
       |q AS (SELECT v AS qv, nrm AS qn, bucket AS qbucket FROM b WHERE vec_id = $qid)
       |SELECT b.vec_id, b.bucket,
       |  list_sum(list_transform(range(1, ${Dim + 1}), i -> b.v[i] * q.qv[i])) / (b.nrm * q.qn) AS cos_sim
       |FROM b, q WHERE b.bucket = q.qbucket AND b.vec_id <> $qid
       |ORDER BY cos_sim DESC, vec_id LIMIT $k""".stripMargin

  def annMultiProbeOracleSql(qid: Long, k: Int): String = {
    val flips = (0 until NumPlanes)
      .map(p => s"xor(q.qbucket, ${1L << p})").mkString(", ")
    s"""$vectorsCte,
       |b AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bucket FROM n),
       |q AS (SELECT v AS qv, nrm AS qn, bucket AS qbucket FROM b WHERE vec_id = $qid)
       |SELECT b.vec_id,
       |  list_sum(list_transform(range(1, ${Dim + 1}), i -> b.v[i] * q.qv[i])) / (b.nrm * q.qn) AS cos_sim
       |FROM b, q
       |WHERE list_contains([q.qbucket, $flips], b.bucket) AND b.vec_id <> $qid
       |ORDER BY cos_sim DESC, b.vec_id LIMIT $k""".stripMargin
  }

  /** Shared oracle prefix: replays the deterministic k-means training
    * (same init, same KMeansIters, same fold orders) as a chain of
    * CTEs, through the full-corpus assignment. cn{i} = centroids
    * after iteration i with norms; `r` = per-vector centroid ranking
    * vs the trained set; `va` = the assignment (rn = 1) — the oracle
    * twin of the materialized posting lists. Every list_sum runs in
    * the same index/vec_id order as the Spark folds. */
  private def trainedIndexCtes: String = {
    val dims = s"range(1, ${Dim + 1})"
    def withNorm(i: Int) =
      s"""cn$i AS (SELECT cid, cv,
         |  sqrt(list_sum(list_transform(cv, x -> x * x))) AS cnrm FROM c$i)""".stripMargin
    val iters = (1 to KMeansIters).map { i =>
      val p = i - 1
      s"""a$i AS (SELECT vec_id, cid,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) AS rn
         |  FROM (SELECT tr.vec_id, c.cid,
         |    list_sum(list_transform($dims, j -> tr.v[j] * c.cv[j])) / (tr.nrm * c.cnrm) AS cos_c
         |  FROM tr, cn$p c)),
         |g$i AS (SELECT a.cid,
         |    list(tr.v ORDER BY tr.vec_id) AS vs
         |  FROM a$i a JOIN tr ON tr.vec_id = a.vec_id WHERE a.rn = 1 GROUP BY a.cid),
         |c$i AS (SELECT p.cid, coalesce(m.cv2, p.cv) AS cv
         |  FROM c$p p LEFT JOIN (SELECT cid,
         |    list_transform($dims, d -> list_sum(list_transform(vs, x -> x[d])) / len(vs)) AS cv2
         |  FROM g$i) m ON p.cid = m.cid),
         |${withNorm(i)}""".stripMargin
    }.mkString(",\n")
    val cn = s"cn$KMeansIters"
    s"""$vectorsCte,
       |tr AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < $TrainCap),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id < $NCentroids),
       |${withNorm(0)},
       |$iters,
       |a AS (SELECT n.vec_id, c.cid,
       |  list_sum(list_transform($dims, i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm) AS cos_c
       |  FROM n, $cn c),
       |r AS (SELECT vec_id, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) AS rn FROM a),
       |va AS (SELECT vec_id, cid FROM r WHERE rn = 1)""".stripMargin
  }

  /** d10 oracle: the trained assignment (va) joined back to the
    * vectors, in-cluster pairs in the same fold order — all pairs
    * under the size cap, representative-star pairs above it (the
    * same two-tier condition the Spark join carries). */
  def semanticDedupOracleSql(threshold: Double, maxCluster: Int = MaxSemCluster): String = {
    val cos = s"list_sum(list_transform(range(1, ${Dim + 1}), " +
      "i -> m1.v[i] * m2.v[i])) / (m1.nrm * m2.nrm)"
    s"""$trainedIndexCtes,
       |rbits AS (SELECT ${refineBitsSql("count(*)")} AS rb FROM embeddings),
       |m AS (SELECT va.cid, n.vec_id, n.v, n.nrm,
       |  ${bucketSqlBits("n.v", "(SELECT rb FROM rbits)")} AS rbkt
       |  FROM va JOIN n ON n.vec_id = va.vec_id),
       |sz AS (SELECT cid, rbkt, count(*) AS cn, min(vec_id) AS rep
       |  FROM m GROUP BY cid, rbkt)
       |SELECT m1.cid, m1.vec_id AS id_a, m2.vec_id AS id_b, $cos AS cos_sim
       |FROM m m1 JOIN m m2 ON m1.cid = m2.cid AND m1.rbkt = m2.rbkt
       |JOIN sz ON sz.cid = m1.cid AND sz.rbkt = m1.rbkt
       |WHERE ((sz.cn <= $maxCluster AND m1.vec_id < m2.vec_id)
       |    OR (sz.cn > $maxCluster AND m1.vec_id = sz.rep AND m2.vec_id <> sz.rep))
       |  AND $cos >= $threshold""".stripMargin
  }

  /** Trained-index probe + re-rank for one query. */
  def ivfTopKOracleSql(qid: Long, k: Int): String = {
    val dims = s"range(1, ${Dim + 1})"
    s"""$trainedIndexCtes,
       |probes AS (SELECT cid FROM r WHERE vec_id = $qid AND rn <= $NProbe),
       |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = $qid)
       |SELECT n.vec_id,
       |  list_sum(list_transform($dims, i -> n.v[i] * q.qv[i])) / (n.nrm * q.qn) AS cos_sim
       |FROM n JOIN va ON n.vec_id = va.vec_id JOIN probes p ON va.cid = p.cid, q
       |WHERE n.vec_id <> $qid
       |ORDER BY cos_sim DESC, n.vec_id LIMIT $k""".stripMargin
  }

  /** s7 oracle: same trained index, batch probe set, per-query rank. */
  def ivfBatchKnnOracleSql(nQueries: Int, k: Int): String = {
    val dims = s"range(1, ${Dim + 1})"
    s"""$trainedIndexCtes,
       |probes AS (SELECT vec_id AS query_id, cid FROM r
       |  WHERE vec_id < $nQueries AND rn <= $NProbe),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
       |  WHERE vec_id < $nQueries),
       |cand AS (
       |  SELECT p.query_id, n.vec_id,
       |    list_sum(list_transform($dims, i -> n.v[i] * q.qv[i])) / (n.nrm * q.qn) AS cos_sim
       |  FROM n JOIN va ON n.vec_id = va.vec_id
       |    JOIN probes p ON va.cid = p.cid
       |    JOIN q ON q.query_id = p.query_id
       |  WHERE n.vec_id <> p.query_id)
       |SELECT query_id, vec_id, cos_sim, rnk FROM (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
       |  FROM cand)
       |WHERE rnk <= $k""".stripMargin
  }

  def lshBucketsOracleSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, ${bucketSql("v")} AS bucket FROM e)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors FROM b GROUP BY bucket""".stripMargin
}
