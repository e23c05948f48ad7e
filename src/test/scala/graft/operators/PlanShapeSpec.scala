package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked plan shapes for the 100 TB claims the operator
  * doc-comments make. Prose claims rot; these assertions fail the
  * build if Catalyst stops producing the plan the claim describes:
  * filters reach the parquet scan (PushedFilters), projection prunes
  * the read schema, dimension joins broadcast, aggregation combines
  * map-side (partial_*), top-k runs as TakeOrderedAndProject, and
  * exact dedup shuffles digests instead of documents. Checked on the
  * executed (formatted) plan at sf0.001 — plan shape is
  * scale-independent. */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // executed plan (AQE-final), not just the static one
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  /** Force DistributedPrefix's AT-SCALE branch (the size gate would
    * otherwise route sf0.001 onto the single-window fast path). The
    * sliced pins below are scoped to this branch; the fast path has
    * its own pin ("small input" test). Gate is read at plan-BUILD
    * time, so the conf wraps construction. */
  private def sliced[A](body: => A): A = {
    spark.conf.set(DistributedPrefix.SmallInputBytesKey, "0")
    try body
    finally spark.conf.unset(DistributedPrefix.SmallInputBytesKey)
  }

  test("q2: filter pushed to scan, read schema pruned to 5 columns") {
    val p = plan(CoreQueries.q2FilterProject(spark, dir))
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"filters did not reach the parquet scan:\n$p")
    // ReadSchema carries only the projected + filter columns, never
    // the 16-column lineitem row
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_orderkey") && !read.contains("l_comment"),
      s"projection did not prune the scan: $read")
  }

  test("d3 signatures: row-local kernel chain runs once, no explode/groupBy shuffle") {
    val df = Dedup.minhashSignatures(spark, dir)
    val p = plan(df)
    // The signature stage is one narrow projection: no exchange at
    // all (the retired form shuffled every (doc, shingle-hash) row
    // into a 16-way min aggregation).
    assert(!p.contains("Exchange"), s"signature stage shuffles:\n$p")
    assert(!p.contains("Generate"), s"signature stage explodes shingles:\n$p")
    // The kernel chain binds ONCE: CollapseProject must not inline
    // the multi-referenced sig array into each of the 16 mh columns.
    val opt = df.queryExecution.optimizedPlan.toString
    val hits = "gramhashes".r.findAllIn(opt.toLowerCase).size
    assert(hits == 1, s"GramHashes evaluates $hits times in the optimized plan:\n$opt")
  }

  test("q3: filtered dimension broadcasts; top-k is TakeOrderedAndProject") {
    val p = plan(CoreQueries.q3TopRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in q3:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k sorted fully:\n$p")
  }

  test("q1: aggregation is partial (map-side combine) before the exchange") {
    val p = plan(CoreQueries.q1PricingSummary(spark, dir))
    assert(p.contains("partial_sum"), s"no map-side partial aggregation:\n$p")
  }

  test("q6: small dims broadcast — no shuffle join against nation/region") {
    val p = plan(CoreQueries.q6NationRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in q6:\n$p")
  }

  test("q15 top-3 per nation: salted two-stage top-k, no 25-task sort") {
    val p = sliced(plan(CoreQueries.q15WindowRank(spark, dir)))
    // stage 1 must rank within (salt, nation) — the data-sized sort
    // is balanced over 64 sub-keys per nation, never per bare nation
    assert("row_number\\(\\) windowspecdefinition\\(salt#\\d+, c_nationkey#\\d+".r
      .findFirstIn(p).isDefined,
      s"q15 lost its salted first-stage ranking:\n$p")
  }

  test("q15 small input: the gate drops the salt stage (one window)") {
    val p = plan(CoreQueries.q15WindowRank(spark, dir))
    assert(!p.contains("salt#"),
      s"q15 pays the salted two-stage plan on a small input:\n$p")
  }

  test("q35 window suite: derived from rankedSlices, no bare-status data window") {
    val p = sliced(plan(CoreQueries.q35WindowSuite(spark, dir)))
    // slice ids are value-derived (logSlice) — no range partitioner,
    // no sampling pass; the ranking window is per (slice, status)
    assert(!p.contains("rangepartitioning"),
      s"q35 pays a range-sampling pass it does not need:\n$p")
    assert("windowspecdefinition\\(s#\\d+L?, o_orderstatus#\\d+".r
      .findFirstIn(p).isDefined,
      s"q35's ranking window is not per-(slice, status):\n$p")
    // a window partitioned by the 3-value status key ordering the
    // DATA (by totalprice) would be a 3-task sort; the only bare-
    // status window allowed is the boundary/edge one ordered by slice
    assert("windowspecdefinition\\(o_orderstatus#\\d+, o_totalprice#\\d+".r
      .findFirstIn(p).isEmpty,
      s"q35 sorts whole status groups in single window tasks:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"q35's edge/third joins are not broadcast:\n$p")
  }

  test("q30 exact percentile: sliced selection, no single-task sort") {
    val p = sliced(plan(CoreQueries.q30Percentiles(spark, dir)))
    // the built-in `percentile` would appear as an ObjectHashAggregate
    // holding every group value in one executor array
    assert(!p.contains("ObjectHashAggregate") && !p.contains("percentile("),
      s"q30 fell back to a buffered percentile aggregate:\n$p")
    // slice ids are value-derived (logSlice) — no range partitioner,
    // no sampling pass — and ranking is per (slice, g), never by g
    // alone (which would full-sort each group in ONE task at any
    // cluster size — the shape this spec exists to forbid)
    assert(!p.contains("rangepartitioning"),
      s"q30 pays a range-sampling pass it does not need:\n$p")
    assert("row_number\\(\\) windowspecdefinition\\(s#\\d+L?, g#\\d+".r
      .findFirstIn(p).isDefined,
      s"q30's ranking window is not per-(slice, g):\n$p")
    assert("row_number\\(\\) windowspecdefinition\\(g#\\d+".r
      .findFirstIn(p).isEmpty,
      s"q30 ranks with a per-group (single-task) window sort:\n$p")
    // offsets and wanted-rank tables are tiny → broadcast, not shuffled
    assert(p.contains("BroadcastHashJoin"),
      s"q30's offset/wanted joins are not broadcast:\n$p")
  }

  test("s6 batch kNN: bucket equi-join broadcasts the query batch, no cross product") {
    val df = Similarity.batchKnn(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"query batch did not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"batch kNN degenerated to a cross product:\n$p")
    // per-query result bounded by k with deterministic ranks 1..k
    val rows = df.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks.length <= 5 && ranks.sameElements(1L to ranks.length),
        s"query $q has ranks ${ranks.mkString(",")}")
    }
  }

  test("q29 point find: literal key pushed to scan, no join, conf restored") {
    val before = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    val p = plan(CoreQueries.q29PointFind(spark, dir))
    // the probe resolves eagerly (footer-stats min under a scoped
    // conf); the returned plan must be a pushed-down point filter
    assert(p.contains("PushedFilters:") && p.contains("l_orderkey"),
      s"point key did not reach the scan:\n$p")
    assert(!p.contains("Join"), s"point find still joins:\n$p")
    assert(spark.conf.getOption("spark.sql.parquet.aggregatePushdown") == before,
      "q29 leaked the aggregatePushdown conf into the session")
  }

  test("q29 min-key probe is a driver metadata read — zero Spark jobs") {
    // Warm the schema cache first: on a cold Tables.schemaCache the
    // frame build itself runs the one-off footer-inference job, which
    // this test must not count against the probe (order-independence).
    graft.Tables.t(spark, dir, "lineitem").schema
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).toSet
    CoreQueries.q29PointFind(spark, dir) // probe resolves at build time
    val started = tracker.getJobIdsForGroup(null).toSet -- before
    assert(started.isEmpty,
      s"building q29 launched job(s) $started; the footer probe must not")
  }

  test("s4 IVF assignment: narrow argmax map — no window, no exchange") {
    val e = Similarity.vectors(spark, dir)
    val p = plan(Similarity.ivfAssign(e, Similarity.seedCentroids(e)))
    // the round-6 shape was crossJoin(broadcast(centroids)) +
    // row_number: ×16 row amplification and a full shuffle of the
    // amplified set; the narrow argmax must stay a pure projection
    assert(!p.contains("Window"), s"assignment ranks through a window:\n$p")
    assert(!p.contains("Exchange"), s"assignment shuffles:\n$p")
    assert(!p.contains("Join"), s"assignment joins:\n$p")
  }

  test("s4 IVF probe: index scan prunes to the probed cid partitions") {
    val p = plan(Similarity.ivfTopK(spark, dir, 0L, 10, trained = true))
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("cid"), s"index scan does not prune by cid:\n$p")
    assert(!p.contains("Window"), s"probe path ranks through a window:\n$p")
  }

  test("e6 range join: bucket-derived equi key, no nested-loop join") {
    val p = plan(graft.streaming.EventOps.rangeJoin(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"no equi-join on the derived bucket key:\n$p")
  }

  test("d1 exact dedup: shuffle carries md5 digests, not document text") {
    val df = Dedup.exactDedup(spark, dir)
    val p = plan(df)
    // the exchange's hash partitioning key is the md5 digest (shown
    // as the grouping expression computed below the exchange), and
    // the aggregation is map-side partial — so only 16-byte digests
    // plus partial aggregates cross the wire, never document text
    assert(p.contains("hashpartitioning(_groupingexpression"),
      s"dedup does not shuffle on the computed digest key:\n$p")
    assert(p.contains("md5("), s"digest not computed below the exchange:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"dedup aggregation is not map-side partial:\n$p")
  }

  test("m1: media metadata query never reads the content column") {
    val p = plan(Multimodal.m1MediaMeta(spark, dir))
    // content derives from documents.text at ingest; the metadata
    // query reads text only to compute lengths — but must NOT carry
    // binary content into an exchange (narrow, zero-shuffle plan)
    assert(!p.contains("Exchange"), s"metadata summary should be narrow:\n$p")
  }

  test("t1 text stats: single narrow pass, zero shuffle") {
    val p = plan(TextOps.tokenStats(spark, dir))
    assert(!p.contains("Exchange"), s"token stats should be shuffle-free:\n$p")
  }

  test("t6 repetition filter: per-document array math, zero shuffle") {
    val p = plan(TextOps.repetitionFilter(spark, dir))
    assert(!p.contains("Exchange"), s"repetition filter should be narrow:\n$p")
  }

  test("t8 token budget: distributed prefix sum, no whole-language window sort") {
    val p = sliced(plan(TextOps.tokenBudget(spark, dir)))
    assertDistributedPrefix(p, "t8")
  }

  /** The DistributedPrefix contract (t8/t8b/t11/t12): the group's
    * hash-ordered stream is sliced by the salted hash's own top bits
    * (no range sampling — the hash is uniform), the running
    * aggregate is computed per (slice, lang), offsets arrive by
    * broadcast — and no data-sized window ever partitions by the
    * bare language key (one task per language at any cluster size,
    * the shape these entries used to have). ONE full-data exchange:
    * the (slice, lang) hash shuffle serves the offset aggregate and
    * the slice window alike (no rangepartitioning anywhere). */
  private def assertDistributedPrefix(p: String, tag: String): Unit = {
    assert(!p.contains("rangepartitioning"),
      s"$tag pays a range-sampling pass it does not need:\n$p")
    assert("windowspecdefinition\\(__dp_s#\\d+L?, lang#\\d+".r
      .findFirstIn(p).isDefined,
      s"$tag's running window is not per-hash-slice (slice, lang):\n$p")
    // the offsets window (lang ordered by slice, ≤4096×|langs| rows)
    // is the only window allowed to partition by lang alone; the
    // forbidden shape orders the DATA (by h) under a bare-lang
    // partition
    assert("windowspecdefinition\\(lang#\\d+, h#\\d+".r.findFirstIn(p).isEmpty,
      s"$tag ranks a whole language in one window task:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"$tag's offset join is not broadcast:\n$p")
  }

  test("s8 PQ top-k: encode+ADC is one narrow projection, top-k never sorts fully") {
    val p = plan(Similarity.pqTopK(spark, dir))
    assert(!p.contains("Join"), s"PQ scoring must not join:\n$p")
    assert(!p.contains("Window"), s"PQ scoring must not rank through a window:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"PQ top-k sorted fully:\n$p")
    val finalTree = p.split("== Initial Plan ==")(0)
    assert(!finalTree.contains("Exchange ("),
      s"PQ scan should be shuffle-free (TakeOrdered reduces on the driver):\n$p")
  }

  test("d8 contamination: gram joins only, never doc×doc") {
    val p = plan(Dedup.contamination(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d8 degenerated to a cross product:\n$p")
  }

  test("t9 corpus-freq: vocab table broadcasts back — corpus never shuffles on token") {
    val p = plan(TextOps.corpusFreqScore(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"vocab join did not broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"frequency agg lost its map-side combine:\n$p")
  }

  test("e8 trailing velocity: RANGE frame through one shuffle, never a self-join") {
    val p = plan(graft.streaming.EventOps.trailingVelocity(spark, dir))
    assert(p.contains("Window"), s"no window frame stage in e8:\n$p")
    assert(!p.contains("Join"), s"e8 degenerated to an inequality self-join:\n$p")
    val finalTree = p.split("== Initial Plan ==")(0)
    assert(finalTree.linesIterator.count(_.contains("Exchange (")) == 1,
      s"e8 shuffled more than once:\n$p")
  }

  test("d7 incremental dedup: no cross product; exact path shuffles digests, not text") {
    val p = plan(Dedup.incrementalDedup(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d7 degenerated to a cross product:\n$p")
    assert(p.contains("md5("), s"exact path does not join on content digests:\n$p")
  }

  test("s7 IVF batch kNN: probe set broadcasts, no cross product, no corpus window") {
    val df = Similarity.ivfBatchKnn(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"probe set did not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"batch IVF degenerated to a cross product:\n$p")
    // ranks are per-query and bounded by k
    val byQ = df.collect().groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks.length <= 5 && ranks.sameElements(1L to ranks.length),
        s"query $q has ranks ${ranks.mkString(",")}")
    }
  }

  test("t10 BPE counts: pure narrow projection — no exchange, no join") {
    val p = plan(TextOps.bpeTokenCounts(spark, dir))
    assert(!p.contains("Exchange"), s"t10 shuffles:\n$p")
    assert(!p.contains("Join"), s"t10 joins:\n$p")
    // the scan reads only the two columns used
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("lang"), s"t10 did not prune the scan: $read")
  }

  test("t8b BPE budget: distributed prefix sum over the native BPE counts") {
    val p = sliced(plan(TextOps.tokenBudgetBpe(spark, dir)))
    assertDistributedPrefix(p, "t8b")
  }

  test("t11 sequence pack / t12 fixed-k: same distributed prefix contract") {
    sliced {
      assertDistributedPrefix(plan(TextOps.sequencePack(spark, dir)), "t11")
      assertDistributedPrefix(plan(TextOps.fixedKSample(spark, dir)), "t12")
    }
  }

  test("small input: DistributedPrefix gate picks the plain single-window plan") {
    // Default gate at sf0.001: the estimated input is far under the
    // threshold, so the fast path runs — ONE ordinary window, no
    // slice machinery (no __dp_s, no offsets join, no checkpoint).
    // Full-row parity of the two branches is DistributedPrefixSpec /
    // DistributedPrefixPropSpec territory; this pins the plan shape.
    val p8 = plan(TextOps.tokenBudget(spark, dir))
    assert(!p8.contains("__dp_s"), s"t8 sliced a small input:\n$p8")
    assert("windowspecdefinition\\(lang#\\d+, h#\\d+".r.findFirstIn(p8).isDefined,
      s"t8's fast path lost its single running window:\n$p8")
    assert(!p8.contains("BroadcastHashJoin") && !p8.contains("SortMergeJoin"),
      s"t8's fast path still pays the offsets join:\n$p8")
    val p35 = plan(CoreQueries.q35WindowSuite(spark, dir))
    assert(!p35.contains("__dp_"), s"q35 sliced a small input:\n$p35")
    assert("row_number\\(\\) windowspecdefinition\\(o_orderstatus#\\d+, o_totalprice#\\d+".r
      .findFirstIn(p35).isDefined,
      s"q35's fast path lost its single ranking window:\n$p35")
  }

  test("c1 corpus prep: four tiers collapse to one scan + one shuffle") {
    val p = plan(CorpusPrep.cleanCorpus(spark, dir))
    assert(!p.contains("Join"), s"c1 joins (tiers did not fuse):\n$p")
    val finalPlan = p.split("== Initial Plan ==")(0)
    val exchanges = finalPlan.linesIterator.count(_.contains("- Exchange"))
    assert(exchanges == 1, s"c1 has $exchanges exchanges (want 1 — the fp window):\n$p")
    // one scan of documents, not four
    val scans = finalPlan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"c1 scans $scans times (want 1):\n$p")
  }

  test("d11 span dedup: one scan, digest-only window — no self-join") {
    val p = plan(Dedup.paragraphDedup(spark, dir))
    // the round-8 review found the original spans⋈freq self-join
    // re-ran the scan+explode subtree twice; the window form must not
    assert(!p.contains("Join"), s"d11 self-joins (double scan):\n$p")
    val finalPlan = p.split("== Initial Plan ==")(0)
    val scans = finalPlan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"d11 scans documents $scans times (want 1):\n$p")
  }

  test("t13 shuffle-shard: distributed in-shard positions, never a global sort") {
    val p = sliced(plan(TextOps.shuffleShard(spark, dir)))
    // pos comes from DistributedPrefix.rowNumberHashOrdered: hash-bit
    // slices and per-slice ranking — no task ever sorts a whole shard
    // (corpus/shards rows however the count is tuned), and nothing
    // funnels through a single partition
    assert("row_number\\(\\) windowspecdefinition\\(__dp_s#\\d+L?, shard#\\d+".r
      .findFirstIn(p).isDefined,
      s"t13's ranking window is not per-hash-slice:\n$p")
    assert("row_number\\(\\) windowspecdefinition\\(shard#\\d+".r
      .findFirstIn(p).isEmpty,
      s"t13 ranks a whole shard in one window task:\n$p")
    assert(!p.contains("SinglePartition"),
      s"t13 collapses to a single partition:\n$p")
  }

  test("t14 mixture: rate table broadcasts, corpus never shuffles") {
    val p = plan(TextOps.mixtureSample(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"t14 rate join did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"t14 shuffled the corpus for a #sources-row rate table:\n$p")
  }

  test("m6 phash dups: in-bucket pair generation — no join, no cross product") {
    val p = plan(Multimodal.phashDups(spark, dir))
    // pairs come from explode inside band buckets (the d3 shape), so
    // the plan must contain NO join of any kind — a self-join here
    // would recompute the mapPartitions hash pass twice and a cross
    // product would be n²
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"m6 pairs via join instead of in-bucket explode:\n$p")
  }

  test("p1 PII scan: pure narrow projection — no exchange, no join") {
    val p = plan(Pii.piiScan(spark, dir))
    assert(!p.contains("Exchange"), s"p1 shuffles:\n$p")
    assert(!p.contains("Join"), s"p1 joins:\n$p")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("lang") && !read.contains("source"),
      s"p1 did not prune the scan: $read")
  }

  test("t16 vocab growth: word shuffle is map-side combined; doc counts broadcast") {
    val p = plan(TextOps.vocabStats(spark, dir))
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"word-frequency agg is not partial before the exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"doc-count join did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"t16 sort-merge joins two tiny aggs:\n$p")
  }

  test("t17 bigram predictability: argmax table broadcasts back, no corpus word-shuffle join") {
    // materialize = false: the production path eagerly checkpoints its
    // result (cache-release contract), which explains as LogicalRDD;
    // the pin wants the operator's declarative plan.
    val p = plan(TextOps.bigramPredictability(spark, dir,
      TextOps.BigramModelBroadcastCap, materialize = false))
    assert(p.contains("BroadcastHashJoin"), s"argmax model join did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"t17 shuffles the corpus bigram stream into a merge join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"bigram count agg is not map-side combined:\n$p")
  }

  test("t17 over-cap regime: model joins by shuffle, same rows as the broadcast plan") {
    // Force the vocab-scale fallback (cap 0) and stop both the static
    // planner and AQE from re-broadcasting the small test model, so
    // the pinned plan is the one a 100 TB vocab would actually get.
    val broadcastRows = TextOps.bigramPredictability(spark, dir).collect().toSet
    val autoBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", autoBefore)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = TextOps.bigramPredictability(spark, dir, 0L, materialize = false)
      val p = plan(df)
      assert(!p.contains("BroadcastHashJoin"),
        s"over-cap model still broadcasts:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"over-cap model is not a shuffle equi-join:\n$p")
      assert(df.collect().toSet == broadcastRows,
        "fallback regime changed t17's results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autoBefore)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aqeBefore)
    }
  }

  test("t13b shard manifest: window and aggregate share ONE exchange on shard") {
    val p = plan(TextOps.shardManifest(spark, dir))
    val finalTree = p.split("== Initial Plan ==")(0)
    assert(finalTree.linesIterator.count(_.contains("Exchange (")) == 1,
      s"manifest should reuse the window's shard distribution for the agg:\n$p")
  }

  test("p3 Luhn scrub: row-local array exprs — no exchange, no join") {
    val p = plan(Pii.ccScrub(spark, dir))
    assert(!p.contains("Exchange"), s"p3 shuffles:\n$p")
    assert(!p.contains("Join"), s"p3 joins:\n$p")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("l_comment") && !read.contains("l_quantity"),
      s"p3 did not prune the scan: $read")
  }

  test("t18 learn phase: ONE map-side-combined corpus pass, text-only scan") {
    // Round 12: the learner's distributed work is exactly the
    // word-frequency aggregate — the k merge rounds run driver-local
    // on the collected vocab-bounded table (production-trainer
    // shape), so the plan to pin is the single corpus pass.
    val docs = graft.Tables.t(spark, dir, "documents")
    val p = plan(TextOps.bpeInitialSegs(docs))
    assert(p.contains("partial_count"), s"word count not map-side combined:\n$p")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("text") && !read.contains("lang") && !read.contains("source"),
      s"learn pass did not prune the scan to the text column: $read")
    // Exactly one parquet scan NODE — no second corpus pass anywhere
    // (the AQE plan string prints each node in several sections, so
    // count distinct node ids, not substring hits).
    val scanIds = "Scan parquet\\s+\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(scanIds.size == 1, s"learn phase re-scans ($scanIds):\n$p")
  }

  test("t19 apply phase: one codegen'd projection, zero exchange, at a production k") {
    // The learned table rides as a reference object inside ONE native
    // expression — plan size must not grow with k (the k-literal
    // fold it replaced did). 512 synthetic rules ≫ battery's k.
    val rules = (1 to 512).map(i => (s"x$i", s"y$i"))
    val docs = graft.Tables.t(spark, dir, "documents")
    val p = plan(TextOps.bpeApplyMergesOn(docs, rules))
    assert(!p.contains("Exchange"), s"t19 apply shuffles:\n$p")
    assert(p.contains("bpe_doc_tokens"), s"t19 apply not the native expression:\n$p")
    assert(p.length < 5000, s"plan grew with k (${p.length} chars):\n${p.take(2000)}")
  }

  test("d5 census tier: window rides the pair join's bucket shuffle — ≤2 exchanges") {
    // The census cap MUST NOT add shuffles: a separate census
    // aggregate + tag join measured 3× (0.35 → 1.03 s at sf0.1).
    // Expected shape: one hash exchange for the a-side window (the
    // same bucket partitioning the join keys on) and at most one for
    // the b side (AQE may broadcast it instead at small scale).
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val p = plan(Dedup.embeddingDupOn(emb, 0.4))
    assert(!p.contains("CartesianProduct"), s"d5 cross product:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"d5 census tier added shuffles ($shuffles):\n$p")
  }

  test("d10 census tier: window rides the pair join's cell shuffle — ≤2 exchanges") {
    val p = plan(Similarity.semanticDedup(spark, dir, 0.2))
    assert(!p.contains("CartesianProduct"), s"d10 cross product:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"d10 census tier added shuffles ($shuffles):\n$p")
  }
}
