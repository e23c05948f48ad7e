package graft.streaming

import graft.Tables.t
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of d7 incremental ingest dedup: classify a STREAM
  * of new documents against the standing corpus — exact / near /
  * unique — without re-deduping the corpus.
  *
  * Shape: the corpus side is STATIC and computed once (content
  * fingerprints + MinHash band index); each micro-batch of new
  * documents computes its signature NARROWLY per row
  * ([[Dedup.sigExpr]] — no explode, no groupBy, so the stream stays
  * stateless), stream-static-joins the fingerprint table (exact) and
  * the band index (near candidates, est-sim filtered), and one
  * flatMapGroupsWithState keyed by doc_id folds a doc's candidate
  * rows into its classification. State remembers classified doc ids,
  * so a doc re-arriving in a later batch is not re-emitted —
  * at-most-once classification per document.
  *
  * At scale: the per-batch join cost is bounded by the batch's band
  * matches (bucket-sized, never corpus-sized — store the band index
  * bucketed/partitioned by band_key so each micro-batch prunes to
  * the keys it probes); per-group state is one boolean per seen doc.
  * The batch cap ([[Dedup.MaxBandBucket]]) is a full-corpus
  * degenerate-bucket guard and does not apply per batch; the
  * streaming spec proves set-equality against the UNCAPPED batch
  * classification. */
object DedupStream {

  /** The standing corpus's static index: (fingerprints, band rows).
    * Built once per ingest deployment; here derived inline from the
    * old-source documents. */
  private[streaming] def corpusIndex(spark: SparkSession, dir: String,
                                     newSource: String): (DataFrame, DataFrame) = {
    val old = t(spark, dir, "documents")
      .filter(col("source") =!= newSource)
      .select(col("doc_id"), col("text"))
    val fps = old.select(md5(col("text")).as("fp"), col("doc_id").as("old_id"))
    val bands = old
      .select(col("doc_id").as("old_id"), Dedup.sigExpr(col("text")).as("osig"))
      .filter(col("osig").isNotNull)
      .select(col("old_id"), col("osig"), explode(array(
        (0 until Dedup.NumHashes / 2).map { b =>
          struct(lit(b).as("band_id"),
            concat_ws(":", col("osig").getItem(2 * b), col("osig").getItem(2 * b + 1))
              .as("band_key"))
        }: _*)).as("bk"))
      .select(col("old_id"), col("osig"), col("bk.band_id"), col("bk.band_key"))
    // A stream-static join re-evaluates the STATIC side's plan every
    // micro-batch, so without a persist each arriving batch re-hashes
    // the whole standing corpus — the sf1 streaming rung measured the
    // classify pipeline 4x slower from exactly this. The index is the
    // deployment's standing state: compute once, keep on local disk
    // (DISK_ONLY, not memory — corpus-sized state never squats the
    // unified pool; a lost block recomputes from lineage). It lives
    // for the ingest app's lifetime, so nothing unpersists it.
    val fpsP = fps.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val bandsP = bands.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // Materialize NOW, not on first use: a lazy persist lands the
    // whole corpus-index build inside micro-batch 0's addBatch — the
    // sf1 rung measured it as a 6.7 s p95 against a 1.0 s steady
    // state. A deployment builds its standing index before opening
    // the ingest tap; do the same.
    fpsP.count(); bandsP.count()
    (fpsP, bandsP)
  }

  /** `newDocs` is a STREAMING frame of (doc_id, text, ...) rows from
    * the new source. Output: one row per first-seen doc —
    * (doc_id, exact_match, n_near, best_near, status) — d7's exact
    * schema and semantics (min-id exact match, distinct near
    * neighbors, exact-beats-near precedence). */
  def streamingIncrementalDedup(spark: SparkSession, dir: String, newDocs: DataFrame,
                                newSource: String = "src19",
                                minEstSim: Double = 0.25): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val (fps, bands) = corpusIndex(spark, dir, newSource)
    val s = newDocs.select(col("doc_id"), md5(col("text")).as("fp"),
      Dedup.sigExpr(col("text")).as("sig"))
    // kind 0 = exact candidate, 1 = near candidate, 2 = the doc itself
    // (ensures docs with no candidates still classify as 'unique')
    val exact = s.join(fps, "fp")
      .select(col("doc_id"), col("old_id"), lit(0).as("kind"))
    val nEq = aggregate(
      zip_with(col("sig"), col("osig"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val near = s.filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"), explode(array(
        (0 until Dedup.NumHashes / 2).map { b =>
          struct(lit(b).as("band_id"),
            concat_ws(":", col("sig").getItem(2 * b), col("sig").getItem(2 * b + 1))
              .as("band_key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band_id"), col("bk.band_key"))
      .join(bands, Seq("band_id", "band_key"))
      .filter((nEq.cast("double") / Dedup.NumHashes) >= minEstSim)
      .select(col("doc_id"), col("old_id"), lit(1).as("kind"))
    val self = s.select(col("doc_id"), lit(null).cast("long").as("old_id"),
      lit(2).as("kind"))
    exact.unionByName(near).unionByName(self)
      .as[(Long, Option[Long], Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Option[Long], Long, Option[Long], String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (docId, rows, state) =>
          if (state.exists) Iterator.empty // already classified
          else {
            state.update(true)
            val rs = rows.toSeq
            val exactMatch = rs.filter(_._3 == 0).flatMap(_._2).minOption
            val nears = rs.filter(_._3 == 1).flatMap(_._2).distinct
            val status =
              if (exactMatch.isDefined) "exact"
              else if (nears.nonEmpty) "near" else "unique"
            Iterator.single(
              (docId, exactMatch, nears.length.toLong, nears.minOption, status))
          }
      }
      .toDF("doc_id", "exact_match", "n_near", "best_near", "status")
  }

  /** Streaming twin of d11 sub-document (span-level) dedup — the one
    * dedup family that had no streaming counterpart through round 11:
    * score each arriving document's spans against the STANDING
    * span-frequency index (same deployment shape as the d7 twin
    * above: the corpus index is static and built once; the stream
    * classifies at ingest).
    *
    * A span is boilerplate when its exact fingerprint appears in ≥2
    * distinct corpus documents — d11's definition, precomputed here
    * into a static (fp, is_dup) table. The stream side reuses
    * [[Dedup.spanFps]] VERBATIM (stateless narrow ops), left-joins
    * the index (stream-static equi-join, pruned to the batch's fp
    * keys), and folds each doc's span rows in one
    * flatMapGroupsWithState pass.
    *
    * Bounded state, documented: ONE boolean per classified doc_id
    * (first-seen guard — re-arrivals are not re-emitted), nothing
    * else; the span index lives in the static plan, not in state.
    * When the stream replays exactly the corpus the index was built
    * from, output is set-equal to batch d11 (StreamingSpec pins it);
    * all of a doc's spans travel in its own row, so the fold never
    * spans micro-batches. */
  /** Streaming twin of d13's span-level NEAR-dup tier — the last
    * dedup family without one (d1/d7/d11 gained twins in earlier
    * rounds; d13's MinHash-banded Jaccard tier had none): classify
    * each arriving document's spans against the STANDING distinct-
    * span-content index, exact AND near, at ingest.
    *
    * Same deployment shape as the twins above — the static side is
    * built once from [[Dedup.spanContents]] (the SAME derivation the
    * batch operator uses: capped holder sets, per-content signatures)
    * plus its band index restricted to live buckets (>1, ≤ cap — the
    * batch census discipline). The stream side derives span rows
    * narrowly (explode only — no stateful distinct), equi-joins the
    * content index on fp (stream-static), and probes the band index
    * with the indexed signature's band keys; candidates fold per doc
    * in ONE flatMapGroupsWithState pass that dedupes content pairs
    * (the batch `.distinct()` across bands) and drops self-matches.
    *
    * Probing through the index means a span content UNSEEN by the
    * standing corpus classifies as novel (no candidates) — the
    * replay contract: over-cap boilerplate contents are absent from
    * the index exactly as the batch operator drops them, so when the
    * stream replays the corpus the per-doc fold is set-equal to the
    * batch pair table aggregated per document (StreamingSpec).
    *
    * Bounded state, documented: ONE boolean per classified doc_id
    * (first-seen guard), nothing else — candidates arrive with the
    * doc's own rows, so the fold never spans micro-batches; the
    * content/band index lives in the static plan, not in state. */
  def streamingSpanNearDup(spark: SparkSession, dir: String, newDocs: DataFrame,
                           minEq: Int = Dedup.NumHashes / 2,
                           maxBucket: Int = Dedup.MaxBandBucket): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val nBands = Dedup.NumHashes / 2
    def bandsOf(sig: org.apache.spark.sql.Column) = explode(array(
      (0 until nBands).map { b =>
        struct(lit(b).as("band_id"),
          concat_ws(":", sig.getItem(2 * b), sig.getItem(2 * b + 1))
            .as("band_key"))
      }: _*))
    // STANDING index: distinct span contents + live-bucket band rows.
    // Persisted (disk tier): contents feeds BOTH the fp probe join
    // and the band index below, and an unpersisted static side of a
    // stream-static join is re-derived every micro-batch — the
    // corpus-wide span explode + groupBy + signatures would dominate
    // each batch (the round-15 sf1 rung measured exactly this
    // pathology on d7's index before its persist).
    val contents = Dedup.spanContents(
      t(spark, dir, "documents").select(col("doc_id"), col("text")), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val cBands = contents
      .select(col("fp").as("fp2"), col("sig").as("sig2"),
        col("docs").as("docs2"), bandsOf(col("sig")).as("bk"))
      .select(col("fp2"), col("sig2"), col("docs2"),
        col("bk.band_id"), col("bk.band_key"))
    val live = cBands.groupBy(col("band_id"), col("band_key"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucket)
      .select(col("band_id"), col("band_key"))
    // Standing index: persisted once (disk tier), same rationale as
    // corpusIndex — a stream-static join re-derives an unpersisted
    // static side every micro-batch.
    val bandIdx = cBands.join(live, Seq("band_id", "band_key"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    contents.count(); bandIdx.count() // eager build (see corpusIndex)
    // STREAM side: narrow span derivation (d13's unit rules), fp keys
    // probe the content index; the indexed signature (sig is a pure
    // function of content) feeds the band probe
    val w = Dedup.SpanWords
    val spans = newDocs
      .select(col("doc_id"), explode(split(col("text"), "\\n\\s*\\n")).as("para"))
      .select(col("doc_id"),
        filter(split(trim(col("para")), "\\s+"), x => length(x) > lit(0)).as("pws"))
      .filter(size(col("pws")) > 0)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), ceil(size(col("pws")) / lit(w.toDouble)).cast("int")),
        c => slice(col("pws"), (c - lit(1)) * w + lit(1), lit(w)))).as("ws"))
      .select(col("doc_id"), md5(concat_ws(" ", col("ws"))).as("fp"))
    val indexed = spans.join(contents, Seq("fp")) // inner: unseen = novel
    // kind 0 = exact (same content in a corpus doc), 1 = near
    // (banded content pair, ≥ minEq agreement), 2 = the doc itself
    val exact = indexed
      .select(col("doc_id"), col("fp"), lit(null).cast("string").as("fp2"),
        explode(col("docs")).as("old_id"), lit(0).as("kind"))
    val nEq = aggregate(
      zip_with(col("sig"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val near = indexed
      .select(col("doc_id"), col("fp"), col("sig"), bandsOf(col("sig")).as("bk"))
      .select(col("doc_id"), col("fp"), col("sig"),
        col("bk.band_id"), col("bk.band_key"))
      .join(bandIdx, Seq("band_id", "band_key"))
      .filter(col("fp2") =!= col("fp") && nEq >= minEq)
      .select(col("doc_id"), col("fp"), col("fp2"),
        explode(col("docs2")).as("old_id"), lit(1).as("kind"))
    val self = newDocs.select(col("doc_id"), lit(null).cast("string").as("fp"),
      lit(null).cast("string").as("fp2"), lit(null).cast("long").as("old_id"),
      lit(2).as("kind"))
    exact.unionByName(near).unionByName(self)
      .as[(Long, Option[String], Option[String], Option[Long], Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long, Option[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (docId, rows, state) =>
          if (state.exists) Iterator.empty // already classified
          else {
            state.update(true)
            val rs = rows.toSeq
            // exact tier: one hit per distinct (content, holder);
            // near tier: one hit per distinct (content pair, holder) —
            // the batch distinct() across bands, folded per doc
            val hits =
              rs.filter(r => r._5 == 0 && !r._4.contains(docId))
                .map(r => (r._2, r._3, r._4)).distinct ++
              rs.filter(r => r._5 == 1 && !r._4.contains(docId))
                .map(r => (r._2, r._3, r._4)).distinct
            val partners = hits.flatMap(_._3)
            Iterator.single((docId, partners.distinct.length.toLong,
              partners.length.toLong, partners.minOption))
          }
      }
      .toDF("doc_id", "n_near_docs", "n_near_spans", "best_near")
  }

  def streamingSpanScore(spark: SparkSession, dir: String,
                         newDocs: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val idx = Dedup.spanFps(
        t(spark, dir, "documents").select(col("doc_id"), col("text")))
      .groupBy(col("fp"))
      .agg((size(collect_set(col("doc_id"))) >= 2).as("is_dup"))
      // standing index — persisted once, same rationale as corpusIndex
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    idx.count() // eager build (see corpusIndex)
    Dedup.spanFps(newDocs)
      .join(idx, Seq("fp"), "left")
      .select(col("doc_id"), coalesce(col("is_dup"), lit(false)).as("dup"))
      .as[(Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (docId, rows, state) =>
          if (state.exists) Iterator.empty // already scored
          else {
            state.update(true)
            val rs = rows.toSeq
            val dups = rs.count(_._2).toLong
            Iterator.single(
              (docId, rs.size.toLong, dups, dups.toDouble / rs.size))
          }
      }
      .toDF("doc_id", "n_spans", "n_dup_spans", "dup_frac")
  }
}
