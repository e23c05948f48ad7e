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
    (fps, bands)
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
  def streamingSpanScore(spark: SparkSession, dir: String,
                         newDocs: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val idx = Dedup.spanFps(
        t(spark, dir, "documents").select(col("doc_id"), col("text")))
      .groupBy(col("fp"))
      .agg((size(collect_set(col("doc_id"))) >= 2).as("is_dup"))
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
