package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video content carried as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample stages a
  * training-data pipeline runs over them. The reference has no media
  * support (north-star extension surface).
  *
  * Codec reality: this container has no image/audio libraries, so the
  * *codec* step is a clearly-marked deterministic stand-in
  * ([[decodeStub]] — byte histogram instead of pixel decode). What IS
  * real, and what this module is for, is the Spark-side plumbing that
  * survives 100 TB:
  *  - content stays an opaque `BinaryType` column end-to-end — never
  *    stringified, never collected;
  *  - metadata is a typed struct column, so pruning works (a query on
  *    `meta.width` must not fetch `content` — the struct lives in its
  *    own parquet column chunk);
  *  - per-partition batch processing via typed `mapPartitions` — the
  *    same iterator shape a real decoder (or GPU batch) plugs into,
  *    with batch size bounded by partition size, not dataset size;
  *  - frame sampling is a narrow transform (no shuffle): each row
  *    yields its k-sampled frames via `posexplode`.
  *
  * The synthetic media corpus derives deterministically from the
  * `documents` table (UTF-8 bytes as content), so every stage is
  * reproducible and the DuckDB oracle can verify the structural
  * outputs (lengths, frame counts, checksums).
  */
object Multimodal {

  /** Bytes per synthetic video "frame". */
  val FrameSize = 256
  /** Keep every k-th frame when sampling. */
  val SampleEvery = 4

  /** Typed row for the batch-processing path. */
  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, entropy_q: Long, histogram: Array[Double])

  /** Synthetic media table from `documents`: content = UTF-8 bytes,
    * media_type assigned round-robin by doc_id, metadata struct
    * derived from the content (the shape a real ingest would parse
    * from codec headers). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("meta", struct(
        octet_length(col("content")).as("n_bytes"),
        when(col("media_type") === "image",
          struct(lit(64).as("width"), lit(48).as("height")))
          .otherwise(struct(lit(0).as("width"), lit(0).as("height"))).as("image"),
        when(col("media_type") === "audio", lit(16000)).otherwise(lit(0)).as("sample_rate"),
        when(col("media_type") === "video",
          floor(octet_length(col("content")) / FrameSize)).otherwise(lit(0L)).as("n_frames")))

  /** Structural summary — the oracle-checkable stage: metadata fields
    * and frame-sampling arithmetic, content untouched (and pruned away
    * by Catalyst: only `meta`/`doc_id` are read). */
  def m1MediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      col("media_type"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames"),
      // frames kept when sampling every SampleEvery-th frame
      when(col("media_type") === "video",
        ceil(col("meta.n_frames") / lit(SampleEvery.toDouble)))
        .otherwise(lit(0L)).cast("long").as("n_sampled"))

  def m1OracleSql: String =
    s"""SELECT doc_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INTEGER) AS sample_rate,
       |  CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) // $FrameSize ELSE 0 END AS BIGINT) AS n_frames,
       |  CAST(CASE WHEN doc_id % 3 = 2
       |    THEN CAST(ceil((octet_length(encode(text)) // $FrameSize) / $SampleEvery.0) AS BIGINT)
       |    ELSE 0 END AS BIGINT) AS n_sampled
       |FROM documents""".stripMargin

  /** Frame sampling as a narrow transform: split video content into
    * FrameSize-byte frames, keep every SampleEvery-th, emit one row
    * per kept frame with its checksum. Zero shuffle — `posexplode` of
    * a per-row computed array; at 100 TB this is map-only work. */
  def m2FrameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      // n_frames >= 1 guard matters: sequence(0, -1) in Spark yields a
      // DESCENDING [0, -1], not empty — zero-frame docs would emit
      // phantom frames.
      .filter(col("media_type") === "video" && col("meta.n_frames") >= 1)
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"),
        posexplode(expr(
          s"""transform(
             |  filter(sequence(0, int(meta.n_frames) - 1), i -> i % $SampleEvery = 0),
             |  i -> substring(content, i * $FrameSize + 1, $FrameSize))""".stripMargin)))
      .select(col("doc_id"), col("pos").as("sample_idx"),
        // checksum over the hex encoding: DuckDB's md5 only accepts
        // VARCHAR, and hex is identical on both sides (uppercase)
        md5(hex(col("col"))).as("frame_md5"),
        octet_length(col("col")).as("frame_bytes"))

  def m2OracleSql: String =
    s"""WITH v AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) // $FrameSize AS n_frames
       |  FROM documents WHERE doc_id % 3 = 2),
       |idx AS (
       |  SELECT doc_id, hx, i, CAST(i // $SampleEvery AS INTEGER) AS sample_idx
       |  FROM (SELECT doc_id, hx, unnest(range(0, n_frames)) AS i FROM v WHERE n_frames >= 1)
       |  WHERE i % $SampleEvery = 0)
       |SELECT doc_id, sample_idx,
       |  md5(substring(hx, CAST(i * ${2 * FrameSize} + 1 AS INTEGER), ${2 * FrameSize})) AS frame_md5,
       |  CAST($FrameSize AS INTEGER) AS frame_bytes
       |FROM idx""".stripMargin

  /** STUB CODEC — deterministic stand-in for image/audio decode (no
    * media libraries in this container). Produces a normalized
    * 16-bin byte histogram; a real deployment swaps this body for
    * e.g. a JNI decoder, keeping the signature Array[Byte] →
    * Array[Double]. */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xFF) >> 4) += 1.0
      i += 1
    }
    val n = math.max(1, content.length).toDouble
    hist.map(_ / n)
  }

  /** Shannon entropy of the histogram, quantized to integer
    * millibits — stable across platforms for oracle-free checks. */
  private def entropyQ(hist: Array[Double]): Long = {
    val h = -hist.filter(_ > 0).map(p => p * math.log(p) / math.log(2)).sum
    math.round(h * 1000)
  }

  /** Batch feature extraction through the typed `mapPartitions` path:
    * one iterator per partition (the real-decoder batch shape —
    * partition size bounds memory, a GPU codec would consume the same
    * iterator). Returns a typed Dataset so downstream ops keep the
    * schema. */
  def m3Features(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map { r =>
          val hist = decodeStub(r.content)
          MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong,
            entropyQ(hist), hist)
        }
      }
  }

  /** m5 blockhash geometry: 60 bits (bit b of a signed 64-bit shift
    * would overflow at b = 63, and both engines must agree exactly). */
  val PHashBits = 60

  /** m5: PERCEPTUAL HASH over the binary content — the blockhash
    * algorithm (split the payload into [[PHashBits]] equal spans; bit
    * b = "span b's mean byte value exceeds the global mean"), the
    * image-dedup fingerprint a crawl pipeline computes during decode.
    * Runs through the same typed mapPartitions codec path as m3 (a
    * real deployment hashes decoded pixel blocks in the same
    * iterator). All-INTEGER arithmetic — the mean comparison is
    * cross-multiplied (span_sum × n > total × span_len) — so, unlike
    * m3's FP entropy, every value is DuckDB-replayable: this is the
    * m-series' first fully oracle-hashed operator. (The oracle
    * replays bytes through character codes, valid because the corpus
    * is pure ASCII — checked: octet_length(encode(text)) = length(text)
    * for every row at every SF.) */
  def m5PerceptualHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.map(r => (r.doc_id, blockHash(r.content), r.content.length.toLong)))
      .toDF("doc_id", "phash", "n_bytes")
  }

  /** The m5 codec core: 60-bit blockhash of a byte payload. */
  private[operators] def blockHash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var total = 0L
    var i = 0
    while (i < n) { total += bytes(i) & 0xff; i += 1 }
    var h = 0L
    var b = 0
    while (b < PHashBits) {
      val lo = b * n / PHashBits
      val hi = (b + 1) * n / PHashBits
      var s = 0L
      i = lo
      while (i < hi) { s += bytes(i) & 0xff; i += 1 }
      // 128-bit cross-multiplied mean comparison: s*n and total*(hi-lo)
      // overflow signed 64-bit once the payload passes ~1.4 GB
      // (255·n²/60 > 2^63), which would silently corrupt hash bits at
      // the sizes the 100 TB media framing implies. Both products are
      // non-negative, so (high word, unsigned low word) compares exactly.
      if (hi > lo && cmp128(s, n.toLong, total, (hi - lo).toLong) > 0) h |= 1L << b
      b += 1
    }
    h
  }

  /** Exact comparison of a*b vs c*d for non-negative longs. */
  private def cmp128(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  def m5OracleSql: String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |b AS (SELECT doc_id, n, text,
       |  list_sum(list_transform(range(1, n + 1),
       |    i -> ascii(substr(text, CAST(i AS INT), 1)))) AS total FROM d)
       |SELECT doc_id,
       |  CAST(coalesce(list_sum(list_transform(range($PHashBits), blk ->
       |    CASE WHEN n * list_sum(list_transform(
       |          range(blk * n // $PHashBits + 1, (blk + 1) * n // $PHashBits + 1),
       |          i -> ascii(substr(text, CAST(i AS INT), 1)))) >
       |        total * ((blk + 1) * n // $PHashBits - blk * n // $PHashBits)
       |    THEN (CAST(1 AS BIGINT) << blk) ELSE 0 END)), 0) AS BIGINT) AS phash,
       |  CAST(n AS BIGINT) AS n_bytes
       |FROM b""".stripMargin

  /** m7: cross-video repeated-FRAME detection — frame-level exact
    * dedup (the video analogue of d1: find boilerplate frames —
    * intros, slates, black frames — shared across videos or repeated
    * within one). Every FrameSize-byte frame is fingerprinted and
    * the digests grouped: the output is the full frame-fingerprint
    * inventory (occurrences, distinct videos, first doc), whose
    * n_occurrences > 1 subset is the dup report — the d1 convention
    * that keeps the oracle check non-vacuous on a corpus with no
    * repeats. The shuffle carries 32-byte digests, never frame
    * bytes; the explode is narrow. */
  def m7FrameDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("media_type") === "video" && col("meta.n_frames") >= 1)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, int(meta.n_frames) - 1),
           |  i -> substring(content, i * $FrameSize + 1, $FrameSize))""".stripMargin)).as("frame"))
      .select(col("doc_id"), md5(hex(col("frame"))).as("frame_md5"))
      .groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_videos"),
        min(col("doc_id")).as("first_doc"))

  def m7OracleSql: String =
    s"""WITH v AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) // $FrameSize AS n_frames
       |  FROM documents WHERE doc_id % 3 = 2),
       |fr AS (
       |  SELECT doc_id,
       |    md5(substr(hx, CAST(i * 2 * $FrameSize + 1 AS INT), ${2 * FrameSize})) AS frame_md5
       |  FROM (SELECT doc_id, hx, unnest(range(0, n_frames)) AS i
       |        FROM v WHERE n_frames >= 1))
       |SELECT frame_md5,
       |  count(*) AS n_occurrences,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
       |  CAST(min(doc_id) AS BIGINT) AS first_doc
       |FROM fr GROUP BY frame_md5""".stripMargin

  /** m6: perceptual NEAR-DUPLICATE detection over binary media — the
    * image-dedup tier of a multimodal pipeline (the LAION recipe:
    * perceptual hash, then hamming-ball grouping), composed from m5's
    * blockhash and d3's banded-LSH machinery. The 60-bit hash splits
    * into 4 bands × 15 bits: by pigeonhole, any pair within hamming
    * distance 3 shares at least one exact band, so banding is a
    * LOSSLESS candidate generator at that radius and a recall-tuned
    * one beyond. Candidates pair only inside band buckets (one
    * shuffle on the 15-bit band key, Σ n_b² work, never n²; buckets
    * past the d3 cap drop whole — byte-identical payloads that d1
    * already collapses), then exact popcount(xor) verifies. The
    * corpus-wide threshold here is tuned to the synthetic corpus'
    * hash distribution (min observed distance 10); real imagery
    * uses 3–6. */
  val PhashBands = 4
  val PhashBandBits: Int = PHashBits / PhashBands // 15

  def phashDups(spark: SparkSession, dir: String, maxHamming: Int = 20,
                maxBucket: Int = Dedup.MaxBandBucket): DataFrame = {
    val mask = (1L << PhashBandBits) - 1
    val bands = m5PerceptualHash(spark, dir)
      .select(col("doc_id"), col("phash"),
        explode(array((0 until PhashBands).map { b =>
          struct(lit(b).as("band_id"),
            shiftright(col("phash"), b * PhashBandBits)
              .bitwiseAND(mask).as("band_key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("phash"), col("bk.band_id"), col("bk.band_key"))
    bands
      .groupBy(col("band_id"), col("band_key"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("phash")))).as("ms"))
      .filter(size(col("ms")) > 1 && size(col("ms")) <= maxBucket)
      // all (i < j) pairs inside the bucket; ms sorted by doc_id so
      // id_a < id_b by construction (the d3 pair-generation shape)
      .select(explode(expr(
        """flatten(transform(ms, (a, i) ->
          |  transform(slice(ms, i + 2, size(ms) - i - 1), b ->
          |    named_struct('id_a', a.doc_id, 'id_b', b.doc_id,
          |      'hamming', bit_count(a.phash ^ b.phash)))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.hamming").cast("long").as("hamming"))
      .distinct() // a pair sharing k bands appears k times, same hamming
      .filter(col("hamming") <= maxHamming)
  }

  def phashDupsOracleSql(maxHamming: Int, maxBucket: Int): String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |b0 AS (SELECT doc_id, n, text,
       |  list_sum(list_transform(range(1, n + 1),
       |    i -> ascii(substr(text, CAST(i AS INT), 1)))) AS total FROM d),
       |ph AS (SELECT doc_id,
       |  CAST(coalesce(list_sum(list_transform(range($PHashBits), blk ->
       |    CASE WHEN n * list_sum(list_transform(
       |          range(blk * n // $PHashBits + 1, (blk + 1) * n // $PHashBits + 1),
       |          i -> ascii(substr(text, CAST(i AS INT), 1)))) >
       |        total * ((blk + 1) * n // $PHashBits - blk * n // $PHashBits)
       |    THEN (CAST(1 AS BIGINT) << blk) ELSE 0 END)), 0) AS BIGINT) AS phash
       |  FROM b0),
       |bands AS (
       |  SELECT doc_id, phash, b,
       |    (phash >> (b * $PhashBandBits)) & ${(1L << PhashBandBits) - 1} AS bv
       |  FROM ph, range($PhashBands) t(b)),
       |buck AS (
       |  SELECT b, bv FROM bands GROUP BY b, bv
       |  HAVING count(*) > 1 AND count(*) <= $maxBucket),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
       |    CAST(bit_count(xor(a.phash, c.phash)) AS BIGINT) AS hamming
       |  FROM bands a
       |  JOIN bands c ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
       |  JOIN buck k ON a.b = k.b AND a.bv = k.bv)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= $maxHamming""".stripMargin

  /** m3 as a DataFrame battery entry (histogram dropped: entropy is
    * the scalar summary; the full vector is exercised in the spec). */
  def m3FeatureSummary(spark: SparkSession, dir: String): DataFrame =
    m3Features(spark, dir).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("entropy_q"))

  /** "Resize" stub for image content through the typed batch path
    * (where a real resampler runs): cycle bytes to the exact target
    * size, metadata rebuilt in lockstep — content AND meta must
    * change together. */
  def resizeStub(spark: SparkSession, dir: String, targetBytes: Int = 1024): DataFrame = {
    import spark.implicits._
    val resized = mediaTable(spark, dir)
      .filter(col("media_type") === "image")
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val out = new Array[Byte](targetBytes)
        var i = 0
        while (i < targetBytes) {
          out(i) = if (r.content.isEmpty) 0 else r.content(i % r.content.length)
          i += 1
        }
        r.copy(content = out)
      })
    resized.toDF().withColumn("meta", struct(
      lit(targetBytes).as("n_bytes"),
      struct(lit(32).as("width"), lit(32).as("height")).as("image"),
      lit(0).as("sample_rate"), lit(0L).as("n_frames")))
  }

  // ---------------------------------------------------------------- m8

  /** m8 window width in bytes (one "audio frame" of samples). */
  val EnergyWindow = 64

  /** m8: ENERGY-BASED SILENCE SEGMENTATION over audio content — the
    * VAD / silence-trimming stage an audio pipeline runs before
    * transcription or chunking. The payload is cut into fixed
    * [[EnergyWindow]]-byte windows; a window is "low-energy" when its
    * byte sum falls strictly below the payload's global mean rate
    * (cross-multiplied integer comparison — no float, exact for
    * payloads to ~2^49 bytes at this window size); maximal runs of
    * low windows are the "silence" segments (gaps-and-islands,
    * computed row-locally). Output per audio row: window/low counts,
    * segment count, and the longest silence run — the four numbers a
    * trim/chunk policy consumes.
    *
    * Plan shape: narrow typed `mapPartitions` over (doc_id, content)
    * — the same per-partition codec seam as m3/m5, where a real DSP
    * (RMS over PCM samples) plugs in; zero shuffle, zero collect,
    * embarrassingly parallel at 100 TB. The DuckDB oracle replays
    * the exact integer arithmetic over the characters. */
  def m8SilenceSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.map(r => silenceStats(r.doc_id, r.content)))
      .toDF("doc_id", "n_bytes", "n_windows", "n_low", "n_segments", "longest_low")
  }

  /** The m8 DSP core: (n_bytes, n_windows, n_low, n_segments,
    * longest_low) for one payload. */
  private[operators] def silenceStats(docId: Long, bytes: Array[Byte])
      : (Long, Long, Long, Long, Long, Long) = {
    val n = bytes.length
    var total = 0L
    var i = 0
    while (i < n) { total += bytes(i) & 0xff; i += 1 }
    val nw = (n + EnergyWindow - 1) / EnergyWindow
    var nLow = 0L; var nSeg = 0L; var longest = 0L
    var run = 0L
    var w = 0
    while (w < nw) {
      val lo = w * EnergyWindow
      val hi = math.min(lo + EnergyWindow, n)
      var s = 0L
      i = lo
      while (i < hi) { s += bytes(i) & 0xff; i += 1 }
      // low ⇔ window mean < global mean: s/(hi-lo) < total/n
      val low = s * n < total * (hi - lo)
      if (low) {
        nLow += 1; run += 1
        if (run == 1) nSeg += 1
        if (run > longest) longest = run
      } else run = 0
      w += 1
    }
    (docId, n.toLong, nw.toLong, nLow, nSeg, longest)
  }

  /** m9: SCENE-CHANGE detection over video content — the shot-
    * boundary count a video pipeline uses to pick keyframes and
    * split clips. A "scene change" here is any adjacent pair of
    * [[FrameSize]]-byte frames whose bytes differ (a real detector
    * thresholds a pixel-histogram distance; the comparison seam and
    * the plan are identical). Row-local in the m3/m5/m8 typed codec
    * seam — zero shuffle, and only (doc_id, 3 longs) leave the map.
    * Tail bytes short of a full frame are ignored, matching m1's
    * floor(n/FrameSize) frame count. */
  def m9SceneChanges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.map(r => sceneStats(r.doc_id, r.content)))
      .toDF("doc_id", "n_frames", "n_scene_changes", "change_ppm")
  }

  /** The m9 detector core: (n_frames, n_scene_changes, change_ppm)
    * for one payload. */
  private[operators] def sceneStats(docId: Long, bytes: Array[Byte])
      : (Long, Long, Long, Long) = {
    val nf = bytes.length / FrameSize
    var changes = 0L
    var f = 1
    while (f < nf) {
      var i = 0
      var same = true
      while (same && i < FrameSize) {
        if (bytes((f - 1) * FrameSize + i) != bytes(f * FrameSize + i)) same = false
        i += 1
      }
      if (!same) changes += 1
      f += 1
    }
    (docId, nf.toLong, changes, if (nf > 1) changes * 1000000L / (nf - 1) else 0L)
  }

  def m9OracleSql: String = {
    val F = FrameSize
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) // $F AS nf
       |  FROM documents WHERE doc_id % 3 = 2),
       |c AS (
       |  SELECT doc_id, nf,
       |    CAST(coalesce(list_sum(list_transform(range(2, nf + 1), f ->
       |      CASE WHEN substr(text, (f - 2) * $F + 1, $F) <> substr(text, (f - 1) * $F + 1, $F)
       |        THEN 1 ELSE 0 END)), 0) AS BIGINT) AS changes
       |  FROM d)
       |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
       |  changes AS n_scene_changes,
       |  CAST(CASE WHEN nf > 1 THEN changes * 1000000 // (nf - 1) ELSE 0 END AS BIGINT)
       |    AS change_ppm
       |FROM c""".stripMargin
  }

  def m8OracleSql: String = {
    val W = EnergyWindow
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id % 3 = 1),
       |tot AS (
       |  SELECT doc_id, text, n,
       |    list_sum(list_transform(range(1, n + 1),
       |      i -> ascii(substr(text, CAST(i AS INT), 1)))) AS total,
       |    (n + $W - 1) // $W AS nw
       |  FROM d),
       |win AS (
       |  SELECT doc_id, n, nw,
       |    list_transform(range(1, nw + 1), wi ->
       |      CASE WHEN n * list_sum(list_transform(
       |            range((wi - 1) * $W + 1, least(wi * $W, n) + 1),
       |            i -> ascii(substr(text, CAST(i AS INT), 1))))
       |          < total * (least(wi * $W, n) - (wi - 1) * $W)
       |        THEN 1 ELSE 0 END) AS low
       |  FROM tot)
       |SELECT doc_id,
       |  CAST(n AS BIGINT) AS n_bytes,
       |  CAST(nw AS BIGINT) AS n_windows,
       |  CAST(coalesce(list_sum(low), 0) AS BIGINT) AS n_low,
       |  CAST(coalesce(list_sum(list_transform(range(1, nw + 1), i ->
       |    CASE WHEN low[i] = 1 AND (i = 1 OR low[i - 1] = 0)
       |      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_segments,
       |  CAST(coalesce(list_max(list_transform(
       |    list_filter(range(1, nw + 1), i ->
       |      low[i] = 1 AND (i = nw OR low[i + 1] = 0)),
       |    e -> e - coalesce(list_max(list_filter(range(1, nw + 1),
       |      j -> j < e AND low[j] = 0)), 0))), 0) AS BIGINT) AS longest_low
       |FROM win""".stripMargin
  }
}
