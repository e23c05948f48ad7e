package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary columns stay binary, metadata structs
  * stay consistent with content, the typed mapPartitions codec path
  * produces the documented features, and frame sampling is exact. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  test("media table carries binary content + typed metadata struct") {
    val df = Multimodal.mediaTable(spark, dir)
    val schema = df.schema
    assert(schema("content").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSet == Set("n_bytes", "image", "sample_rate", "n_frames"))
    val r = df.filter(col("media_type") === "video").limit(1)
      .select(col("meta.n_bytes"), octet_length(col("content"))).collect()(0)
    assert(r.get(0) == r.get(1)) // meta agrees with content
  }

  test("decode stub: normalized histogram, 16 bins") {
    val h = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(h.length == 16)
    assert(math.abs(h.sum - 1.0) < 1e-9)
    // 'h'(0x68),'e'(0x65),'l','l','o'… all in bin 6 or 7 except space (0x20 → bin 2)
    assert(h(2) > 0 && h(6) > 0)
  }

  test("typed mapPartitions features match a direct computation") {
    val row = Multimodal.m3Features(spark, dir)
      .filter(col("doc_id") === 0).collect()(0)
    val content = Multimodal.mediaTable(spark, dir)
      .filter(col("doc_id") === 0).select(col("content"))
      .collect()(0).getAs[Array[Byte]](0)
    val expect = Multimodal.decodeStub(content)
    assert(row.n_bytes == content.length.toLong)
    assert(row.histogram.toSeq == expect.toSeq)
    assert(row.entropy_q > 0 && row.entropy_q <= 4000) // ≤ log2(16) bits
  }

  test("frame sampling keeps every k-th frame with exact checksums") {
    // longest video in the corpus (sf0.001 docs are short — none may
    // reach a second sampled frame, so assert on what exists)
    val probe = Multimodal.mediaTable(spark, dir)
      .filter(col("media_type") === "video" && col("meta.n_frames") >= 1)
      .orderBy(col("meta.n_frames").desc, col("doc_id")).limit(1)
      .select(col("doc_id"), col("content"), col("meta.n_frames")).collect()(0)
    val docId = probe.getLong(0)
    val bytes = probe.getAs[Array[Byte]](1)
    val nFrames = probe.getLong(2)
    val rows = Multimodal.m2FrameSample(spark, dir)
      .filter(col("doc_id") === docId)
      .orderBy(col("sample_idx")).collect()
    val expectCount = math.ceil(nFrames.toDouble / Multimodal.SampleEvery).toLong
    assert(rows.length.toLong == expectCount)
    // frame_md5 = md5 over the uppercase-hex rendering of the frame
    def md5OfHex(b: Array[Byte]): String = {
      val hx = b.map("%02X".format(_)).mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = bytes.slice(i * Multimodal.SampleEvery * Multimodal.FrameSize,
        i * Multimodal.SampleEvery * Multimodal.FrameSize + Multimodal.FrameSize)
      assert(r.getAs[String]("frame_md5") == md5OfHex(frame),
        s"frame $i checksum mismatch")
    }
  }

  test("resize stub updates content and metadata in lockstep") {
    val r = Multimodal.resizeStub(spark, dir, targetBytes = 512)
      .select(octet_length(col("content")), col("meta.n_bytes")).collect()
    assert(r.nonEmpty)
    assert(r.forall(row => row.getInt(0) == 512 && row.getInt(1) == 512))
  }

  test("resize stub content is the exact cyclic tiling of the source bytes") {
    val src = Multimodal.mediaTable(spark, dir)
      .filter(col("media_type") === "image")
      .select(col("doc_id"), col("content")).limit(3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = Multimodal.resizeStub(spark, dir, targetBytes = 100)
      .filter(col("doc_id").isin(src.keys.toSeq: _*))
      .select(col("doc_id"), col("content"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    src.foreach { case (id, bytes) =>
      val expected = Array.tabulate[Byte](100)(i =>
        if (bytes.isEmpty) 0 else bytes(i % bytes.length))
      assert(java.util.Arrays.equals(got(id), expected), s"doc $id tiling mismatch")
    }
  }

  test("m5 blockhash: known values, span math, and hash stability") {
    import Multimodal.{blockHash, PHashBits}
    // uniform payload: no span's mean strictly exceeds the global mean
    assert(blockHash(Array.fill(120)(42.toByte)) == 0L)
    assert(blockHash(Array.emptyByteArray) == 0L)
    // strictly ascending bytes: exactly the upper spans set their bit
    val asc = blockHash(Array.tabulate(240)(_.toByte))
    assert(java.lang.Long.bitCount(asc) > 0 && asc >>> PHashBits == 0L,
      f"ascending hash out of range: $asc%x")
    // payloads shorter than the span count still hash (empty spans = 0 bit)
    val tiny = blockHash(Array[Byte](1, 9))
    assert(tiny >>> PHashBits == 0L)
    // bit b set iff span-b mean exceeds global mean — check against a
    // direct per-bit recomputation on a pseudo-random payload
    val rnd = Array.tabulate(333)(i => ((i * 2654435761L) % 251).toByte)
    val n = rnd.length
    val total = rnd.map(_ & 0xff).map(_.toLong).sum
    val expected = (0 until PHashBits).foldLeft(0L) { (acc, b) =>
      val lo = b * n / PHashBits; val hi = (b + 1) * n / PHashBits
      val s = (lo until hi).map(i => (rnd(i) & 0xff).toLong).sum
      if (hi > lo && s * n > total * (hi - lo)) acc | (1L << b) else acc
    }
    assert(blockHash(rnd) == expected)
  }

  test("m6 phash dups: exactly the band-sharing pairs within the radius") {
    // Brute-force arbitration in the driver (50 docs at sf0.001):
    // m6 must emit precisely the pairs that (a) share at least one
    // 15-bit band of their blockhash and (b) have popcount(xor) <=
    // the radius — banding loses only pairs sharing NO band.
    import Multimodal.{PhashBands, PhashBandBits}
    val maxH = 20
    val hashes = Multimodal.m5PerceptualHash(spark, dir)
      .select(col("doc_id"), col("phash")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val mask = (1L << PhashBandBits) - 1
    val expected = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      (ida, ha) = hashes(i); (idb, hb) = hashes(j)
      if (0 until PhashBands).exists(b =>
        ((ha >> (b * PhashBandBits)) & mask) == ((hb >> (b * PhashBandBits)) & mask))
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= maxH
    } yield (ida, idb, h.toLong)).toSet
    val got = Multimodal.phashDups(spark, dir, maxH).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"m6 mismatch: extra=${got -- expected} missing=${expected -- got}")
    // the guarantee the banding is built on: radius <= 3 is lossless
    // (any such pair differs in <= 3 of 4 bands, so one band matches)
    for ((ida, idb, _) <- expected if java.lang.Long.bitCount(
        hashes.find(_._1 == ida).get._2 ^ hashes.find(_._1 == idb).get._2) <= PhashBands - 1)
      assert(got.exists(p => p._1 == ida && p._2 == idb))
  }

  test("stored media table prunes content for metadata-only queries") {
    // The at-scale claim: once media lives in parquet, a query on
    // meta/doc_id must not read the (huge) content column chunks.
    val tmp = java.nio.file.Files.createTempDirectory("media_prune").toFile
    Multimodal.mediaTable(spark, dir).write.mode("overwrite")
      .parquet(s"$tmp/media")
    val scan = spark.read.parquet(s"$tmp/media")
      .select(col("doc_id"), col("media_type"), col("meta.n_bytes"))
    val physical = scan.queryExecution.executedPlan.toString
    val readSchema = physical.linesIterator
      .find(_.contains("ReadSchema")).getOrElse(physical)
    assert(!readSchema.contains("content"), s"content not pruned: $readSchema")
  }

  test("m8 silence core: crafted payloads segment exactly") {
    val W = Multimodal.EnergyWindow
    def bytes(vals: Int*): Array[Byte] =
      vals.flatMap(v => Array.fill(W)(v.toByte)).toArray
    // windows: 10,10,200,10,200 — global mean 86; lows at 1,2,4
    val (_, n, nw, nLow, nSeg, longest) =
      Multimodal.silenceStats(1L, bytes(10, 10, 200, 10, 200))
    assert(n == 5L * W && nw == 5 && nLow == 3 && nSeg == 2 && longest == 2)
    // uniform payload: no window strictly below the mean
    val u = Multimodal.silenceStats(2L, bytes(50, 50, 50))
    assert(u._4 == 0 && u._5 == 0 && u._6 == 0)
    // empty payload: zero windows, zero everything
    val e = Multimodal.silenceStats(3L, Array.emptyByteArray)
    assert(e == ((3L, 0L, 0L, 0L, 0L, 0L)))
    // ragged tail: 1.5 windows, low tail half
    val ragged = bytes(200) ++ Array.fill(W / 2)(10.toByte)
    val rg = Multimodal.silenceStats(4L, ragged)
    assert(rg._3 == 2 && rg._4 == 1 && rg._5 == 1 && rg._6 == 1)
  }

  test("m9 scene core: repeats, alternations, ragged tails") {
    val F = Multimodal.FrameSize
    def frames(vals: Int*): Array[Byte] =
      vals.flatMap(v => Array.fill(F)(v.toByte)).toArray
    // static clip: 4 identical frames, zero changes
    assert(Multimodal.sceneStats(1L, frames(7, 7, 7, 7)) == ((1L, 4L, 0L, 0L)))
    // cut on every boundary: 3 changes over 3 transitions = 1e6 ppm
    assert(Multimodal.sceneStats(2L, frames(1, 2, 3, 4)) == ((2L, 4L, 3L, 1000000L)))
    // one cut in the middle: 1/3 transitions
    assert(Multimodal.sceneStats(3L, frames(5, 5, 9, 9)) == ((3L, 4L, 1L, 333333L)))
    // ragged tail bytes are ignored; single frame has no transitions
    val ragged = frames(8) ++ Array.fill(F / 2)(1.toByte)
    assert(Multimodal.sceneStats(4L, ragged) == ((4L, 1L, 0L, 0L)))
    assert(Multimodal.sceneStats(5L, Array.emptyByteArray) == ((5L, 0L, 0L, 0L)))
  }
}
