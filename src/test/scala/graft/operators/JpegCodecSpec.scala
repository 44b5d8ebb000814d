package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Third real codec through the [[Multimodal.FrameDecoder]] contract
  * (round 14, r13 verdict item 7): baseline JPEG via javax.imageio —
  * the LOSSY case PNG/GIF cannot exercise. The load-bearing claim is
  * the exactness argument on [[Multimodal.JpegFrameDecoder]]: at max
  * quality the JDK roundtrip's per-pixel luma error is a few counts,
  * while the planted two-tone patterns give [[Multimodal.averageHash64]]
  * a ~250-count margin per bucket — so the perceptual hash of the lossy
  * roundtrip is EXACTLY the analytic hash the DuckDB oracle computes.
  * This spec pins the exactness where it holds, AND the failure mode it
  * rests on (default quality breaks exactness on high-frequency
  * patterns — which is WHY `writeJpegMaxQuality` is part of the planted
  * corpus contract, not an optimization). */
class JpegCodecSpec extends SparkSpec {

  /** The mm_* planted 8×4 two-tone pattern for `seed`: pixel j white
    * iff bit j of the multiplicative mix is set, pixels 0/31 forced
    * black — identical arithmetic to Multimodal.drawPatternFrame. */
  private def pattern(seed: Long): BufferedImage = {
    val h = (seed & 1073741823L) * 2654435761L
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (j <- 0 until 32) {
      val white = j != 0 && j != 31 && ((h >> j) & 1L) == 1L
      img.setRGB(j % 8, j / 8, if (white) 0xFFFFFF else 0x000000)
    }
    img
  }

  /** The analytic aHash of the same pattern: white pixel j ⇒ hash bit
    * 2j+1 (32 pixels over 64 single-pixel odd buckets) — the DuckDB
    * oracle's integer arithmetic, reproduced independently. */
  private def analyticHash(seed: Long): Long = {
    val h = (seed & 1073741823L) * 2654435761L
    (1 until 31).foldLeft(0L) { (acc, j) =>
      if (((h >> j) & 1L) == 1L) acc | (1L << (2 * j + 1)) else acc
    }
  }

  private def jpegAt(img: BufferedImage, quality: Float): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close()
    } finally writer.dispose()
    bos.toByteArray
  }

  private def decodeHashes(payload: Array[Byte]): Seq[(Int, Long)] = {
    val dec = new Multimodal.JpegFrameDecoder
    dec.open()
    try dec.frames(payload).map { case (f, b) =>
      assert(b.length === 8 * 4 * 4, "frames normalize to packed ARGB")
      (f, Multimodal.averageHash64(b))
    }.toSeq
    finally dec.close()
  }

  test("JpegFrameDecoder: concatenated JPEGs decode to their frames through the contract") {
    import spark.implicits._
    val payload =
      jpegAt(pattern(101L), 1.0f) ++ jpegAt(pattern(202L), 1.0f) ++
      jpegAt(pattern(303L), 1.0f)
    val rows = Seq(MediaRow(1L, payload, "jpeg")).toDS.repartition(1)
    val out = Multimodal
      .sampleFramesWith(rows, new Multimodal.JpegFrameDecoder).collect()
    assert(out.length === 3, "all three concatenated JPEG frames must decode")
    assert(out.map(_.getInt(1)).sorted.sameElements(Array(0, 1, 2)))
    assert(out.forall(_.getAs[Array[Byte]]("frame").length === 8 * 4 * 4))
  }

  test("marker payloads containing the SOI magic do not split a frame (segment walk, r14 advice)") {
    // Splice a COM segment whose PAYLOAD is the literal bytes FF D8 FF
    // right after each frame's SOI — legal per T.81 (marker payloads
    // are opaque), produced in the wild by EXIF thumbnails / ICC
    // blobs. A naive magic scan sees 4 SOIs in this 2-frame payload
    // and mis-splits (the catch-and-skip discipline then silently
    // drops frames); the segment walk skips the payload by its
    // declared length and finds exactly 2 frames.
    def withComSoi(jpeg: Array[Byte]): Array[Byte] = {
      assert(jpeg(0) == 0xFF.toByte && jpeg(1) == 0xD8.toByte)
      val com = Array(0xFF, 0xFE, 0x00, 0x05, 0xFF, 0xD8, 0xFF)
        .map(_.toByte)
      jpeg.take(2) ++ com ++ jpeg.drop(2)
    }
    val payload =
      withComSoi(jpegAt(pattern(41L), 1.0f)) ++
      withComSoi(jpegAt(pattern(43L), 1.0f))
    val hs = decodeHashes(payload)
    assert(hs.map(_._1) === Seq(0, 1),
      s"exactly the two real frames must decode, got ${hs.map(_._1)}")
    assert(hs.map(_._2) === Seq(analyticHash(41L), analyticHash(43L)),
      "both frames must decode to their analytic hashes — a mis-split " +
        "would truncate frame 1 at the planted in-payload magic")
  }

  test("DQT pin: the quality-1.0 writer emits all-1 quantization tables (r14 advice)") {
    // The mm_codec_roundtrip / mm_frame_dupes_real exactness argument
    // rests on the JDK writer's max-quality quantization tables being
    // ~1 (per-pixel luma error bounded by DCT rounding, far inside the
    // aHash margin). That is a property of the RUNNING JRE's libjpeg,
    // so assert the tables actually WRITTEN: a JVM upgrade that ships
    // different tables now fails here, at the cause, instead of as an
    // unexplained oracle hash flip in the declared queries. DQT wire
    // format (T.81 §B.2.4.1): FF DB, 2-byte length, then per table one
    // precision/id byte (high nibble 0 ⇒ 8-bit entries) + 64 entries.
    val bytes = jpegAt(pattern(7L), 1.0f)
    val tables = Seq.newBuilder[Seq[Int]]
    var i = 2
    var inScan = false
    while (i + 1 < bytes.length && !inScan) {
      assert(bytes(i) == 0xFF.toByte, s"marker expected at $i")
      val m = bytes(i + 1) & 0xFF
      if (m == 0xDA) inScan = true // SOS: tables all seen
      else {
        val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
        if (m == 0xDB) {
          var j = i + 4
          val end = i + 2 + len
          while (j < end) {
            val precision = (bytes(j) & 0xFF) >> 4
            assert(precision === 0, "JDK max-quality DQT is 8-bit")
            tables += (1 to 64).map(k => bytes(j + k) & 0xFF)
            j += 65
          }
        }
        i += 2 + len
      }
    }
    assert(tables.result().nonEmpty, "no DQT segment found")
    tables.result().zipWithIndex.foreach { case (t, n) =>
      assert(t.forall(_ == 1),
        s"quantization table $n is not all-1 at quality 1.0: $t — the " +
          "JRE's writer changed; re-measure the lossy boundary and the " +
          "declared-query exactness contract")
    }
  }

  test("lossy-boundary pin: aHash-exact at quality >= 0.5, distorted by 0.3 and below") {
    // 64 seeds spanning the mm_* odd seed space, plus seed 0 (the
    // all-black degenerate frame whose analytic hash is 0). Measured
    // boundary (JDK 17 writer/reader): 0 mismatches at qualities
    // 1.0/0.9/0.75/0.5, then 4/65 at 0.3, 20/65 at 0.2, 46/65 at 0.1 —
    // the single-pixel-bucket aHash margin (~250 counts white-vs-black
    // against an interior mean) absorbs moderate quantization noise,
    // and the declared corpora's quality-1.0 contract sits far inside
    // the exact region. The 0.3 leg proves the hash gate has TEETH:
    // a real quantization excursion lands on a different hash, so the
    // oracle WOULD catch a codec/quality drift — exactness at 1.0 is a
    // verified property, not insensitivity.
    val seeds = (0L until 64L).map(2 * _ + 1) :+ 0L
    for (q <- Seq(1.0f, 0.5f)) {
      val mm = seeds.filter { s =>
        decodeHashes(jpegAt(pattern(s), q)).head._2 != analyticHash(s)
      }
      assert(mm.isEmpty,
        s"quality $q must be aHash-exact on the planted patterns; mismatched seeds: $mm")
    }
    val lowQ = seeds.count { s =>
      decodeHashes(jpegAt(pattern(s), 0.3f)).head._2 != analyticHash(s)
    }
    assert(lowQ > 0,
      "quality 0.3 should distort some high-frequency two-tone patterns — " +
        "if it never does, the exactness pin above is vacuous; re-measure the boundary")
  }

  test("all-uniform frames survive any quality (DC-only blocks are exact)") {
    // uniform blocks carry only the DC coefficient, which every JPEG
    // quality preserves to the count — the degenerate 0-hash is stable
    val black = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (q <- Seq(1.0f, 0.75f, 0.3f))
      assert(decodeHashes(jpegAt(black, q)).head._2 === 0L,
        s"uniform black must hash to 0 at quality $q")
  }

  test("three-codec corpus: near-dup pairs found across the lossy boundary") {
    import spark.implicits._
    // one shared planted frame re-encoded in all three codecs, plus a
    // distinct second frame per doc: every doc pair shares exactly the
    // common frame, found by exact aHash equality because GIF/PNG are
    // lossless and max-quality JPEG is inside the aHash margin
    val shared = pattern(7L)
    // GIF's multi-frame form is a single ANIMATED container (the GIF
    // reader stops at the first trailer, so concatenation doesn't work
    // for it) — PNG/JPEG concatenate, matching the mm_* corpus shapes
    def gifAnimated(fs: Seq[BufferedImage]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val w = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        w.setOutput(ios)
        val p = w.getDefaultWriteParam
        p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        w.prepareWriteSequence(null)
        fs.foreach(f =>
          w.writeToSequence(new javax.imageio.IIOImage(f, null, null), p))
        w.endWriteSequence()
        ios.close()
      } finally w.dispose()
      bos.toByteArray
    }
    def pngOf(f: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(f, "png", bos)); bos.toByteArray
    }
    val rows = Seq(
      MediaRow(10L, gifAnimated(Seq(shared, pattern(11L))), "g"),
      MediaRow(20L, pngOf(shared) ++ pngOf(pattern(13L)), "p"),
      MediaRow(30L, jpegAt(shared, 1.0f) ++ jpegAt(pattern(15L), 1.0f), "j"))
      .toDS.repartition(2)
    val fr = Multimodal.frameAHashes(rows, new Multimodal.ImageFrameDecoder)
      .select(col("doc_id"), format_string("%d", col("ahash")).as("frame_md5"))
      .distinct()
    val pairs = Multimodal.frameDupePairs(fr, dfCap = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(pairs.toSeq === Seq((10L, 20L, 1L), (10L, 30L, 1L), (20L, 30L, 1L)),
      s"the shared frame must pair all three codecs; got ${pairs.toSeq}")
  }
}
