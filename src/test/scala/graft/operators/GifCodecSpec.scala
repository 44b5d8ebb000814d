package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Second real codec through the [[Multimodal.FrameDecoder]] contract
  * (round 11, r10 verdict item 8): animated GIF via javax.imageio,
  * planted alongside PNG payloads so the mm_* machinery (frame
  * sampling, aHash dedup, thumbnails) runs over a MIXED-codec corpus
  * exactly as a crawl's media column would arrive. */
class GifCodecSpec extends SparkSpec {

  /** A w×h frame painted left-half `lc`, right-half `rc` (palette-exact
    * in both PNG and GIF, so cross-codec pixels are identical). */
  private def frame(lc: Int, rc: Int, w: Int = 8, h: Int = 4): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) lc else rc)
    img
  }

  /** Interlace is disabled explicitly: the JDK GIF writer defaults to
    * interlaced frames in sequence mode and its interlace round-trip is
    * wrong for heights < 8 (row 3 of an 8×4 frame comes back with row
    * 1's pixels) — a WRITER artifact in the test-data generator, kept
    * out so the spec pins the decoder, not a JDK encoding quirk. */
  private def gifAnimated(frames: Seq[BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), param))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  private def png(f: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(f, "png", bos))
    bos.toByteArray
  }

  private val Red = 0xFF0000
  private val Black = 0x000000
  private val Blue = 0x0000FF
  private val White = 0xFFFFFF

  test("GifFrameDecoder: a real animated GIF decodes to its N frames through the contract") {
    import spark.implicits._
    val payload = gifAnimated(Seq(
      frame(Red, Black), frame(Blue, White), frame(White, Blue)))
    val rows = Seq(MediaRow(1L, payload, "gif")).toDS.repartition(1)
    val out = Multimodal.sampleFramesWith(rows, new Multimodal.GifFrameDecoder)
      .collect()
    assert(out.length === 3, "all three animation frames must decode")
    assert(out.map(_.getInt(1)).sorted.sameElements(Array(0, 1, 2)))
    // every frame normalizes to the shared packed-ARGB layout
    assert(out.forall(_.getAs[Array[Byte]]("frame").length === 8 * 4 * 4))
  }

  test("cross-codec parity: the same pixels hash identically from GIF and PNG") {
    import spark.implicits._
    val f = frame(Red, Black)
    val asGif = gifAnimated(Seq(f))
    val asPng = png(f)
    val rows = Seq(MediaRow(1L, asGif, "g"), MediaRow(2L, asPng, "p"))
      .toDS.repartition(1)
    val hashes = Multimodal.frameAHashes(rows, new Multimodal.ImageFrameDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hashes.size === 2)
    assert(hashes(1L) === hashes(2L),
      "packArgb normalization must make aHash codec-blind")
    assert(hashes(1L) !== 0L, "a two-tone frame must not hash to the trivial 0")
  }

  test("mm_codec_roundtrip: all three real codecs decode to the analytic hash, deterministically") {
    val run1 = Multimodal.queries("mm_codec_roundtrip")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val run2 = Multimodal.queries("mm_codec_roundtrip")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(run1.sortBy(_._1).sameElements(run2.sortBy(_._1)),
      "encode→decode→hash must be bit-deterministic")
    val byCodec = run1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCodec.keySet === Set("gif", "png", "jpeg"),
      "all three real codecs (incl. the lossy one) must be exercised")
    assert(run1.forall(_._3 >= 0L), "forced-black pixel 31 keeps hashes positive")
    assert(run1.map(_._3).distinct.length > run1.length / 2,
      "hashes must vary with the per-doc bit pattern")
  }

  test("mm_frame_dupes_real: planted multi-frame containers pair exactly cross-codec") {
    // every doc carries 2 frames (id%3=0: one animated GIF; id%3=1:
    // concatenated PNGs; id%3=2: concatenated max-quality JPEGs);
    // frame 1's seed is shared within (2k, 2k+1), and consecutive ids
    // always differ mod 3, so the declared pairs are exactly the
    // adjacent CROSS-CODEC pairs, cycling through all three codec
    // combinations — multi-frame iteration, magic dispatch, packArgb
    // codec-blindness across the lossy boundary, and the df-capped
    // join all land in this one shape
    val pairs = Multimodal.queries("mm_frame_dupes_real")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(pairs.length === (nDocs / 2).toInt,
      s"one pair per (2k, 2k+1): got ${pairs.length} of ${nDocs / 2}")
    assert(pairs.forall { case (a, b, n) => a % 2 == 0 && b == a + 1 && n == 1L },
      "every pair must be the adjacent cross-codec pair sharing exactly 1 frame")
  }

  test("mixed-codec corpus: frame dedup finds the cross-codec duplicate, thumbnails keep geometry") {
    import spark.implicits._
    val shared = frame(Red, Black)
    val gifDoc = gifAnimated(Seq(frame(Blue, White), shared))
    val pngDoc = png(shared) ++ png(frame(White, Blue)) // concatenated PNGs
    val loner = gifAnimated(Seq(frame(White, White)))
    val junk = "not an image at all".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(10L, gifDoc, "g"), MediaRow(20L, pngDoc, "p"),
      MediaRow(30L, loner, "g"), MediaRow(40L, junk, "x"))
      .toDS.repartition(2)
    val dec = new Multimodal.ImageFrameDecoder
    // dedup on perceptual hashes: doc 10 (GIF) and doc 20 (PNG) share
    // the red/black frame — found across codecs; junk yields 0 frames
    val fr = Multimodal.frameAHashes(rows, dec)
      .select(col("doc_id"), format_string("%d", col("ahash")).as("frame_md5"))
      .distinct()
    val pairs = Multimodal.frameDupePairs(fr, dfCap = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((10L, 20L, 1L)),
      s"exactly the cross-codec pair with 1 shared frame; got ${pairs.toSeq}")
    // thumbnails ride the decode task with real pixel geometry
    val thumbs = Multimodal.frameThumbnails(
      rows.filter(_.doc_id != 40L), dec, srcW = 8, srcH = 4, dstW = 4, dstH = 2)
      .collect()
    assert(thumbs.length === 5, "2 + 2 + 1 frames thumbnailed")
    assert(thumbs.forall(_.getAs[Array[Byte]]("thumb").length === 4 * 2 * 4))
  }
}
