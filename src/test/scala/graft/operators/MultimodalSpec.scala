package graft.operators

import graft.SparkSpec

/** Multimodal plumbing: schema shape, stub determinism, frame sampling,
  * metadata-only pruning. */
class MultimodalSpec extends SparkSpec {

  test("mm_audio_roundtrip: WAV encode→parse→features is exact and deterministic") {
    import org.apache.spark.sql.functions.col
    val run1 = Multimodal.queries("mm_audio_roundtrip")(spark, sfDir)
    val rows = run1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // the features are analytic in the generating parameters — replay
    // them here (the same arithmetic the DuckDB oracle runs)
    rows.foreach { case (id, n, zc, sumAbs) =>
      val h = (id & 1073741823L) * 2654435761L
      val halfp = 4L + h % 13
      val amp = 1000L + h % 9000
      val expN = 800L + id % 7 * 160
      assert(n === expN, s"doc $id sample count")
      assert(zc === (expN - 1) / halfp, s"doc $id zero crossings")
      assert(sumAbs === expN * amp, s"doc $id absolute sum")
    }
    val again = Multimodal.queries("mm_audio_roundtrip")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { case (id, _, _, sumAbs) => assert(again(id) === sumAbs) }
    assert(run1.select(col("doc_id")).distinct().count() === rows.length.toLong)
  }

  test("feature extraction: fixed shape, deterministic, batch-mapped") {
    val feats = Multimodal.extractFeatures(Multimodal.media(spark, sfDir))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.features.forall(f => f >= -1.0 && f <= 1.0)))
    assert(rows.forall(r => Set("image", "audio", "video")(r.kind)))
    // determinism: re-run yields identical vectors
    val again = Multimodal.extractFeatures(Multimodal.media(spark, sfDir))
      .collect().map(r => r.doc_id -> r.features.toSeq).toMap
    rows.foreach(r => assert(again(r.doc_id) == r.features.toSeq))
  }

  test("stub decode is a pure function of bytes") {
    val a = Multimodal.stubDecodeFeatures("hello world".getBytes)
    val b = Multimodal.stubDecodeFeatures("hello world".getBytes)
    val c = Multimodal.stubDecodeFeatures("hello worle".getBytes)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
  }

  test("frame sampling keeps every k-th fixed-size frame") {
    val frames = Multimodal.sampleFrames(
      Multimodal.media(spark, sfDir), frameBytes = 16, every = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length == 16))
    assert(rows.forall(_.getAs[Int]("frame_no") % 2 == 0))
  }

  test("metadata pass matches payload-length ground truth") {
    val meta = Multimodal.queries("mm_metadata")(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    meta.foreach(r => assert(r.getAs[Int]("n_bytes") == docs(r.getAs[Long]("doc_id"))))
  }

  test("frame_dupes: ordered pairs whose shared count matches the frame sets") {
    import org.apache.spark.sql.functions._
    val dupes = Multimodal.queries("mm_frame_dupes")(spark, sfDir).cache()
    assert(dupes.where(col("doc_a") >= col("doc_b") ||
      col("n_shared_frames") < 1).count() === 0)
    // every reported count equals the distinct-frame intersection over
    // the DECLARED frame universe (hashes with df <= the hot cap —
    // mirror the query's contract, as the oracle does)
    val raw = Multimodal.queries("mm_frame_sample")(spark, sfDir)
      .select("doc_id", "frame_md5").distinct()
    val okHash = raw.groupBy("frame_md5")
      .agg(count(lit(1)).as("fp_df")).where(col("fp_df") <= Multimodal.FrameDfCap)
    val fr = raw.join(okHash.select("frame_md5"), "frame_md5")
      .groupBy("doc_id").agg(collect_set(col("frame_md5")).as("fps"))
    val bad = dupes
      .join(fr.select(col("doc_id").as("doc_a"), col("fps").as("fa")), "doc_a")
      .join(fr.select(col("doc_id").as("doc_b"), col("fps").as("fb")), "doc_b")
      .where(size(array_intersect(col("fa"), col("fb"))) =!= col("n_shared_frames"))
    assert(bad.count() === 0)
    dupes.unpersist()
  }

  test("decoder contract: open once per partition, close on completion, stub-identical output") {
    import org.apache.spark.sql.functions._
    MultimodalSpec.opens.set(0); MultimodalSpec.closes.set(0); MultimodalSpec.rowsSeen.set(0)
    val media = Multimodal.media(spark, sfDir).repartition(3)
    val counting = new Multimodal.FrameDecoder {
      private val inner = new Multimodal.StrideDecoder(64, 4)
      override def open(): Unit = MultimodalSpec.opens.incrementAndGet()
      override def close(): Unit = MultimodalSpec.closes.incrementAndGet()
      def frames(p: Array[Byte]) = {
        MultimodalSpec.rowsSeen.incrementAndGet(); inner.frames(p)
      }
    }
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("frame_md5", md5(col("frame"))).drop("frame")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .sorted.toSeq
    // ONE action on the counting plan, so opens counts its 3 tasks once
    val viaContract = rowsOf(Multimodal.sampleFramesWith(media, counting))
    val viaStub = rowsOf(Multimodal.sampleFrames(media, 64, 4))
    assert(viaContract.nonEmpty && viaContract == viaStub)
    // local[*] runs tasks in-process, so the counters see every task:
    // heavy init ran once per partition (3), not once per row, and every
    // open was matched by a completion-listener close
    assert(MultimodalSpec.opens.get() == 3, s"opens=${MultimodalSpec.opens.get()}")
    assert(MultimodalSpec.closes.get() == MultimodalSpec.opens.get())
    assert(MultimodalSpec.rowsSeen.get() > MultimodalSpec.opens.get())
  }

  test("PngFrameDecoder: real PNG payload bytes decode to >1 frame per doc through the contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // plant REAL codec payloads: each doc's payload is a concatenation
    // of in-memory-encoded PNGs (3 for doc 1, 2 for doc 2), each a
    // solid-color 4x3 image whose pixels we know exactly
    def png(argb: Int, w: Int = 4, h: Int = 3): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, argb)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    def pixels(argb: Int, n: Int = 12): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(n * 4)
      (0 until n).foreach(_ => out.putInt(argb))
      out.array()
    }
    val red = 0xFFCC0000; val green = 0xFF00CC00; val blue = 0xFF0000CC
    val docs = Seq(
      MediaRow(1L, png(red) ++ png(green) ++ png(blue), "s"),
      MediaRow(2L, png(green) ++ png(red), "s"),
    ).toDS().repartition(2)
    val got = Multimodal.sampleFramesWith(docs, new Multimodal.PngFrameDecoder)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    // every payload yields MULTIPLE frames of REAL decoded pixels
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).length == 3 && byDoc(2L).length == 2)
    val expected = Map(
      (1L, 0) -> pixels(red), (1L, 1) -> pixels(green), (1L, 2) -> pixels(blue),
      (2L, 0) -> pixels(green), (2L, 1) -> pixels(red))
    got.foreach { case (id, f, bytes) =>
      assert(java.util.Arrays.equals(bytes, expected((id, f))),
        s"doc $id frame $f pixel drift")
    }
    // a corrupt frame costs one frame, never the task: truncate the last
    // PNG mid-stream; the two intact frames still decode
    val corrupt = Seq(MediaRow(3L,
      png(red) ++ png(green) ++ png(blue).dropRight(40), "s")).toDS()
    val survived = Multimodal.sampleFramesWith(corrupt, new Multimodal.PngFrameDecoder)
      .collect().map(_.getInt(1)).sorted
    assert(survived.sameElements(Array(0, 1)), survived.mkString(","))
  }

  test("frame_dupes: a planted boilerplate frame in 120 docs must not explode pairs") {
    import spark.implicits._
    // 120 docs all share one "black frame" hash; docs 0 and 1 also share
    // one genuinely rare frame. Without the df cap the hot hash alone
    // yields 120*119/2 = 7140 pairs; with it, only the rare pair counts.
    val hot = (0 until 120).map(i => (i.toLong, "blackframe-boilerplate"))
    val rare = Seq((0L, "rare-keyframe"), (1L, "rare-keyframe"))
    val fr = (hot ++ rare).toDF("doc_id", "frame_md5")
    val pairs = Multimodal.frameDupePairs(fr, dfCap = 64).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 0L && p.getLong(1) == 1L && p.getLong(2) == 1L)
  }

  test("resizeNearestArgb: exact pixel selection, idempotent at same size, fused decode path") {
    import spark.implicits._
    // 4x3 frame with a distinct ARGB int per pixel: resize to 2x2 must
    // pick exactly src(y*3/2, x*4/2) = rows {0,1}, cols {0,2}
    val src = java.nio.ByteBuffer.allocate(12 * 4)
    (0 until 12).foreach(p => src.putInt(0xFF000000 | p))
    val bytes = src.array()
    def px(b: Array[Byte], i: Int): Int =
      java.nio.ByteBuffer.wrap(b, i * 4, 4).getInt
    val t = Multimodal.resizeNearestArgb(bytes, 4, 3, 2, 2)
    assert(t.length == 2 * 2 * 4)
    assert(Seq(px(t, 0), px(t, 1), px(t, 2), px(t, 3)) ==
      Seq(0xFF000000 | 0, 0xFF000000 | 2, 0xFF000000 | 4, 0xFF000000 | 6))
    // same-size resize is the identity selection
    assert(java.util.Arrays.equals(
      Multimodal.resizeNearestArgb(bytes, 4, 3, 4, 3), bytes))
    // end-to-end through the REAL PNG decoder: a solid-color image
    // thumbnails to the same solid color at the smaller size
    def png(argb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, argb)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val red = 0xFFCC0000
    val docs = Seq(MediaRow(1L, png(red, 4, 3), "s")).toDS()
    val thumbs = Multimodal.frameThumbnails(docs,
        new Multimodal.PngFrameDecoder, 4, 3, 2, 2)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](2)))
    assert(thumbs.length == 1)
    assert((0 until 4).forall(i => px(thumbs.head._2, i) == red))
  }

  test("averageHash64: identical frames collide, near frames are near, inverses are far") {
    import spark.implicits._
    // structured 64x1 gradient images (solid colors all hash to 0L by
    // construction — uniform luminance has no bucket above the mean)
    def gradPng(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 1, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      (0 until 64).foreach { x =>
        val v = f(x) & 0xFF
        img.setRGB(x, 0, 0xFF000000 | (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val ramp = gradPng(x => x * 4)                    // dark → bright
    val rampJit = gradPng(x => (x * 4) ^ 1)           // ±1 luminance noise
    val inverse = gradPng(x => 255 - x * 4)           // bright → dark
    val docs = Seq(
      MediaRow(1L, ramp ++ rampJit ++ inverse, "s"),
      MediaRow(2L, ramp, "s"),
    ).toDS().repartition(2)
    val h = Multimodal.frameAHashes(docs, new Multimodal.PngFrameDecoder)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // identical pixels → identical hash, across docs and partitions
    assert(h((1L, 0)) == h((2L, 0)))
    // the ramp's bright half is above its mean: a non-trivial bit pattern
    assert(java.lang.Long.bitCount(h((1L, 0))) >= 24
      && java.lang.Long.bitCount(h((1L, 0))) <= 40, h((1L, 0)).toBinaryString)
    // ±1 jitter moves few bits; the inverted gradient flips nearly all
    assert(dist(h((1L, 0)), h((1L, 1))) <= 8,
      s"jitter dist ${dist(h((1L, 0)), h((1L, 1)))}")
    assert(dist(h((1L, 0)), h((1L, 2))) >= 48,
      s"inverse dist ${dist(h((1L, 0)), h((1L, 2)))}")
    // pure-kernel edge cases: empty frame and uniform frame hash to 0
    assert(Multimodal.averageHash64(Array.emptyByteArray) == 0L)
    assert(Multimodal.averageHash64(Array.fill(256)(0x7F.toByte)) == 0L)
  }
}

/** Static counters: the decoder closure runs in local[*] executor
  * threads of the SAME JVM, so statics observe every task. */
object MultimodalSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val rowsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
}
