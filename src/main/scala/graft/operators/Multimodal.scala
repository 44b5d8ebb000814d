package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One media row: opaque payload + typed metadata — the `BinaryType`
  * column convention for image/audio/video at 100 TB. */
case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)

/** Extracted features: fixed-shape vector + provenance. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, kind: String,
    features: Array[Double])

/** Multimodal columns: treat image/audio/video as opaque `binary` with
  * typed metadata; decode/feature steps run per-partition so a real
  * decoder amortizes model/codec init across a whole batch.
  *
  * The decode itself is a clearly-marked STUB (no media libs in this
  * container): [[stubDecodeFeatures]] produces a deterministic fake
  * 8-dim feature vector from the bytes. The Spark-side plumbing —
  * binary schema, partition-wise batching, fixed output shape,
  * metadata-only pruning — is real and tested; a production decoder
  * replaces ONLY the function body.
  *
  * Real file ingestion path: `spark.read.format("binaryFile")` (see
  * [[graft.sources.Tables.binaryFiles]]); here payloads are derived from
  * `documents.text` so the driver corpus exercises the pipeline.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** The media table: text bytes standing in for encoded media. */
  private[graft] def media(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as[MediaRow]
  }

  /** Magic-byte "container" classification — deterministic from payload
    * alone, so it is SQL-expressible and oracle-checked. */
  private val kindExpr =
    "CASE WHEN ascii(substring(text, 1, 1)) % 3 = 0 THEN 'image' " +
    "WHEN ascii(substring(text, 1, 1)) % 3 = 1 THEN 'audio' ELSE 'video' END"

  /** Metadata pass: length/hash/kind. Never touches a decoder — the
    * pruning query pattern (filter by metadata, decode only survivors). */
  private val metadata: Q = (s, d) =>
    Tables.documents(s, d).selectExpr(
      "doc_id",
      "length(CAST(text AS BINARY)) AS n_bytes",
      "md5(CAST(text AS BINARY)) AS payload_md5",
      s"$kindExpr AS kind",
      "source")

  /** STUB decoder: deterministic fake features — lane j is an md5-60-bit
    * hash of (payload ‖ ":j") squashed into [-1, 1). A real
    * implementation decodes the payload (image pixels / audio samples)
    * here — same signature, same batch shape. md5 (rather than an
    * engine-local hash) so even the stub is replayable in the DuckDB
    * oracle: the pipeline's plumbing is hash-verified end-to-end, and a
    * future real decoder only downgrades this query's check, never the
    * schema or batch shape. */
  private[graft] def stubDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(8) { j =>
      md.reset()
      md.update(payload)
      val d = md.digest(s":$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var be = 0L
      var b = 0
      while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
      val h = be >>> 4 // first 15 hex chars, nonnegative
      (h % 2000000L - 1000000L) / 1000000.0
    }
  }

  /** Feature extraction: per-partition batch map (decoder init once per
    * partition, not per row — the mapInPandas-batch analog in Scala). */
  private[graft] def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // decoder/codec initialization would happen HERE, once per batch
      it.map { m =>
        val kind = math.floorMod(m.payload.headOption.getOrElse(0: Byte).toInt, 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaFeatures(m.doc_id, m.payload.length, kind, stubDecodeFeatures(m.payload))
      }
    }
  }

  /** REPLACEMENT CONTRACT for a real media decoder (ffmpeg via JNI, a
    * JavaCV grabber, a NN feature extractor). This trait pins the
    * Spark-side lifecycle heavy native decoders need — the part a
    * production swap must keep, while [[frames]] is the only method
    * whose body changes:
    *
    *   - the instance is constructed on the DRIVER and shipped in the
    *     task closure, so its FIELDS must be serializable CONFIG only
    *     (codec name, target fps, model path) — never live handles;
    *   - [[open]] runs ONCE PER PARTITION on the executor, before the
    *     first row: codec contexts, JNI allocations, model weights load
    *     here, amortized over the whole partition (the `mapInPandas`
    *     batch-init analog). A task gets its OWN deserialized copy, so
    *     per-task mutable handle fields are race-free;
    *   - [[frames]] runs per row, returning (frame_no, frame_bytes) —
    *     lazily if the decoder streams, the iterator is consumed within
    *     the task;
    *   - [[close]] runs at task COMPLETION (registered on TaskContext,
    *     so it also fires on task failure/kill) — native handles must
    *     release here or executors leak them across the job.
    */
  trait FrameDecoder extends Serializable {
    def open(): Unit = ()
    def frames(payload: Array[Byte]): Iterator[(Int, Array[Byte])]
    def close(): Unit = ()
  }

  /** STUB decoder: fixed-size byte slices at a fixed stride (the codec
    * keyframe seek stubbed as arithmetic). Offsets, slicing, and the
    * per-partition lifecycle are real. */
  final class StrideDecoder(frameBytes: Int, every: Int) extends FrameDecoder {
    def frames(p: Array[Byte]): Iterator[(Int, Array[Byte])] =
      (0 until p.length / frameBytes by every).iterator
        .map(f => (f, p.slice(f * frameBytes, (f + 1) * frameBytes)))
  }

  /** REAL decoder through the same contract: the payload is a
    * concatenation of PNG images (the simplest multi-frame container a
    * pure-JVM codec can read) and each frame is decoded with
    * `javax.imageio`'s PNG reader into packed ARGB pixel bytes. This is
    * the proof that [[FrameDecoder]]'s lifecycle carries a real codec,
    * not just the stride stub:
    *
    *   - the ONLY field is config (none, in fact) — the
    *     [[javax.imageio.ImageReader]] is a genuine NATIVE-STYLE HANDLE
    *     (stateful, non-serializable, must be `dispose()`d), created in
    *     [[open]] once per partition and released in [[close]], exactly
    *     the ffmpeg-context discipline the contract documents;
    *   - [[frames]] locates frame boundaries by the PNG magic
    *     (`89 50 4E 47 0D 0A 1A 0A` — unambiguous: the byte-stuffed
    *     signature cannot occur inside a chunk's length/type header at
    *     a frame start) and decodes each segment through the shared
    *     reader; undecodable segments are SKIPPED, not failed — at
    *     100 TB a corrupt frame must cost one frame, never the task.
    *
    * Not a declared query (the synthetic corpus's payloads are not
    * PNGs); `MultimodalSpec` drives planted real PNG payloads through
    * [[sampleFramesWith]] end-to-end. */
  final class PngFrameDecoder extends FrameDecoder {
    @transient private var reader: javax.imageio.ImageReader = _
    override def open(): Unit = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      require(it.hasNext, "JVM has no PNG ImageReader")
      reader = it.next()
    }
    override def close(): Unit = if (reader != null) { reader.dispose(); reader = null }

    private val Magic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    private def starts(p: Array[Byte]): Seq[Int] =
      (0 to p.length - Magic.length).filter(i => Magic.indices.forall(j => p(i + j) == Magic(j)))

    def frames(p: Array[Byte]): Iterator[(Int, Array[Byte])] = {
      val offs = starts(p)
      offs.zipWithIndex.iterator.flatMap { case (off, idx) =>
        val end = if (idx + 1 < offs.length) offs(idx + 1) else p.length
        // the input stream must close on the FAILURE path too: a
        // corrupt-frame-heavy partition would otherwise accumulate one
        // abandoned MemoryCacheImageInputStream per skipped frame until
        // GC (which the big-heap executor may not run for a long time)
        val img = {
          var in: javax.imageio.stream.ImageInputStream = null
          try {
            // MEMORY-cached explicitly: ImageIO.createImageInputStream
            // defaults to a DISK cache file per stream (one temp-file
            // create/delete per frame — measured as bimodal 4× rep
            // noise in the roundtrip bench); the payload is already
            // in memory, so the disk detour is pure overhead
            in = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(p.slice(off, end)))
            reader.setInput(in, true, true)
            Option(reader.read(0))
          } catch { case _: Exception => None } // corrupt frame: skip, don't fail
          finally if (in != null) { try in.close() catch { case _: Exception => () } }
        }
        img.map(i => (idx, packArgb(i)))
      }
    }
  }

  /** The shared decoded-frame representation: packed big-endian ARGB,
    * 4 bytes/pixel, row-major — every codec normalizes to this, so
    * [[averageHash64]] / [[resizeNearestArgb]] and the dedup joins are
    * CODEC-BLIND (a GIF frame and a PNG frame with the same pixels hash
    * identically; cross-codec near-dup works for free). */
  private[graft] def packArgb(i: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (i.getWidth, i.getHeight)
    val px = i.getRGB(0, 0, w, h, null, 0, w)
    val out = java.nio.ByteBuffer.allocate(px.length * 4)
    px.foreach(out.putInt)
    out.array()
  }

  /** SECOND real codec through the SAME contract (round 11, r10 verdict
    * item 8): multi-frame animated GIF via `javax.imageio` — proof the
    * [[FrameDecoder]] lifecycle generalizes beyond PNG rather than
    * being shaped around one codec. Differences that exercise the
    * contract:
    *
    *   - GIF is a TRUE multi-frame container (one stream, N images via
    *     `getNumImages`/`read(i)`), where the PNG path fakes one with
    *     concatenated signatures — so the frame iteration comes from
    *     the codec, not byte scanning;
    *   - frames decode to palette-indexed rasters; [[packArgb]]
    *     normalizes to the shared ARGB layout so downstream hashing /
    *     resizing is codec-blind;
    *   - frames are materialized per payload before the input stream
    *     closes (the reader cannot outlive its stream) — bounded by the
    *     payload's own frame count, the per-row granularity the
    *     contract already assumes; a corrupt frame (or a fully corrupt
    *     container) costs that frame (or payload), never the task. */
  final class GifFrameDecoder extends FrameDecoder {
    @transient private var reader: javax.imageio.ImageReader = _
    override def open(): Unit = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      require(it.hasNext, "JVM has no GIF ImageReader")
      reader = it.next()
    }
    override def close(): Unit =
      if (reader != null) { reader.dispose(); reader = null }

    def frames(p: Array[Byte]): Iterator[(Int, Array[Byte])] = {
      var in: javax.imageio.stream.ImageInputStream = null
      try {
        // memory-cached for the same no-temp-file reason as the PNG path
        in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(p))
        reader.setInput(in, false, true)
        val n = try reader.getNumImages(true) catch { case _: Exception => 0 }
        (0 until n).flatMap { i =>
          try Some((i, packArgb(reader.read(i))))
          catch { case _: Exception => None } // corrupt frame: skip
        }.iterator
      } catch { case _: Exception => Iterator.empty } // corrupt container
      finally if (in != null) { try in.close() catch { case _: Exception => () } }
    }
  }

  /** THIRD real codec through the SAME contract (round 14, r13 verdict
    * item 7): baseline JPEG via `javax.imageio` — the LOSSY case the
    * PNG/GIF pair can't exercise. Same concatenation convention as the
    * PNG path (JPEG has no multi-frame container), with frame
    * boundaries located by a MARKER-SEGMENT WALK (r14 advice — a bare
    * `FF D8 FF` scan is only sound inside entropy-coded data, where
    * every data FF is byte-stuffed as FF 00; a marker-segment PAYLOAD
    * (APPn/COM/ICC, EXIF thumbnails) may legally contain the magic and
    * would mis-split): from each SOI, marker segments are skipped by
    * their declared 2-byte lengths — payload bytes are never
    * interpreted — and entropy-coded data after an SOS is scanned with
    * the stuffing/restart rules until EOI closes the frame. A frame
    * that fails the walk (truncated/corrupt) falls back to the magic
    * scan for ITS boundary only, keeping the catch-and-skip discipline
    * at container granularity.
    *
    * Lossiness and the hash gate: at max quality (quantization tables
    * ~1) the luma error of the JDK roundtrip is a few counts per
    * pixel, while [[averageHash64]]'s per-bucket comparison on the
    * planted two-tone frames has a ~250-count margin (white ≈255 vs
    * black ≈0 against a strictly interior mean) — so the aHash of a
    * max-quality JPEG roundtrip is EXACTLY the analytic hash, and the
    * lossy codec rides the same integer oracle as the lossless pair.
    * `JpegCodecSpec` pins the measured boundary: exact at qualities
    * ≥ 0.5, distorted from 0.3 down (4/65 → 46/65 seeds by 0.1) — the
    * low-quality leg proving the hash gate would CATCH a quantization
    * drift rather than being insensitive to it. */
  final class JpegFrameDecoder extends FrameDecoder {
    @transient private var reader: javax.imageio.ImageReader = _
    override def open(): Unit = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
      require(it.hasNext, "JVM has no JPEG ImageReader")
      reader = it.next()
    }
    override def close(): Unit =
      if (reader != null) { reader.dispose(); reader = null }

    private val Magic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
    private def isSoiAt(p: Array[Byte], i: Int): Boolean =
      i + Magic.length <= p.length &&
        Magic.indices.forall(j => p(i + j) == Magic(j))

    /** End offset (exclusive) of the JPEG starting at `off`, by walking
      * its marker structure — segment payloads are SKIPPED via their
      * declared big-endian lengths, never pattern-scanned, so an APPn/
      * COM payload containing `FF D8 FF` cannot split the frame. None
      * on any structural violation (truncation, a non-FF where a marker
      * must start): the caller falls back to the magic scan for that
      * frame. Marker grammar (ITU T.81 §B): SOI/EOI/TEM/RSTn are
      * standalone; every other marker carries a 2-byte length that
      * INCLUDES itself; after an SOS header, entropy-coded data runs
      * until a marker other than stuffed-FF (FF 00) or RSTn
      * (FF D0–D7). */
    private def frameEnd(p: Array[Byte], off: Int): Option[Int] = {
      var i = off + 2 // past SOI
      var inScan = false
      while (i < p.length) {
        if (!inScan) {
          if (p(i) != 0xFF.toByte) return None
          // fill bytes: any number of FFs may pad before the marker code
          var j = i + 1
          while (j < p.length && p(j) == 0xFF.toByte) j += 1
          if (j >= p.length) return None
          val m = p(j) & 0xFF
          if (m == 0xD9) return Some(j + 1) // EOI
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i = j + 1 // standalone
          else if (m == 0xD8) return None // nested SOI: malformed here
          else {
            if (j + 2 >= p.length) return None
            val len = ((p(j + 1) & 0xFF) << 8) | (p(j + 2) & 0xFF)
            if (len < 2) return None
            i = j + 1 + len
            if (m == 0xDA) inScan = true // SOS: entropy data follows
          }
        } else {
          // entropy-coded scan: skip to the next real marker
          if (p(i) == 0xFF.toByte && i + 1 < p.length) {
            val m = p(i + 1) & 0xFF
            if (m == 0x00 || (m >= 0xD0 && m <= 0xD7)) i += 2 // stuffed/RSTn
            else if (m == 0xFF) i += 1 // fill byte
            else { inScan = false } // real marker: resume segment walk
          } else i += 1
        }
      }
      None // ran off the end before EOI
    }

    private def starts(p: Array[Byte]): Seq[Int] = {
      val b = Seq.newBuilder[Int]
      var i = 0
      while (i >= 0 && i <= p.length - Magic.length) {
        if (isSoiAt(p, i)) {
          b += i
          i = frameEnd(p, i).getOrElse {
            // corrupt frame: magic-scan fallback for this boundary only
            val nxt = (i + 2 to p.length - Magic.length)
              .find(isSoiAt(p, _))
            nxt.getOrElse(p.length)
          }
        } else i += 1
      }
      b.result()
    }

    def frames(p: Array[Byte]): Iterator[(Int, Array[Byte])] = {
      val offs = starts(p)
      offs.zipWithIndex.iterator.flatMap { case (off, idx) =>
        val end = if (idx + 1 < offs.length) offs(idx + 1) else p.length
        val img = {
          var in: javax.imageio.stream.ImageInputStream = null
          try {
            // memory-cached for the same no-temp-file reason as PNG
            in = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(p.slice(off, end)))
            reader.setInput(in, true, true)
            Option(reader.read(0))
          } catch { case _: Exception => None } // corrupt frame: skip
          finally if (in != null) { try in.close() catch { case _: Exception => () } }
        }
        img.map(i => (idx, packArgb(i)))
      }
    }
  }

  /** Max-quality baseline JPEG encode — the writer-side counterpart of
    * [[JpegFrameDecoder]]'s exactness argument: MODE_EXPLICIT with
    * compressionQuality 1.0 drives the JDK's quantization tables to
    * ~1, bounding per-pixel luma error to DCT rounding (a few counts).
    * Shared by the roundtrip query and the planted dedup corpus. */
  private[graft] def writeJpegMaxQuality(
      writer: javax.imageio.ImageWriter,
      img: java.awt.image.BufferedImage,
      out: java.io.OutputStream): Unit = {
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close()
  }

  /** Magic-byte dispatch over the real codecs — the mixed-corpus entry
    * point: a crawl's media column is never single-format, and the
    * dispatch rides the SAME per-partition lifecycle (all child
    * readers open once per task, close on completion). Unknown formats
    * yield zero frames (skip, never fail — the corrupt-frame
    * discipline at container granularity). */
  final class ImageFrameDecoder extends FrameDecoder {
    private val png = new PngFrameDecoder
    private val gif = new GifFrameDecoder
    private val jpeg = new JpegFrameDecoder
    override def open(): Unit = { png.open(); gif.open(); jpeg.open() }
    override def close(): Unit = { png.close(); gif.close(); jpeg.close() }
    def frames(p: Array[Byte]): Iterator[(Int, Array[Byte])] =
      if (p.length >= 3 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')
        gif.frames(p)
      else if (p.length >= 3 && p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
          p(2) == 0xFF.toByte)
        jpeg.frames(p)
      else png.frames(p)
  }

  /** Frame sampling through the [[FrameDecoder]] contract: one decoder
    * copy per task, opened before the first row, closed at task
    * completion. */
  private[graft] def sampleFramesWith(rows: Dataset[MediaRow],
      dec: FrameDecoder): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      dec.open() // heavy init: once per partition, never per row
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      it.flatMap { m =>
        dec.frames(m.payload).map { case (f, b) => (m.doc_id, f, b) }
      }
    }.toDF("doc_id", "frame_no", "frame")
  }

  /** Frame sampling with the stub stride decoder (declared-query path). */
  private[graft] def sampleFrames(rows: Dataset[MediaRow], frameBytes: Int = 64,
      every: Int = 4): DataFrame =
    sampleFramesWith(rows, new StrideDecoder(frameBytes, every))

  /** Average-hash (aHash) of a decoded ARGB frame: the standard
    * perceptual near-dup kernel — two frames are visual near-dups iff
    * the Hamming distance of their 64-bit hashes is small, so frame
    * dedup becomes the same banded/bucketed join discipline as
    * [[Dedup]]'s SimHash path instead of byte-exact md5 matching
    * (which a single re-encode breaks).
    *
    * 1-D variant over the luminance stream: the packed-ARGB frames the
    * [[FrameDecoder]] contract yields carry no (w,h), and for
    * near-dup bucketing the exact 8×8 downsample geometry is
    * irrelevant — what matters is that the SAME pixels give the SAME
    * hash and near pixels give near hashes. 64 equal buckets over the
    * luminance sequence; bit i set iff bucket i's mean EXCEEDS the
    * global mean, compared by integer cross-multiplication
    * (`sum_i · n > total · n_i`) — no division, no float, bit-stable
    * on every JVM. All-uniform frames hash to 0L by construction
    * (no bucket exceeds the mean).
    *
    * ITU-R 601 integer luminance: (299·R + 587·G + 114·B) / 1000,
    * truncating — deterministic, and alpha ignored. */
  private[graft] def averageHash64(argb: Array[Byte]): Long = {
    val n = argb.length / 4
    if (n == 0) return 0L
    val lum = new Array[Long](n)
    var total = 0L
    var p = 0
    while (p < n) {
      val r = argb(p * 4 + 1) & 0xFF
      val g = argb(p * 4 + 2) & 0xFF
      val b = argb(p * 4 + 3) & 0xFF
      lum(p) = (299L * r + 587L * g + 114L * b) / 1000L
      total += lum(p)
      p += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      // bucket i covers [i*n/64, (i+1)*n/64) — empty when n < 64; an
      // empty bucket contributes a 0 bit (0 * n > total * 0 is false)
      val from = i * n / 64
      val until = (i + 1) * n / 64
      var s = 0L
      var j = from
      while (j < until) { s += lum(j); j += 1 }
      if (s * n > total * (until - from)) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Nearest-neighbor resize of a packed-ARGB frame (4 bytes/pixel,
    * row-major): dst(y, x) = src(y·srcH DIV dstH, x·srcW DIV dstW) —
    * the thumbnail/downsample step of every image pipeline, in pure
    * integer index arithmetic (no interpolation, no float, so the
    * output bytes are a deterministic SELECTION of input bytes on any
    * JVM). Runs fused with the decode inside the [[FrameDecoder]]
    * task — full-resolution pixels never leave the partition, only
    * thumbnails shuffle (the [[frameAHashes]] discipline; at 100 TB of
    * video the resize is WHERE the data-volume drop happens, so it
    * must ride the decode task, never a separate shuffle stage). */
  private[graft] def resizeNearestArgb(argb: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Byte] = {
    require(srcW * srcH * 4 == argb.length,
      s"frame is ${argb.length} bytes, not ${srcW}x$srcH ARGB")
    val out = new Array[Byte](dstW * dstH * 4)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        System.arraycopy(argb, (sy * srcW + sx) * 4, out, (y * dstW + x) * 4, 4)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode → resize → thumbnail rows in one narrow pass: per frame,
    * the (doc_id, frame_no, dstW·dstH ARGB thumbnail). Geometry comes
    * from the caller because the packed-ARGB contract carries no
    * (w, h). */
  private[graft] def frameThumbnails(rows: Dataset[MediaRow], dec: FrameDecoder,
      srcW: Int, srcH: Int, dstW: Int, dstH: Int): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      dec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      it.flatMap { m =>
        dec.frames(m.payload).map { case (f, b) =>
          (m.doc_id, f, resizeNearestArgb(b, srcW, srcH, dstW, dstH))
        }
      }
    }.toDF("doc_id", "frame_no", "thumb")
  }

  /** Per-frame perceptual hashes through a [[FrameDecoder]]: decode →
    * feature-extract in one narrow pass (the hash rides the same task
    * as the decode, so full-resolution pixels never shuffle — only the
    * 8-byte hash does, the property that makes frame near-dup viable
    * at 100 TB of video). */
  private[graft] def frameAHashes(rows: Dataset[MediaRow],
      dec: FrameDecoder): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      dec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      it.flatMap { m =>
        dec.frames(m.payload).map { case (f, b) => (m.doc_id, f, averageHash64(b)) }
      }
    }.toDF("doc_id", "frame_no", "ahash")
  }

  /** REAL-CODEC roundtrip UNDER THE HASH GATE (round 11): the PNG/GIF
    * decode path was spec-only (the driver corpus carries no real
    * media), so the driver's oracle never touched it. This query
    * closes that: per document, an 8×4 black/white image is drawn from
    * a deterministic bit pattern of `doc_id` (the `sampleHashExpr`
    * multiplicative mix; pixel j is white iff bit j is set, pixel 0
    * forced black so the all-white degenerate hash can't occur),
    * ENCODED with a real codec — animated-GIF writer for `id % 3 = 0`,
    * PNG for `id % 3 = 1`, max-quality baseline JPEG for `id % 3 = 2`
    * (round 14: the LOSSY case) — then DECODED back through
    * [[ImageFrameDecoder]]'s magic-byte dispatch and perceptually
    * hashed with [[averageHash64]]. PNG/GIF are lossless on a 2-color
    * palette so the decoded pixels are exact; max-quality JPEG bounds
    * luma error to DCT rounding, far inside the two-tone pattern's
    * ~250-count aHash margin ([[JpegFrameDecoder]]) — so for ALL THREE
    * codecs the aHash is an ANALYTIC function of the bit pattern
    * (white pixel j ⇒ hash bit 2j; odd bits empty-bucket zero) that
    * the DuckDB oracle computes with pure integer bit arithmetic — a
    * wrong decode, a palette drift, a quantization excursion, a
    * packArgb layout change, or a broken dispatch each lands on a
    * different hash.
    *
    * 100 TB shape: one narrow mapPartitions, encoder + decoder
    * initialized once per task ([[FrameDecoder]] lifecycle), ~60-byte
    * payloads never shuffled — output is (id, codec, 8-byte hash). */
  private val codecRoundtrip: Q = (s, d) => {
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      val dec = new ImageFrameDecoder
      dec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      val gifWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val jpegWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit] { _ =>
          gifWriter.dispose(); jpegWriter.dispose()
        })
      it.map { id =>
        val h = (id & 1073741823L) * 2654435761L
        val img = new java.awt.image.BufferedImage(
          8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // pixels 0 and 31 forced black: pixel j lands in aHash bucket
        // 2j+1 (32 pixels over 64 buckets, integer-division bounds),
        // so pixel 31 would set SIGN bit 63 — keeping it black keeps
        // the declared hash positive on both engines, and pixel 0
        // black rules out the all-white degenerate zero-hash
        var j = 0
        while (j < 32) {
          val white = j != 0 && j != 31 && ((h >> j) & 1L) == 1L
          img.setRGB(j % 8, j / 8, if (white) 0xFFFFFF else 0x000000)
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        (id % 3) match {
          case 0 =>
            // non-interlaced explicitly: the JDK GIF writer's interlace
            // round-trip is wrong for heights < 8 (see GifCodecSpec)
            val ios =
              new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
            gifWriter.setOutput(ios)
            val param = gifWriter.getDefaultWriteParam
            param.setProgressiveMode(
              javax.imageio.ImageWriteParam.MODE_DISABLED)
            gifWriter.write(null,
              new javax.imageio.IIOImage(img, null, null), param)
            ios.close()
          case 1 =>
            javax.imageio.ImageIO.write(img, "png", bos)
          case _ =>
            writeJpegMaxQuality(jpegWriter, img, bos)
        }
        val frames = dec.frames(bos.toByteArray).toArray
        require(frames.length == 1 && frames.head._2.length == 8 * 4 * 4,
          s"doc $id: roundtrip decoded ${frames.length} frames")
        val codec = (id % 3) match {
          case 0 => "gif"; case 1 => "png"; case _ => "jpeg"
        }
        (id, codec, averageHash64(frames.head._2))
      }
    }.toDF("doc_id", "codec", "ahash")
  }

  /** REAL-AUDIO roundtrip UNDER THE HASH GATE (round 11, the audio
    * sibling of [[codecRoundtrip]]): per document, a square wave with
    * doc-derived half-period and amplitude is synthesized as 16-bit
    * mono PCM, ENCODED into a real WAV container
    * (`javax.sound.sampled.AudioSystem` — pure JVM, headless-safe),
    * DECODED back through the real parser (`getAudioInputStream`
    * negotiates the container header and PCM format), and reduced to
    * integer features — sample count, zero crossings, total absolute
    * amplitude — that are ANALYTIC functions of the generating
    * parameters, which the DuckDB oracle computes with integer
    * arithmetic: a header mis-parse, endianness flip, channel/width
    * drift, or sample corruption each lands on different numbers.
    * WAV PCM is lossless, so the roundtrip is exact by construction.
    *
    * 100 TB shape: identical to [[codecRoundtrip]] — one narrow
    * mapPartitions, ~2 KB payloads born and consumed inside the task,
    * only (id, 3 longs) ever shuffled. */
  private val audioRoundtrip: Q = (s, d) => {
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val h = (id & 1073741823L) * 2654435761L
        val halfp = (4L + h % 13).toInt
        val amp = (1000L + h % 9000).toInt
        val n = (800L + id % 7 * 160).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = if ((i / halfp) % 2 == 0) amp else -amp
          pcm(2 * i) = (v & 0xFF).toByte            // little-endian 16-bit
          pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          true, false)
        val src = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(src,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        src.close()
        // decode through the REAL container parser
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        val df = in.getFormat
        require(df.getSampleSizeInBits == 16 && df.getChannels == 1 &&
          !df.isBigEndian, s"doc $id: WAV decoded to unexpected format $df")
        val dec = in.readAllBytes()
        in.close()
        val m = dec.length / 2
        var zc = 0L
        var sumAbs = 0L
        var prev = 0
        var j = 0
        while (j < m) {
          val v = (((dec(2 * j + 1) & 0xFF) << 8) | (dec(2 * j) & 0xFF))
            .toShort.toInt
          if (j > 0 && v.toLong * prev < 0) zc += 1
          sumAbs += math.abs(v)
          prev = v
          j += 1
        }
        (id, m.toLong, zc, sumAbs)
      }
    }.toDF("doc_id", "n_samples", "zero_crossings", "sum_abs")
  }

  /** Features as a declared query — hash-verified: the stub decoder is
    * md5-derived, so the oracle recomputes the exact lane values;
    * MultimodalSpec additionally pins determinism + shape. */
  private val features: Q = (s, d) => {
    import s.implicits._
    extractFeatures(media(s, d))
      .select(col("doc_id"), col("n_bytes"), col("kind"),
        // flatten for a stable parquet schema
        col("features")(0).as("f0"), col("features")(7).as("f7"))
  }

  /** Frame sampling as a declared query: every [[FrameEvery]]-th
    * [[FrameBytes]]-byte frame of each payload, identified by its md5 —
    * the video keyframe-sample pipeline shape (offset arithmetic,
    * fan-out, per-frame hashing) with the codec seek stubbed as a fixed
    * stride. Slices are BYTE offsets; the oracle replays them with
    * char-based `substring`, valid only where the payload is
    * single-byte-per-char — so the query RESTRICTS to such docs
    * EXPLICITLY (`octet_length = char_length`, every doc on this
    * corpus) rather than assuming ASCII silently. */
  private val FrameBytes = 64
  private val FrameEvery = 4
  private val frameSample: Q = (s, d) => {
    import s.implicits._
    val asciiDocs = Tables.documents(s, d)
      .where(expr("length(CAST(text AS BINARY)) = length(text)"))
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as[MediaRow]
    sampleFrames(asciiDocs, FrameBytes, FrameEvery)
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        md5(col("frame")).as("frame_md5"))
  }

  /** 8×8 → 4×4 thumbnail geometry for the declared stride-frame resize:
    * a [[FrameBytes]]-byte frame read as an 8×8 grid of 1-byte pixels,
    * nearest-neighbor sampled at (2i, 2j) — the same index formula as
    * [[resizeNearestArgb]] with 1-byte pixels. Positions are 1-based
    * byte offsets, compile-time constants mirrored into the oracle. */
  private val ThumbPositions: Seq[Int] =
    for (i <- 0 until 4; j <- 0 until 4) yield (i * 2) * 8 + j * 2 + 1

  /** Resize as a declared query: every sampled frame downsampled to a
    * 4×4 thumbnail, identified by md5 — the resize PLUMBING (frame
    * fan-out → per-frame index selection → thumbnail key) with the
    * codec stubbed as the stride decoder, exactly the
    * [[frameSample]]/[[frameDupes]] convention (ascii-only docs so the
    * oracle's char substrings replay the byte slices). The REAL-pixel
    * path is [[frameThumbnails]] over [[resizeNearestArgb]],
    * spec-pinned on planted PNGs. */
  private val resizeQ: Q = (s, d) => {
    import s.implicits._
    val asciiDocs = Tables.documents(s, d)
      .where(expr("length(CAST(text AS BINARY)) = length(text)"))
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as[MediaRow]
    val thumb = concat(ThumbPositions.map(p => substring(col("frame"), p, 1)): _*)
    sampleFrames(asciiDocs, FrameBytes, FrameEvery)
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        md5(thumb).as("thumb_md5"))
  }

  /** Hot-fingerprint document-frequency cap for [[frameDupes]] — same
    * discipline as `dd_winnow`'s `WinnowDfCap` (`Dedup.scala`): a frame
    * hash shared by more than this many payloads is boilerplate (black
    * frames, silence, intro cards), not dedup signal, and without the
    * cap that ONE bucket is quadratic (10⁶ docs sharing a black frame
    * = 10¹² pairs from a single hash). */
  private[graft] val FrameDfCap = 256

  /** Video-level near-dup via shared frame fingerprints — the
    * multimodal dedup step: two payloads are near-dup candidates when
    * any sampled frame hash collides (re-encoded/trimmed copies share
    * keyframes even when the container bytes differ). Frames dedup
    * per doc BEFORE the join, so the bucket join moves (hash, id)
    * pairs only — the same inverted-index shape as `dd_winnow`,
    * including its hot-fingerprint guard: hashes with document
    * frequency > [[FrameDfCap]] are DROPPED before the self-join, and
    * the DECLARED semantics (mirrored in the oracle) are therefore
    * "pairs counted over shared frame hashes with df ≤ cap" — the
    * cap is part of the contract, not a data-dependent coincidence.
    * `MultimodalSpec` plants one boilerplate frame across 120 docs and
    * asserts the pair count stays linear, not quadratic. */
  private val frameDupes: Q = (s, d) => {
    val fr = frameSample(s, d).select(col("doc_id"), col("frame_md5")).distinct()
    frameDupePairs(fr, FrameDfCap)
  }

  /** The capped pair join on any (doc_id, frame_md5) frame table —
    * factored out so the planted-hot-frame spec drives it directly. */
  private[graft] def frameDupePairs(fr: DataFrame, dfCap: Int): DataFrame = {
    val freq = fr.groupBy("frame_md5").agg(count(lit(1)).as("fp_df"))
    val rare = fr.join(freq.where(col("fp_df") <= dfCap), "frame_md5")
      .select("doc_id", "frame_md5")
    rare.as("a").join(rare.as("b"),
        col("a.frame_md5") === col("b.frame_md5") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_frames"))
  }

  /** Draw the 8×4 two-tone frame for `seed`: pixel j white iff bit j of
    * the multiplicative mix is set, pixels 0 and 31 forced black (the
    * [[codecRoundtrip]] arithmetic — keeps the aHash analytic, nonzero
    * mean, and sign-bit-clear). */
  private def drawPatternFrame(seed: Long): java.awt.image.BufferedImage = {
    val h = (seed & 1073741823L) * 2654435761L
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var j = 0
    while (j < 32) {
      val white = j != 0 && j != 31 && ((h >> j) & 1L) == 1L
      img.setRGB(j % 8, j / 8, if (white) 0xFFFFFF else 0x000000)
      j += 1
    }
    img
  }

  /** REAL-DECODER frame dedup UNDER THE HASH GATE (round 12, r11
    * verdict item 3): [[frameDupes]] declares the stride STUB as its
    * decoder (the driver corpus carries no real media), so the real
    * PNG/GIF paths were hash-gated only via the single-frame
    * roundtrips. This query runs the full dedup pipeline over REAL
    * MULTI-FRAME containers: per document, TWO 8×4 frames are drawn
    * from deterministic bit patterns — frame 0 from a per-doc seed
    * (`2·id + 1`), frame 1 from a PAIR-shared seed (`4·(id DIV 2) + 2`,
    * identical for ids 2k and 2k+1; the odd/even seed spaces are
    * disjoint so a planted frame-0 never equals a planted frame-1 by
    * seed) — encoded as one ANIMATED GIF for `id % 3 = 0`, CONCATENATED
    * PNGs for `id % 3 = 1`, and CONCATENATED max-quality JPEGs for
    * `id % 3 = 2` (round 14: the LOSSY class — exact under the hash
    * gate by the margin argument on [[JpegFrameDecoder]]), decoded back
    * through [[ImageFrameDecoder]]'s magic dispatch, perceptually
    * hashed with [[averageHash64]], and joined with
    * [[frameDupePairs]]'s df-capped inverted-index discipline. Every
    * planted pair (2k, 2k+1) is STILL a cross-codec match — consecutive
    * ids differ mod 3 — and across k the pairs cycle through all three
    * codec combinations (gif/png, jpeg/gif, png/jpeg), so lossy-vs-
    * lossless dedup is exercised in both roles: the query hash-verifies
    * multi-frame container iteration, magic dispatch, [[packArgb]]
    * codec-blindness across the lossy boundary, and the dedup join in
    * one row, with the DuckDB oracle computing every frame hash from
    * the same integer bit arithmetic as `mm_codec_roundtrip` and
    * replaying the capped pair join (the codec layer stays invisible to
    * the oracle BY DESIGN — that invisibility is the tested property).
    *
    * 100 TB shape: identical to [[frameDupes]] — decode and hash fused
    * in one narrow pass (pixels never shuffle, only (id, 8-byte hash)),
    * then the capped hash-bucket self-join. The stub queries remain
    * declared as the plumbing differential. */
  private val frameDupesReal: Q = (s, d) => {
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id")).as[Long]
    val hashes = ids.mapPartitions { it =>
      val dec = new ImageFrameDecoder
      dec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      val gifWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val jpegWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit] { _ =>
          gifWriter.dispose(); jpegWriter.dispose()
        })
      it.flatMap { id =>
        val fs = Seq(drawPatternFrame(2 * id + 1),
          drawPatternFrame(4 * (id / 2) + 2))
        val bos = new java.io.ByteArrayOutputStream()
        (id % 3) match {
          case 0 => // one true multi-frame animated-GIF container
            val ios =
              new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
            gifWriter.setOutput(ios)
            val param = gifWriter.getDefaultWriteParam
            // non-interlaced: the JDK writer's interlace roundtrip is
            // wrong for heights < 8 (GifCodecSpec)
            param.setProgressiveMode(
              javax.imageio.ImageWriteParam.MODE_DISABLED)
            gifWriter.prepareWriteSequence(null)
            fs.foreach(f => gifWriter.writeToSequence(
              new javax.imageio.IIOImage(f, null, null), param))
            gifWriter.endWriteSequence()
            ios.close()
          case 1 => // concatenated single-frame PNGs
            fs.foreach(f => javax.imageio.ImageIO.write(f, "png", bos))
          case _ => // concatenated max-quality JPEGs (the lossy class)
            fs.foreach(f => writeJpegMaxQuality(jpegWriter, f, bos))
        }
        val frames = dec.frames(bos.toByteArray).toArray
        require(frames.length == 2 && frames.forall(_._2.length == 8 * 4 * 4),
          s"doc $id: planted 2-frame container decoded ${frames.length} frames")
        frames.iterator.map { case (_, b) => (id, averageHash64(b)) }
      }
    }.toDF("doc_id", "ahash")
    frameDupePairs(
      hashes.select(col("doc_id"),
        format_string("%d", col("ahash")).as("frame_md5")).distinct(),
      FrameDfCap)
  }

  val queries: Map[String, Q] = Map(
    "mm_metadata" -> metadata,
    "mm_features" -> features,
    "mm_frame_sample" -> frameSample,
    "mm_frame_dupes" -> frameDupes,
    "mm_frame_dupes_real" -> frameDupesReal,
    "mm_resize" -> resizeQ,
    "mm_codec_roundtrip" -> codecRoundtrip,
    "mm_audio_roundtrip" -> audioRoundtrip,
  )

  val oracle: Map[String, String] = Map(
    // the analytic features of the synthesized square wave: n samples
    // survive the WAV roundtrip exactly; the sign flips at every
    // multiple of the half-period in [1, n) — (n−1) DIV halfp
    // crossings; every sample's magnitude is the amplitude
    "mm_audio_roundtrip" ->
      """WITH base AS (
           SELECT doc_id, (doc_id & 1073741823) * 2654435761 AS h
           FROM documents)
         SELECT doc_id,
           CAST(800 + (doc_id % 7) * 160 AS BIGINT) AS n_samples,
           CAST((800 + (doc_id % 7) * 160 - 1) // (4 + h % 13)
                AS BIGINT) AS zero_crossings,
           CAST((800 + (doc_id % 7) * 160) * (1000 + h % 9000)
                AS BIGINT) AS sum_abs
         FROM base""",
    // the analytic aHash of the drawn bit pattern: white pixel j sets
    // hash bit 2j+1 (n=32 pixels over 64 buckets with integer-division
    // bounds → bucket 2j+1 = {pixel j}, even buckets empty; a white
    // pixel's luminance 255 exceeds the mean iff any pixel is black,
    // guaranteed by the forced-black pixels 0 and 31 — 31 also keeps
    // the sign bit clear). Pure integer bit arithmetic — any decode/
    // palette/layout/dispatch defect in the REAL codec path lands on a
    // different hash.
    "mm_codec_roundtrip" ->
      """WITH base AS (
           SELECT doc_id, (doc_id & 1073741823) * 2654435761 AS h
           FROM documents),
         bits AS (
           SELECT doc_id, h, unnest(range(1, 31)) AS j FROM base)
         SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'gif'
                WHEN doc_id % 3 = 1 THEN 'png'
                ELSE 'jpeg' END AS codec,
           CAST(coalesce(sum(CASE WHEN ((h >> j) & 1) = 1
                  THEN (CAST(1 AS BIGINT) << (2 * j + 1)) ELSE 0 END), 0)
                AS BIGINT) AS ahash
         FROM bits GROUP BY doc_id, h""",
    // octet_length(encode(..)) = UTF-8 BYTE count, matching Spark's
    // length(CAST(text AS BINARY)) on any corpus (DuckDB length(text)
    // counts CHARACTERS and diverges on non-ASCII).
    "mm_metadata" ->
      """SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS payload_md5,
         CASE WHEN ascii(substring(text, 1, 1)) % 3 = 0 THEN 'image'
              WHEN ascii(substring(text, 1, 1)) % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         source
         FROM documents""",
    // replays the md5-lane stub decoder byte-for-byte
    "mm_features" -> {
      def lane(j: Int) =
        s"""(CAST(concat('0x', substr(md5(text || ':$j'), 1, 15)) AS BIGINT)
             % 2000000 - 1000000) / 1000000.0"""
      s"""SELECT doc_id,
          octet_length(encode(text)) AS n_bytes,
          CASE WHEN ascii(substring(text, 1, 1)) % 3 = 0 THEN 'image'
               WHEN ascii(substring(text, 1, 1)) % 3 = 1 THEN 'audio'
               ELSE 'video' END AS kind,
          ${lane(0)} AS f0,
          ${lane(7)} AS f7
          FROM documents"""
    },
    // every planted frame's aHash from the same integer bit arithmetic
    // as mm_codec_roundtrip (white pixel j ⇒ hash bit 2j+1), over the
    // two seeds per doc (frame 0: 2·id+1, frame 1: pair-shared
    // 4·(id DIV 2)+2), then the identical df-capped pair join as
    // mm_frame_dupes — the codec layer is invisible by design, so the
    // oracle needs no pixels, only the generating parameters
    "mm_frame_dupes_real" ->
      s"""WITH seeds AS (
            SELECT doc_id, doc_id * 2 + 1 AS seed FROM documents
            UNION ALL
            SELECT doc_id, (doc_id // 2) * 4 + 2 FROM documents),
          bits AS (
            SELECT doc_id, (seed & 1073741823) * 2654435761 AS h,
              unnest(range(1, 31)) AS j
            FROM seeds),
          hashed AS (
            SELECT doc_id,
              CAST(coalesce(sum(CASE WHEN ((h >> j) & 1) = 1
                     THEN (CAST(1 AS BIGINT) << (2 * j + 1)) ELSE 0 END), 0)
                   AS BIGINT) AS ahash
            FROM bits GROUP BY doc_id, h),
          fr AS (SELECT DISTINCT doc_id, ahash FROM hashed),
          rare AS (
            SELECT fr.doc_id, fr.ahash FROM fr
            JOIN (SELECT ahash FROM fr GROUP BY ahash
                  HAVING count(*) <= $FrameDfCap) ok USING (ahash))
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS n_shared_frames
          FROM rare a JOIN rare b ON a.ahash = b.ahash AND a.doc_id < b.doc_id
          GROUP BY 1, 2""",
    // char-based substring replays the byte slices because the query
    // restricts to single-byte-per-char payloads; range() is
    // exclusive-end with stride, exactly `0 until n by every`. The
    // rare CTE mirrors the FrameDfCap hot-fingerprint guard exactly —
    // the df cap is part of the declared semantics.
    "mm_frame_dupes" ->
      s"""WITH fr AS (
            SELECT DISTINCT doc_id,
              md5(substring(text, frame_no * $FrameBytes + 1, $FrameBytes)) AS fp
            FROM (SELECT doc_id, text,
                    unnest(range(0, octet_length(encode(text)) // $FrameBytes,
                                 $FrameEvery)) AS frame_no
                  FROM documents
                  WHERE octet_length(encode(text)) = length(text))),
          rare AS (
            SELECT fr.doc_id, fr.fp FROM fr
            JOIN (SELECT fp FROM fr GROUP BY fp
                  HAVING count(*) <= $FrameDfCap) ok USING (fp))
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS n_shared_frames
          FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2""",
    "mm_frame_sample" ->
      s"""SELECT doc_id, frame_no,
            md5(substring(text, frame_no * $FrameBytes + 1, $FrameBytes)) AS frame_md5
          FROM (SELECT doc_id, text,
                  unnest(range(0, octet_length(encode(text)) // $FrameBytes,
                               $FrameEvery)) AS frame_no
                FROM documents
                WHERE octet_length(encode(text)) = length(text))""",
    // the 16 thumbnail positions are the same compile-time constants
    // the Spark side samples (8x8 grid, nearest-neighbor (2i, 2j))
    "mm_resize" -> {
      val picks = ThumbPositions
        .map(p => s"substr(f, $p, 1)").mkString("concat(", ", ", ")")
      s"""SELECT doc_id, frame_no, md5($picks) AS thumb_md5
          FROM (SELECT doc_id,
                  substring(text, frame_no * $FrameBytes + 1, $FrameBytes) AS f,
                  frame_no
                FROM (SELECT doc_id, text,
                        unnest(range(0, octet_length(encode(text)) // $FrameBytes,
                                     $FrameEvery)) AS frame_no
                      FROM documents
                      WHERE octet_length(encode(text)) = length(text)))"""
    },
  )
}
