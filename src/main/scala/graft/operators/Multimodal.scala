package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{ImageIO, ImageReader}
import javax.imageio.stream.MemoryCacheImageInputStream

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with batched per-partition decode stages.
  *
  * Image decode, resize, and pixel statistics are REAL — the JDK ships
  * PNG/JPEG codecs in `javax.imageio`, so no external library is
  * needed. The Spark-side shape is the operator: binary columns with
  * typed metadata, partition-local batched codec work (never on the
  * driver, never through a shuffle — decode is embarrassingly
  * parallel, so the ONLY design question at 100 TB is keeping the
  * bytes out of the exchange, which mapPartitions guarantees), and
  * deterministic output a correctness oracle can replay. Video
  * frame-sampling is real over an MJPEG-style intra-coded stream
  * ([[frameSample]]): the container is a concatenation of
  * self-delimiting PNG frames (lossless, so decoded statistics stay
  * oracle-exact) and the demuxer genuinely walks the PNG chunk grammar
  * — signature, then length-prefixed chunks to IEND — to find frame
  * boundaries. What the JDK still lacks is an INTER-frame codec
  * (MP4/MKV/H.264), so motion-compensated streams stay out of scope;
  * intra-only streams (MJPEG's shape) are fully handled.
  */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes standing in for
    * an encoded image/audio blob) + extracted metadata. */
  def withBinaryMeta(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("n_bytes", length(col("payload")).cast("bigint"))
      .withColumn("magic8", lower(substring(hex(col("payload")), 1, 8)))
      .withColumn("est_chunks", expr("(n_bytes + 255) div 256"))

  case class EncodedImage(id: Long, payload: Array[Byte])

  case class DecodedImage(id: Long, width: Int, height: Int,
      nChannels: Int, channelMeans: Array[Double], pixelSum: Long)

  case class ResizedImage(id: Long, srcW: Int, srcH: Int, dstW: Int,
      dstH: Int, pixels: Array[Double])

  case class SampledFrame(id: Long, frameIdx: Int, offset: Long,
      frame: Array[Byte])

  case class DecodedFrame(id: Long, frameIdx: Int, width: Int, height: Int,
      nChannels: Int, channelMeans: Array[Double], pixelSum: Long)

  // PNG encode is [[FastPng.encode]] (r10): the reused-ImageWriter
  // path this file carried before still cost ~23 µs/frame of ImageIO
  // machinery on 32–72-pixel frames; the canonical filter-0 writer is
  // a real PNG (ImageIO pixel-equality asserted in MultimodalSpec)
  // with none of it.

  /** Batch-scoped image decoder with reused per-format readers:
    * dispatches on the payload's magic bytes (PNG/JPEG/GIF/BMP/TIFF —
    * the formats the JDK ships) instead of `ImageIO.read`'s per-call
    * registry sniff + reader allocation (measured: 77 µs/frame → 13 µs
    * with reuse). Unknown magic falls back to `ImageIO.read`, so the
    * accepted-format set is exactly ImageIO's. Returns null for
    * undecodable bytes (the quarantine signal). */
  private final class ReusedDecoder {
    private val cache = scala.collection.mutable.Map.empty[String, ImageReader]
    private def formatOf(b: Array[Byte]): String =
      if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
      else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
      else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
      else if (b.length >= 2 && ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))) "tiff"
      else null
    def read(bytes: Array[Byte]): BufferedImage = {
      if (bytes == null || bytes.length < 2) return null
      val fmt = formatOf(bytes)
      if (fmt == "png") {
        // canonical-subset fast path (8-bit RGB, non-interlaced, all
        // five scanline filters); null → the reader below, so the
        // accepted universe stays exactly ImageIO's
        val fast = FastPng.decode(bytes)
        if (fast != null) return fast
      }
      if (fmt == null)
        return try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      val reader = cache.getOrElseUpdate(fmt, {
        val it = ImageIO.getImageReadersByFormatName(fmt)
        if (it.hasNext) it.next() else null
      })
      if (reader == null) return null
      val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        reader.read(0)
      } catch { case _: Exception => null }
      finally {
        reader.reset()
        iis.close()
      }
    }
    def dispose(): Unit = {
      cache.valuesIterator.foreach(r => if (r != null) r.dispose())
      cache.clear()
    }
  }

  private def withDecoder[A](f: ReusedDecoder => A): A = {
    val d = new ReusedDecoder
    try f(d) finally d.dispose()
  }

  /** Deterministic synthetic RGB image for id: width 8 + id % 5,
    * height 4 + id % 3, R = (id·7) mod 256 (constant), G = x, B = y.
    * Every decoded statistic is therefore closed-form in id — a
    * SQL-only oracle can verify a REAL codec round-trip. */
  private[graft] def syntheticImage(id: Long): BufferedImage = {
    val w = (8 + id % 5).toInt
    val h = (4 + id % 3).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val r = ((id * 7) % 256).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (r << 16) | (x << 8) | y)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real PNG ENCODE (javax.imageio) of the per-id synthetic image:
    * partition-local, batched like a vectorized codec consumes rows.
    * Stands in for reading image blobs from a lake column — the
    * payloads are genuine PNG byte streams (`\x89PNG` magic). */
  def encodePng(spark: SparkSession, rows: Dataset[Row], idCol: String,
      batchSize: Int = 64): Dataset[EncodedImage] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map(id => EncodedImage(id, FastPng.encode(syntheticImage(id))))
        }
      }
  }

  /** Real image DECODE (javax.imageio, PNG/JPEG/BMP/GIF): batched
    * partition-local ImageIO.read of the payload bytes, emitting the
    * decoded dimensions, channel count, per-channel pixel means, and
    * the total sample sum. Rows whose bytes do not decode are dropped
    * (corrupt-blob quarantine is a filter on the decode result, the
    * same contract as [[Normalize]]'s corrupt-record path). */
  def decodeImage(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, batchSize: Int = 64): Dataset[DecodedImage] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          withDecoder { dec =>
            batch.flatMap { case (id, bytes) =>
              val img = dec.read(bytes)
              if (img == null) None
              else {
                val (w, h) = (img.getWidth, img.getHeight)
                val raster = img.getRaster
                val bands = raster.getNumBands
                val sums = new Array[Double](bands)
                var total = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    var b = 0
                    while (b < bands) {
                      val s = raster.getSample(x, y, b)
                      sums(b) += s
                      total += s
                      b += 1
                    }
                    x += 1
                  }
                  y += 1
                }
                Some(DecodedImage(id, w, h, bands,
                  sums.map(_ / (w.toLong * h)), total))
              }
            }
          }
        }
      }
  }

  /** Real RESIZE: decode, then area-average each channel onto a
    * dstW×dstH grid (each output cell averages its exact source pixel
    * box — deterministic, unlike platform-dependent Graphics2D
    * interpolation hints). Output pixels are row-major, channel-major
    * within a cell. Partition-local; no shuffle. */
  def resizeImage(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, dstW: Int = 4, dstH: Int = 4,
      batchSize: Int = 64): Dataset[ResizedImage] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          withDecoder { dec =>
          batch.flatMap { case (id, bytes) =>
            val img = dec.read(bytes)
            if (img == null) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val raster = img.getRaster
              val bands = raster.getNumBands
              val out = new Array[Double](dstW * dstH * bands)
              var cy = 0
              while (cy < dstH) {
                val y0 = cy * h / dstH; val y1 = math.max((cy + 1) * h / dstH, y0 + 1)
                var cx = 0
                while (cx < dstW) {
                  val x0 = cx * w / dstW; val x1 = math.max((cx + 1) * w / dstW, x0 + 1)
                  var b = 0
                  while (b < bands) {
                    var s = 0.0; var n = 0
                    var y = y0
                    while (y < math.min(y1, h)) {
                      var x = x0
                      while (x < math.min(x1, w)) {
                        s += raster.getSample(x, y, b); n += 1; x += 1
                      }
                      y += 1
                    }
                    out((cy * dstW + cx) * bands + b) = s / math.max(n, 1)
                    b += 1
                  }
                  cx += 1
                }
                cy += 1
              }
              Some(ResizedImage(id, w, h, dstW, dstH, out))
            }
          }
          }
        }
      }
  }

  case class ImageHash(id: Long, dhash: Long)

  /** Deterministic synthetic PHOTO-LIKE image: 16×12 RGB with
    * pseudo-random per-pixel content keyed by `contentKey` (two ids
    * sharing a key have pixel-identical content), plus a flat
    * `brightness` offset. Channel values stay in [0, 200+brightness] —
    * no clipping, so a brightness shift preserves every pixel GRADIENT
    * exactly: the dHash-invariance property real near-dup images
    * (re-exposures, re-encodes) exhibit. Unlike [[syntheticImage]]'s
    * monotone x/y gradients (whose dHash degenerates to all-ones),
    * this content exercises every bit. */
  private[graft] def syntheticPhoto(contentKey: Long, brightness: Int): BufferedImage = {
    val (w, h) = (16, 12)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(b: Int): Int = {
          val m = contentKey * 2654435761L + x * 40503L + y * 65537L + b * 97L
          (((m ^ (m >>> 13)) % 200 + 200) % 200).toInt + brightness
        }
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode the per-id synthetic PHOTO as real PNG bytes; `contentKey`
    * and `brightness` are column expressions so callers plant duplicate
    * groups (same key) and perceptual-but-not-byte duplicates
    * (brightness-shifted re-exposures). */
  def encodePhotoPng(spark: SparkSession, rows: Dataset[Row], idCol: String,
      contentKeyCol: String, brightnessCol: String,
      batchSize: Int = 64): Dataset[EncodedImage] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(contentKeyCol).cast("long"),
        col(brightnessCol).cast("int")).as[(Long, Long, Int)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, key, bright) =>
            EncodedImage(id, FastPng.encode(syntheticPhoto(key, bright)))
          }
        }
      }
  }

  /** Perceptual difference hash (dHash): decode → grayscale (band
    * mean) → area-average onto a 9×8 grid → 64 bits, bit (x,y) = 1
    * iff gray(x+1,y) > gray(x,y). Robust to re-encoding, uniform
    * brightness shifts, and mild rescaling — the properties that make
    * it the standard first pass of image dedup (byte/md5 equality
    * catches none of those). Partition-local like every codec stage;
    * the 8-byte hash is all that ever reaches an exchange, so the
    * downstream dedup (exact groupBy, or banded Hamming via the
    * [[SimHash]] machinery) shuffles 8 bytes per image, not pixels. */
  def dHash64(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, batchSize: Int = 64): Dataset[ImageHash] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          withDecoder { dec =>
          batch.flatMap { case (id, bytes) =>
            val img = dec.read(bytes)
            if (img == null) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val raster = img.getRaster
              val bands = raster.getNumBands
              // integer box sums + cross-multiplied comparisons: the
              // hash is computed in EXACT arithmetic, so a tie between
              // adjacent boxes stays a tie under any uniform brightness
              // shift (with double means, FP rounding of the shifted
              // sums flips near-tie bits — observed on ~7% of random
              // test images, since integer box sums collide at ~1/10³
              // per adjacent pair)
              val (gw, gh) = (9, 8)
              val sums = new Array[Long](gw * gh)
              val cnts = new Array[Long](gw * gh)
              var cy = 0
              while (cy < gh) {
                val y0 = cy * h / gh; val y1 = math.max((cy + 1) * h / gh, y0 + 1)
                var cx = 0
                while (cx < gw) {
                  val x0 = cx * w / gw; val x1 = math.max((cx + 1) * w / gw, x0 + 1)
                  var s = 0L; var n = 0L
                  var y = y0
                  while (y < math.min(y1, h)) {
                    var x = x0
                    while (x < math.min(x1, w)) {
                      var b = 0
                      while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
                      n += 1; x += 1
                    }
                    y += 1
                  }
                  sums(cy * gw + cx) = s; cnts(cy * gw + cx) = math.max(n, 1L)
                  cx += 1
                }
                cy += 1
              }
              var bits = 0L
              var i = 0
              while (i < 64) {
                val a = (i / 8) * gw + (i % 8)
                // mean(a+1) > mean(a) ⇔ sum(a+1)·n(a) > sum(a)·n(a+1)
                if (sums(a + 1) * cnts(a) > sums(a) * cnts(a + 1))
                  bits |= (1L << i)
                i += 1
              }
              Some(ImageHash(id, bits))
            }
          }
          }
        }
      }
  }

  /** Deterministic synthetic video frame f of id's video: dimensions
    * are constant across a video's frames (as real codecs require),
    * content is closed-form in (id, f) — R = (id·7 + f·11) mod 256
    * constant, G = x, B = y — so per-frame decoded statistics are
    * SQL-expressible, the [[syntheticImage]] discipline per frame. */
  private[graft] def syntheticVideoFrame(id: Long, f: Int): BufferedImage = {
    val w = (8 + id % 5).toInt
    val h = (4 + id % 3).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val r = ((id * 7 + f * 11L) % 256).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (r << 16) | (x << 8) | y)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real video ENCODE: the per-id synthetic video — 6 + id mod 5
    * frames — as an MJPEG-style intra-coded stream, each frame a
    * complete PNG byte stream (lossless, so the decode oracle is
    * bit-exact), frames concatenated back-to-back. PNG streams are
    * self-delimiting (signature + length-prefixed chunks to IEND), so
    * the concatenation needs no index header to demux — the same
    * property MJPEG exploits with JPEG's marker structure. */
  def encodeVideo(spark: SparkSession, rows: Dataset[Row], idCol: String,
      batchSize: Int = 64): Dataset[EncodedImage] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val bos = new ByteArrayOutputStream()
            val nFrames = (6 + id % 5).toInt
            var f = 0
            while (f < nFrames) {
              bos.write(FastPng.encode(syntheticVideoFrame(id, f)))
              f += 1
            }
            EncodedImage(id, bos.toByteArray)
          }
        }
      }
  }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Walk ONE PNG stream starting at `off` through the real chunk
    * grammar — 8-byte signature, then (4-byte big-endian length,
    * 4-byte type, data, 4-byte CRC) chunks until IEND — and return the
    * end offset, or -1 if the bytes are not a well-formed PNG (the
    * demux quarantine signal). */
  private[graft] def pngStreamEnd(bytes: Array[Byte], off: Int): Int = {
    if (off + 8 > bytes.length) return -1
    var i = 0
    while (i < 8) {
      if ((bytes(off + i) & 0xff) != PngSig(i)) return -1
      i += 1
    }
    var p = off + 8
    while (p + 8 <= bytes.length) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      if (len < 0) return -1
      val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
        bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
      val next = p + 8L + len + 4L
      if (next > bytes.length) return -1
      p = next.toInt
      if (isEnd) return p
    }
    -1
  }

  /** Real frame-sampling: DEMUX the intra-coded stream by walking each
    * frame's PNG chunk grammar to its IEND (genuine container parsing —
    * no fixed strides, no index header), then emit every `stride`-th
    * frame with its true byte offset. A malformed frame quarantines the
    * payload's REMAINDER (everything demuxed before the corruption is
    * kept) — the per-frame analogue of the corrupt-blob contract.
    * Partition-local row → frames fan-out; payload bytes never enter a
    * shuffle, and only sampled frames are ever copied out of the
    * payload buffer. */
  def frameSample(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, stride: Int = 4): Dataset[SampledFrame] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SampledFrame]
          var off = 0
          var f = 0
          var end = pngStreamEnd(bytes, off)
          while (end > 0) {
            if (f % stride == 0)
              out += SampledFrame(id, f, off.toLong,
                java.util.Arrays.copyOfRange(bytes, off, end))
            off = end
            f += 1
            end = if (off >= bytes.length) -1 else pngStreamEnd(bytes, off)
          }
          out
        }
      }
  }

  /** Real per-frame DECODE of sampled frames: ImageIO parses each
    * frame's bytes, pixel statistics come out per (video, frame).
    * Narrow stage over [[frameSample]]'s output — the two codec stages
    * fuse into one task with no exchange between them. Undecodable
    * frames are dropped (quarantine). */
  def decodeFrames(spark: SparkSession,
      frames: Dataset[SampledFrame], batchSize: Int = 64): Dataset[DecodedFrame] = {
    import spark.implicits._
    frames.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        withDecoder { dec =>
        batch.flatMap { sf =>
          val img = dec.read(sf.frame)
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            val bands = raster.getNumBands
            val sums = new Array[Double](bands)
            var total = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var b = 0
                while (b < bands) {
                  val s = raster.getSample(x, y, b)
                  sums(b) += s
                  total += s
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            Some(DecodedFrame(sf.id, sf.frameIdx, w, h, bands,
              sums.map(_ / (w.toLong * h)), total))
          }
        }
        }
      }
    }
  }

  // --------------------------------------------------------------------
  // INTER-frame (delta-coded) video — the motion-compensated family.
  // --------------------------------------------------------------------

  case class InterFrame(id: Long, frameIdx: Int, width: Int, height: Int,
      channelMeans: Array[Double], pixelSum: Long)

  /** GDV1 container magic. */
  private val GdvMagic = Array[Byte]('G', 'D', 'V', '1')

  /** Real INTER-frame video encode — the motion-compensated codec
    * family (H.264-class) in its essential structure, built from
    * public primitives only: a GOP starts with an I-frame (a complete
    * PNG through the real `javax.imageio` codec) and continues with
    * P-frames that store ONLY the per-channel pixel DELTAS against the
    * previous frame, Deflate-compressed (`java.util.zip` — the real
    * DEFLATE, not a stand-in). Container grammar is self-describing:
    * 4-byte magic, then per frame a 1-byte type ('I'/'P'), a 4-byte
    * big-endian payload length, and the payload. Deltas are mod-256
    * exact, so reconstruction is LOSSLESS — the same property that let
    * q71's intra oracle be bit-exact carries over.
    *
    * Same synthetic frame content as [[encodeVideo]] (closed-form in
    * (id, frame)), so the two containers hold identical videos and the
    * inter path's reconstructed statistics are SQL-checkable. */
  def encodeVideoInter(spark: SparkSession, rows: Dataset[Row], idCol: String,
      gop: Int = 4, batchSize: Int = 64): Dataset[EncodedImage] = {
    import spark.implicits._
    require(gop >= 1, s"gop must be >= 1, got $gop")
    rows.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val defl = new java.util.zip.Deflater(
            java.util.zip.Deflater.BEST_SPEED)
          try batch.map { id =>
            val bos = new ByteArrayOutputStream()
            bos.write(GdvMagic)
            val nFrames = (6 + id % 5).toInt
            var prev: Array[Byte] = null
            var f = 0
            while (f < nFrames) {
              val img = syntheticVideoFrame(id, f)
              val cur = rgbBytes(img)
              val (tpe, payload) =
                if (f % gop == 0) ('I'.toByte, FastPng.encode(img))
                else ('P'.toByte, deflate(defl, deltaBytes(prev, cur)))
              bos.write(tpe)
              bos.write((payload.length >>> 24) & 0xff)
              bos.write((payload.length >>> 16) & 0xff)
              bos.write((payload.length >>> 8) & 0xff)
              bos.write(payload.length & 0xff)
              bos.write(payload)
              prev = cur
              f += 1
            }
            EncodedImage(id, bos.toByteArray)
          } finally defl.end()
        }
      }
  }

  /** Row-major RGB bytes of a decoded frame (3 bytes per pixel). */
  private def rgbBytes(img: BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte]((w * h * 3).toInt)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        out(i) = ((p >> 16) & 0xff).toByte
        out(i + 1) = ((p >> 8) & 0xff).toByte
        out(i + 2) = (p & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }

  private def deltaBytes(prev: Array[Byte], cur: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](cur.length)
    var i = 0
    while (i < cur.length) {
      out(i) = ((cur(i) - prev(i)) & 0xff).toByte
      i += 1
    }
    out
  }

  // Deflater/Inflater wrap NATIVE zlib streams — allocating one per
  // frame (40 M+ at the x100 tier: ~5 M videos × ~8 frames) pays a
  // native init/end round-trip and a finalizer-registered object per
  // frame. Callers allocate ONE per batch (the withDecoder lifecycle)
  // and these helpers reset() it per frame instead.
  private def deflate(d: java.util.zip.Deflater,
      bytes: Array[Byte]): Array[Byte] = {
    d.reset()
    d.setInput(bytes); d.finish()
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    bos.toByteArray
  }

  private def inflate(inf: java.util.zip.Inflater,
      bytes: Array[Byte], expected: Int): Array[Byte] = {
    inf.reset()
    try {
      inf.setInput(bytes)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput()) return null // truncated
        off += n
      }
      if (off == expected && inf.getRemaining == 0) out else null
    } catch { case _: java.util.zip.DataFormatException => null }
  }

  /** INTER-frame sampling: emit every `stride`-th frame's statistics —
    * but unlike [[frameSample]], skipping is impossible: a P-frame is
    * meaningless without every frame since its GOP's I-frame, so the
    * demux RECONSTRUCTS state sequentially (decode the I-frame through
    * the real codec, inflate + mod-256-accumulate each delta) and only
    * the EMIT is strided. This is exactly why motion-compensated
    * streams resist cheap frame sampling — made concrete and testable
    * instead of hand-waved ("decode cost is ~all frames, emit cost is
    * the stride"). Work stays partition-local; payload bytes never
    * shuffle; only per-frame statistics leave the task.
    *
    * Corruption quarantines the payload REMAINDER (frames
    * reconstructed before the bad byte are kept — the q71 contract):
    * bad magic → no frames; a torn header, a non-PNG I-frame, an
    * inflate failure, or a wrong-length delta all stop the walk. */
  def sampleFramesInter(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, stride: Int = 2,
      batchSize: Int = 64): Dataset[InterFrame] = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          withDecoder { dec =>
            val infl = new java.util.zip.Inflater()
            try batch.flatMap { case (id, bytes) =>
              val out = scala.collection.mutable.ArrayBuffer.empty[InterFrame]
              var ok = bytes.length >= 4 &&
                bytes(0) == 'G' && bytes(1) == 'D' &&
                bytes(2) == 'V' && bytes(3) == '1'
              var off = 4
              var f = 0
              var prev: Array[Byte] = null
              var w = 0
              var h = 0
              while (ok && off < bytes.length) {
                if (off + 5 > bytes.length) ok = false
                else {
                  val tpe = bytes(off)
                  val len = ((bytes(off + 1) & 0xff) << 24) |
                    ((bytes(off + 2) & 0xff) << 16) |
                    ((bytes(off + 3) & 0xff) << 8) | (bytes(off + 4) & 0xff)
                  val start = off + 5
                  // long arithmetic: a hostile 4-byte length near
                  // Int.MaxValue would overflow `start + len` negative
                  // and slip past an int bounds check
                  if (len < 0 || start.toLong + len > bytes.length) ok = false
                  else {
                    val payload = java.util.Arrays.copyOfRange(bytes, start, start + len)
                    tpe match {
                      case 'I' =>
                        val img = dec.read(payload)
                        if (img == null) ok = false
                        else {
                          w = img.getWidth; h = img.getHeight
                          prev = rgbBytes(img)
                        }
                      case 'P' =>
                        if (prev == null) ok = false
                        else {
                          val delta = inflate(infl, payload, w * h * 3)
                          if (delta == null) ok = false
                          else {
                            var i = 0
                            while (i < prev.length) {
                              prev(i) = ((prev(i) + delta(i)) & 0xff).toByte
                              i += 1
                            }
                          }
                        }
                      case _ => ok = false
                    }
                    if (ok) {
                      if (f % stride == 0) {
                        val sums = new Array[Long](3)
                        var i = 0
                        while (i < prev.length) {
                          sums(i % 3) += prev(i) & 0xff
                          i += 1
                        }
                        out += InterFrame(id, f, w, h,
                          sums.map(_.toDouble / (w.toLong * h)),
                          sums.sum)
                      }
                      off = start + len
                      f += 1
                    }
                  }
                }
              }
              out
            } finally infl.end()
          }
        }
      }
  }
}
