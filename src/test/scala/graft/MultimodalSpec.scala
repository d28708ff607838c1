package graft

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-codec multimodal path: PNG encode/decode round-trips through
  * javax.imageio with closed-form expected statistics, deterministic
  * area-average resize, and the stubbed (JDK has no demuxer) but
  * shape-real video frame sampler. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("binary metadata: byte length, magic prefix, chunk estimate") {
    val docs = Tables.load(spark, sf0001, "documents")
    val out = Multimodal.withBinaryMeta(docs, "doc_id", "text")
    val r = out.where(col("doc_id") === 0)
      .select("n_bytes", "magic8", "est_chunks").head()
    val text = docs.where(col("doc_id") === 0).select("text").head().getString(0)
    assert(r.getLong(0) == text.getBytes("UTF-8").length)
    assert(r.getString(1) ==
      text.getBytes("UTF-8").take(4).map("%02x".format(_)).mkString)
    assert(r.getLong(2) == (r.getLong(0) + 255) / 256)
  }

  test("encodePng emits genuine PNG byte streams") {
    val ids = (0L until 40L).toDF("doc_id")
    val out = Multimodal.encodePng(spark, ids.toDF(), "doc_id", batchSize = 16)
      .collect().sortBy(_.id)
    assert(out.length == 40)
    // every payload carries the PNG magic and decodes via ImageIO
    assert(out.forall(_.payload.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(out(11).payload))
    assert(img.getWidth == (8 + 11 % 5) && img.getHeight == (4 + 11 % 3))
  }

  test("FastPng: ImageIO-interoperable both directions; foreign layouts decline to fallback") {
    import graft.operators.FastPng
    import java.awt.image.BufferedImage
    val rnd = new scala.util.Random(7)
    def randomImg(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt(1 << 24))
      img
    }
    def pixels(img: BufferedImage): Seq[Int] =
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRGB(x, y) & 0xffffff
    val shapes = Seq((1, 1), (8, 4), (12, 6), (33, 1), (1, 47), (64, 64), (127, 3))
    shapes.foreach { case (w, h) =>
      val img = randomImg(w, h)
      // our writer → ImageIO reader
      val fastBytes = FastPng.encode(img)
      val viaImageIO = ImageIO.read(new java.io.ByteArrayInputStream(fastBytes))
      assert(viaImageIO != null && pixels(viaImageIO) == pixels(img), s"$w x $h enc")
      // our writer → our reader
      val viaFast = FastPng.decode(fastBytes)
      assert(viaFast != null && pixels(viaFast) == pixels(img), s"$w x $h rt")
      // ImageIO writer (its own adaptive filter choices) → our reader
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      val decoded = FastPng.decode(bos.toByteArray)
      assert(decoded != null && pixels(decoded) == pixels(img), s"$w x $h dec")
    }
    // foreign layouts → null (ImageIO fallback), never a wrong decode
    val rgba = new BufferedImage(6, 6, BufferedImage.TYPE_INT_ARGB)
    rgba.setRGB(1, 1, 0x80123456)
    val bosA = new java.io.ByteArrayOutputStream()
    ImageIO.write(rgba, "png", bosA)
    assert(FastPng.decode(bosA.toByteArray) == null, "RGBA must decline")
    val gray = new BufferedImage(5, 5, BufferedImage.TYPE_BYTE_GRAY)
    val bosG = new java.io.ByteArrayOutputStream()
    ImageIO.write(gray, "png", bosG)
    assert(FastPng.decode(bosG.toByteArray) == null, "grayscale must decline")
    assert(FastPng.decode(Array[Byte](1, 2, 3)) == null)
    // bit-flip inside IDAT → CRC mismatch → decline
    val ok = FastPng.encode(randomImg(9, 5))
    val corrupt = ok.clone(); corrupt(ok.length - 20) = (corrupt(ok.length - 20) ^ 0x7f).toByte
    assert(FastPng.decode(corrupt) == null, "corrupt payload must decline")
  }

  test("decodeImage: real ImageIO decode with closed-form channel stats") {
    val ids = (0L until 60L).toDF("doc_id")
    val png = Multimodal.encodePng(spark, ids.toDF(), "doc_id").toDF()
    val out = Multimodal.decodeImage(spark, png, "id", "payload")
      .collect().sortBy(_.id)
    assert(out.length == 60)
    out.foreach { d =>
      val (w, h) = ((8 + d.id % 5).toInt, (4 + d.id % 3).toInt)
      assert(d.width == w && d.height == h && d.nChannels == 3)
      // R constant, G = x gradient, B = y gradient
      assert(math.abs(d.channelMeans(0) - (d.id * 7 % 256)) < 1e-9)
      assert(math.abs(d.channelMeans(1) - (w - 1) / 2.0) < 1e-9)
      assert(math.abs(d.channelMeans(2) - (h - 1) / 2.0) < 1e-9)
      assert(d.pixelSum ==
        w.toLong * h * (d.id * 7 % 256) + h.toLong * (w * (w - 1) / 2) +
          w.toLong * (h * (h - 1) / 2))
    }
  }

  test("decodeImage drops undecodable payloads (corrupt-blob quarantine)") {
    val rows = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "payload")
    assert(Multimodal.decodeImage(spark, rows, "id", "payload").isEmpty)
  }

  test("resizeImage: deterministic area-average over real decoded pixels") {
    val ids = Seq(20L).toDF("doc_id") // id 20 -> 8x6, R = 140
    val png = Multimodal.encodePng(spark, ids.toDF(), "doc_id").toDF()
    val r = Multimodal.resizeImage(spark, png, "id", "payload",
      dstW = 2, dstH = 2).head()
    assert(r.srcW == 8 && r.srcH == 6 && r.pixels.length == 2 * 2 * 3)
    // each 4x3 source box: R constant 140; G averages x over the box;
    // B averages y over the box
    val expG = Seq((0 to 3), (4 to 7)).map(xs => xs.sum / 4.0)
    val expB = Seq((0 to 2), (3 to 5)).map(ys => ys.sum / 3.0)
    for (cy <- 0 until 2; cx <- 0 until 2) {
      val base = (cy * 2 + cx) * 3
      assert(math.abs(r.pixels(base) - 140.0) < 1e-9)
      assert(math.abs(r.pixels(base + 1) - expG(cx)) < 1e-9)
      assert(math.abs(r.pixels(base + 2) - expB(cy)) < 1e-9)
    }
    // running it twice yields identical pixels (no platform-dependent
    // interpolation)
    val r2 = Multimodal.resizeImage(spark, png, "id", "payload",
      dstW = 2, dstH = 2).head()
    assert(r.pixels.toSeq == r2.pixels.toSeq)
  }

  test("dHash64: invariant to re-encode and brightness shift, discriminates content, recovers planted groups") {
    // same content, one +20-brightness "re-exposure": PNG bytes differ,
    // perceptual hash does not
    val trio = Seq((1L, 7L, 0), (2L, 7L, 20), (3L, 8L, 0))
      .toDF("doc_id", "content_key", "brightness")
    val png = Multimodal.encodePhotoPng(spark, trio, "doc_id",
      "content_key", "brightness").toDF()
    val payloads = png.collect().map(r =>
      r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!payloads(1L).sameElements(payloads(2L)),
      "brightness shift must change the encoded bytes")
    val hashes = Multimodal.dHash64(spark, png, "id", "payload")
      .collect().map(h => h.id -> h.dhash).toMap
    assert(hashes(1L) == hashes(2L),
      "dHash is gradient-based — a uniform brightness shift is invisible")
    assert(hashes(1L) != hashes(3L),
      "different content must hash differently")
    // re-encoding the identical image yields identical bytes → same hash
    val again = Multimodal.encodePhotoPng(spark,
        Seq((9L, 7L, 0)).toDF("doc_id", "content_key", "brightness"),
        "doc_id", "content_key", "brightness")
      .toDF()
    val h9 = Multimodal.dHash64(spark, again, "id", "payload").head().dhash
    assert(h9 == hashes(1L))

    // q69 at sf0.001: ids 0..499 — keys 0..99 occur twice ({k, k+400},
    // the copy brightness-shifted), keys 100..399 once → exactly 100
    // dup groups, each recovered as {k, k+400} with keep-min survivor
    val groups = graft.queries.LlmQueries.q69ImageDedup(spark, sf0001)
      .collect()
    assert(groups.length == 100)
    groups.foreach { g =>
      val keep = g.getLong(1)
      assert(g.getLong(2) == 2L && g.getLong(3) == keep + 400)
    }
  }

  test("frameSample: real PNG-stream demux — every stride-th frame at true chunk-walked offsets") {
    // id 9 → 6 + 9%5 = 10 frames; stride 4 samples frames 0, 4, 8
    val video = Multimodal.encodeVideo(spark, Seq(9L).toDF("doc_id"), "doc_id")
      .toDF()
    val payload = video.head().getAs[Array[Byte]]("payload")
    val frames = Multimodal.frameSample(spark, video, "id", "payload",
      stride = 4).collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 4, 8))
    // offsets must be the REAL frame boundaries the chunk walk found:
    // each sampled frame is a complete standalone PNG starting at its
    // offset (signature present, IEND-delimited, ImageIO-decodable)
    frames.foreach { f =>
      assert(payload(f.offset.toInt) == 0x89.toByte &&
        payload(f.offset.toInt + 1) == 'P'.toByte)
      val end = Multimodal.pngStreamEnd(payload, f.offset.toInt)
      assert(end - f.offset.toInt == f.frame.length)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame))
      assert(img != null && img.getWidth == (8 + 9 % 5))
    }
    // frame offsets are strictly increasing and frame 0 starts at 0
    assert(frames.head.offset == 0L)
    assert(frames.map(_.offset).toSeq == frames.map(_.offset).toSeq.sorted)

    // decodeFrames: stats match the closed-form frame content
    // (R = (id·7 + f·11) mod 256 constant, G = x, B = y)
    val decoded = Multimodal.decodeFrames(spark,
      Multimodal.frameSample(spark, video, "id", "payload", stride = 4))
      .collect().sortBy(_.frameIdx)
    decoded.foreach { d =>
      val (w, h) = (8 + 9 % 5, 4 + 9 % 3)
      assert(d.width == w && d.height == h && d.nChannels == 3)
      assert(d.channelMeans(0) == ((9L * 7 + d.frameIdx * 11L) % 256).toDouble)
      assert(d.channelMeans(1) == (w - 1) / 2.0)
      assert(d.channelMeans(2) == (h - 1) / 2.0)
    }

    // corruption quarantines the REMAINDER: truncate mid-frame-2 —
    // frames before the corruption still demux
    val cut = java.util.Arrays.copyOfRange(payload, 0,
      Multimodal.pngStreamEnd(payload,
        Multimodal.pngStreamEnd(payload, 0)) + 10)
    val cutFrames = Multimodal.frameSample(spark,
      Seq((9L, cut)).toDF("id", "payload"), "id", "payload", stride = 1)
      .collect()
    assert(cutFrames.map(_.frameIdx).sorted.toSeq == Seq(0, 1))

    // stride past the frame count still samples frame 0 (every video
    // contributes at least its first frame); garbage payloads demux to
    // nothing rather than throwing
    val wide = Multimodal.frameSample(spark, video, "id", "payload",
      stride = 1000).collect()
    assert(wide.map(_.frameIdx).toSeq == Seq(0))
    val garbage = Multimodal.frameSample(spark,
      Seq((5L, Array.fill[Byte](64)(7))).toDF("id", "payload"),
      "id", "payload", stride = 1).collect()
    assert(garbage.isEmpty)
  }

  test("inter-frame codec: reconstruction agrees with the intra path; deltas compress; corruption quarantines the remainder") {
    import org.apache.spark.sql.functions.col
    val ids = (0L until 40L).toDF("doc_id")

    // cross-codec agreement: the delta path's reconstructed stats must
    // equal decoding the SAME frames from the intra (all-PNG) stream
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getSeq[Double](4).toList, r.getLong(5))
    val inter = Multimodal.sampleFramesInter(spark,
        Multimodal.encodeVideoInter(spark, ids, "doc_id", gop = 3).toDF(),
        "id", "payload", stride = 1)
      .toDF().select("id", "frameIdx", "width", "height", "channelMeans", "pixelSum")
      .collect().map(key).toSet
    val intra = Multimodal.decodeFrames(spark,
        Multimodal.frameSample(spark,
          Multimodal.encodeVideo(spark, ids, "doc_id").toDF(),
          "id", "payload", stride = 1))
      .toDF().select("id", "frameIdx", "width", "height", "channelMeans", "pixelSum")
      .collect().map(key).toSet
    assert(inter == intra && inter.nonEmpty,
      "inter reconstruction must equal intra decode frame-for-frame")

    // the delta stream earns its complexity: P-frames (deflated
    // deltas) make the inter container smaller than all-I intra
    val interSize = Multimodal.encodeVideoInter(spark, ids, "doc_id", gop = 4)
      .collect().map(_.payload.length.toLong).sum
    val intraSize = Multimodal.encodeVideo(spark, ids, "doc_id")
      .collect().map(_.payload.length.toLong).sum
    assert(interSize < intraSize,
      s"delta coding must compress: inter $interSize vs intra $intraSize")

    // corruption mid-stream: frames reconstructed BEFORE the bad byte
    // are kept, everything after quarantines (and a P-frame cannot
    // decode without its GOP's I-frame — garbage magic yields nothing)
    val vid = Multimodal.encodeVideoInter(spark, Seq(3L).toDF("doc_id"),
      "doc_id", gop = 4).collect().head
    val cut = vid.payload.length / 2
    val torn = java.util.Arrays.copyOfRange(vid.payload, 0, cut)
    val before = Multimodal.sampleFramesInter(spark,
      Seq((3L, torn)).toDF("id", "payload"), "id", "payload", stride = 1)
      .collect()
    assert(before.nonEmpty && before.length <
      Multimodal.sampleFramesInter(spark,
        Seq((3L, vid.payload)).toDF("id", "payload"), "id", "payload",
        stride = 1).collect().length)
    val noMagic = Multimodal.sampleFramesInter(spark,
      Seq((9L, Array.fill[Byte](64)(7))).toDF("id", "payload"),
      "id", "payload", stride = 1).collect()
    assert(noMagic.isEmpty)
  }
}
