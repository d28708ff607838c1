package graft.operators

import java.awt.image.BufferedImage
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal spec-compliant PNG codec for the 8-bit truecolor subset the
  * synthetic media pipelines live in.
  *
  * WHY (r10 profile): the codec queries are ImageIO-machinery bound —
  * ~23 µs/frame encode and ~13 µs/frame decode even with the
  * writer/reader reuse Multimodal already does, against frames of
  * 32–72 pixels. The PNG container for this subset is public-spec
  * trivial (RFC 2083: signature, IHDR, zlib IDAT of filtered
  * scanlines, IEND, CRC-32 per chunk), so:
  *
  *   - [[encode]] writes a REAL PNG — correct signature, IHDR
  *     (bit depth 8, color type 2, no interlace), one filter-0-per-row
  *     zlib IDAT, CRCs — decodable by any reader (MultimodalSpec
  *     asserts ImageIO pixel-equality);
  *   - [[decode]] walks the real chunk grammar, inflates, and
  *     reverses ALL FIVE scanline filters (None/Sub/Up/Average/Paeth),
  *     so it also reads PNGs other writers produced for this subset
  *     (ImageIO's adaptive filter choices included — asserted in
  *     MultimodalSpec); anything outside the subset — other bit
  *     depths/color types, interlace, palette, malformed chunks, CRC
  *     mismatch — returns null and the caller falls back to ImageIO,
  *     keeping the accepted-format universe exactly ImageIO's.
  *
  * Deflater/Inflater instances are thread-local (reset per payload) —
  * no per-frame allocation, no global registry, embarrassingly
  * parallel across executor threads.
  */
object FastPng {

  private val Sig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private val DeflaterLocal = new ThreadLocal[Deflater] {
    // BEST_SPEED: the payloads are opaque test media — container
    // validity matters, ratio does not
    override def initialValue(): Deflater = new Deflater(Deflater.BEST_SPEED)
  }
  private val InflaterLocal = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }
  private val CrcLocal = new ThreadLocal[CRC32] {
    override def initialValue(): CRC32 = new CRC32()
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def u32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    u32(data.length)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = CrcLocal.get()
    crc.reset(); crc.update(t); crc.update(data)
    u32(crc.getValue.toInt)
  }

  /** The packed-int pixel array of a plain TYPE_INT_RGB image (offset
    * 0, scanline stride == width), or null when the layout is anything
    * else — callers fall back to the per-pixel accessor. */
  private[graft] def directIntRgb(img: BufferedImage): Array[Int] =
    img.getRaster.getSampleModel match {
      case sm: java.awt.image.SinglePixelPackedSampleModel
        if img.getType == BufferedImage.TYPE_INT_RGB &&
          sm.getScanlineStride == img.getWidth &&
          img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferInt] &&
          img.getRaster.getDataBuffer.getOffset == 0 =>
        img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferInt].getData
      case _ => null
    }

  /** Encode an RGB image as a real PNG (8-bit truecolor, filter 0). */
  def encode(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    // raw scanlines: per row one filter byte (0) + RGB triples; read
    // the packed int buffer directly when the image is the TYPE_INT_RGB
    // layout our synthetic frames use — getRGB pays a per-pixel color
    // model dispatch that dominates 50-pixel frames
    val raw = new Array[Byte](h * (1 + 3 * w))
    val direct: Array[Int] = directIntRgb(img)
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < w) {
        val rgb = if (direct != null) direct(y * w + x) else img.getRGB(x, y)
        raw(p) = ((rgb >> 16) & 0xff).toByte
        raw(p + 1) = ((rgb >> 8) & 0xff).toByte
        raw(p + 2) = (rgb & 0xff).toByte
        p += 3
        x += 1
      }
      y += 1
    }
    val defl = DeflaterLocal.get()
    defl.reset()
    defl.setInput(raw)
    defl.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      comp.write(buf, 0, n)
    }
    val out = new java.io.ByteArrayOutputStream(comp.size() + 64)
    Sig.foreach(out.write)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // ihdr(10..12) = 0: deflate, adaptive filtering, no interlace
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", comp.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  @inline private def u32be(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  /** Decode a PNG in the 8-bit truecolor non-interlaced subset;
    * null (→ ImageIO fallback) for anything else or malformed. */
  def decode(bytes: Array[Byte]): BufferedImage = {
    if (bytes == null || bytes.length < 8 + 25) return null
    var i = 0
    while (i < 8) {
      if ((bytes(i) & 0xff) != Sig(i)) return null
      i += 1
    }
    var p = 8
    var w = -1
    var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    val crc = CrcLocal.get()
    while (!sawEnd) {
      if (p + 8 > bytes.length) return null
      val len = u32be(bytes, p)
      if (len < 0 || len > Int.MaxValue - 12) return null
      val body = p + 8
      if (body + len + 4 > bytes.length) return null
      val typ = new String(bytes, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      crc.reset(); crc.update(bytes, p + 4, 4 + len.toInt)
      if ((crc.getValue & 0xffffffffL) != u32be(bytes, body + len.toInt)) return null
      typ match {
        case "IHDR" =>
          if (len != 13) return null
          w = u32be(bytes, body).toInt
          h = u32be(bytes, body + 4).toInt
          // subset: bit depth 8, color type 2, deflate, filter method 0,
          // no interlace; sane dimensions
          if (bytes(body + 8) != 8 || bytes(body + 9) != 2 ||
            bytes(body + 10) != 0 || bytes(body + 11) != 0 ||
            bytes(body + 12) != 0 || w <= 0 || h <= 0 ||
            w.toLong * h > 64L * 1024 * 1024) return null
        case "IDAT" => idat.write(bytes, body, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      p = body + len.toInt + 4
    }
    if (w < 0 || idat.size() == 0) return null
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    val infl = InflaterLocal.get()
    infl.reset()
    infl.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, off, raw.length - off)
        if (n == 0 && infl.needsInput()) return null // truncated
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    if (off != raw.length) return null
    // reverse scanline filters in place (bpp = 3)
    var y = 0
    while (y < h) {
      val row = y * stride
      val filter = raw(row) & 0xff
      val prow = row - stride
      filter match {
        case 0 => ()
        case 1 => // Sub
          var x = 3
          while (x < stride - 1) {
            raw(row + 1 + x) = (raw(row + 1 + x) + raw(row + 1 + x - 3)).toByte
            x += 1
          }
        case 2 => // Up
          if (y > 0) {
            var x = 0
            while (x < stride - 1) {
              raw(row + 1 + x) = (raw(row + 1 + x) + raw(prow + 1 + x)).toByte
              x += 1
            }
          }
        case 3 => // Average
          var x = 0
          while (x < stride - 1) {
            val left = if (x >= 3) raw(row + 1 + x - 3) & 0xff else 0
            val up = if (y > 0) raw(prow + 1 + x) & 0xff else 0
            raw(row + 1 + x) = (raw(row + 1 + x) + ((left + up) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < stride - 1) {
            val a = if (x >= 3) raw(row + 1 + x - 3) & 0xff else 0
            val b = if (y > 0) raw(prow + 1 + x) & 0xff else 0
            val c = if (x >= 3 && y > 0) raw(prow + 1 + x - 3) & 0xff else 0
            val pa = math.abs(b - c)
            val pb = math.abs(a - c)
            val pc = math.abs(a + b - 2 * c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(row + 1 + x) = (raw(row + 1 + x) + pred).toByte
            x += 1
          }
        case _ => return null
      }
      y += 1
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    y = 0
    while (y < h) {
      val row = y * stride + 1
      var x = 0
      while (x < w) {
        val r = raw(row + 3 * x) & 0xff
        val g = raw(row + 3 * x + 1) & 0xff
        val b = raw(row + 3 * x + 2) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }
}
