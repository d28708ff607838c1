package graft

import org.apache.spark.sql.functions._
import graft.operators.Audio

/** Real-codec audio path: WAV encode/decode round-trips through
  * javax.sound.sampled with exact-integer expected features — the
  * audio sibling of MultimodalSpec's image round-trip. */
class AudioSpec extends SparkTestBase {
  import spark.implicits._

  test("encodeWav emits genuine RIFF/WAVE byte streams") {
    val ids = (0L until 20L).toDF("doc_id")
    val out = Audio.encodeWav(spark, ids.toDF(), "doc_id", batchSize = 8)
      .collect().sortBy(_.id)
    assert(out.length == 20)
    out.foreach { a =>
      assert(new String(a.payload.take(4), "US-ASCII") == "RIFF")
      assert(new String(a.payload.slice(8, 12), "US-ASCII") == "WAVE")
    }
  }

  test("canonical WAV writer is byte-identical to AudioSystem; parser round-trips and declines foreign layouts") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    (0L until 12L).foreach { id =>
      val pcm = Audio.syntheticPcm(id)
      val bytes = new Array[Byte](pcm.length * 2)
      pcm.indices.foreach { k =>
        bytes(2 * k) = (pcm(k) & 0xff).toByte
        bytes(2 * k + 1) = ((pcm(k) >> 8) & 0xff).toByte
      }
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(bytes), new AudioFormat(8000f, 16, 1, true, false),
        pcm.length), AudioFileFormat.Type.WAVE, bos)
      val jdk = bos.toByteArray
      val fast = Audio.encodeCanonicalWav(bytes, 8000)
      assert(java.util.Arrays.equals(jdk, fast), s"id $id: writer bytes diverge")
      // parser agrees with the container it just wrote
      val Some((rate, off, n)) = Audio.parsePcm16MonoLe(fast)
      assert(rate == 8000 && n == pcm.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(fast, off, off + 2 * n), bytes))
    }
    // foreign layouts decline (→ AudioSystem fallback), malformed declines
    def wavOf(fmt: AudioFormat, frames: Int, bpf: Int): Array[Byte] = {
      val data = new Array[Byte](frames * bpf)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(data), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Audio.parsePcm16MonoLe(
      wavOf(new AudioFormat(8000f, 8, 1, false, false), 40, 1)).isEmpty, "8-bit")
    assert(Audio.parsePcm16MonoLe(
      wavOf(new AudioFormat(8000f, 16, 2, true, false), 40, 4)).isEmpty, "stereo")
    assert(Audio.parsePcm16MonoLe(Array[Byte](1, 2, 3)).isEmpty, "garbage")
    assert(Audio.parsePcm16MonoLe(
      "RIFF0000WAVEdata".getBytes ++ new Array[Byte](64)).isEmpty,
      "data before fmt")
    // inconsistent derived header fields decline (AudioSystem derives
    // frame size from blockAlign — an accepted blockAlign=4 header
    // would give the fast path a different sample count than the
    // fallback; both must see the same accepted-format universe)
    val good = Audio.encodeCanonicalWav(new Array[Byte](80), 8000)
    def patched(off: Int, v: Int, wide: Boolean): Array[Byte] = {
      val c = good.clone()
      c(off) = (v & 0xff).toByte; c(off + 1) = ((v >> 8) & 0xff).toByte
      if (wide) { c(off + 2) = ((v >> 16) & 0xff).toByte
        c(off + 3) = ((v >> 24) & 0xff).toByte }
      c
    }
    assert(Audio.parsePcm16MonoLe(good).isDefined, "canonical accepts")
    assert(Audio.parsePcm16MonoLe(patched(32, 4, wide = false)).isEmpty,
      "blockAlign=4 declines")
    assert(Audio.parsePcm16MonoLe(patched(28, 8000, wide = true)).isEmpty,
      "byteRate != rate*2 declines")
  }

  test("decodeAudio: format + PCM round-trip exactly; features match direct computation") {
    val ids = Seq(0L, 1L, 6L, 13L).toDF("doc_id")
    val wav = Audio.encodeWav(spark, ids.toDF(), "doc_id").toDF()
    val decoded = Audio.decodeAudio(spark, wav, "id", "payload")
      .collect().map(d => d.id -> d).toMap
    Seq(0L, 1L, 6L, 13L).foreach { id =>
      val pcm = Audio.syntheticPcm(id)
      val d = decoded(id)
      assert(d.sampleRate == 8000 && d.nSamples == pcm.length, s"id $id")
      assert(d.sumSquares == pcm.map(v => v.toLong * v).sum, s"id $id energy")
      val zc = (1 until pcm.length)
        .count(k => pcm(k - 1).toLong * pcm(k) < 0)
      assert(d.zeroCrossings == zc, s"id $id zcr")
      assert(d.peak == pcm.map(v => math.abs(v.toInt)).max, s"id $id peak")
    }
  }

  test("undecodable payloads are dropped (corrupt-blob quarantine)") {
    val good = Audio.encodeWav(spark, Seq(3L).toDF("doc_id"), "doc_id").toDF()
    val bad = Seq((99L, Array[Byte](1, 2, 3, 4))).toDF("id", "payload")
    val out = Audio.decodeAudio(spark, good.unionByName(bad), "id", "payload")
      .collect()
    assert(out.map(_.id).toSeq == Seq(3L))
  }

  test("valid WAVs in a non-16-bit-mono-LE layout are quarantined, not mis-decoded") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    // genuine RIFF streams the codec parses fine — but their sample
    // layout breaks the decoders' 16-bit mono LE integer kernels, so
    // they must take the quarantine path, not produce silent garbage
    def wav(fmt: AudioFormat, frames: Int, bytesPerFrame: Int): Array[Byte] = {
      val data = new Array[Byte](frames * bytesPerFrame)
      java.util.Arrays.fill(data, 7.toByte)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val stereo16 = wav(new AudioFormat(8000f, 16, 2, true, false), 256, 4)
    val mono8 = wav(new AudioFormat(8000f, 8, 1, false, false), 256, 1)
    val good = Audio.encodeWav(spark, Seq(1L).toDF("doc_id"), "doc_id").toDF()
    val rows = Seq((90L, stereo16), (91L, mono8)).toDF("id", "payload")
      .unionByName(good)
    assert(Audio.decodeAudio(spark, rows, "id", "payload")
      .collect().map(_.id).toSeq == Seq(1L))
    assert(Audio.envelopeHash64(spark, rows, "id", "payload")
      .collect().map(_.id).toSeq == Seq(1L))
  }

  test("q70 runs green at sf0.001 with one row per doc") {
    val out = graft.queries.LlmQueries.q70AudioDecode(spark, sf0001)
    assert(out.count() == Tables.load(spark, sf0001, "documents").count())
    // waveform amplitude never clips 16-bit: peak ≤ 60·512 < 2¹⁵
    assert(out.agg(max("peak")).head().getLong(0) <= 30720L)
  }

  test("envelopeHash64: gain-invariant, content-discriminating, recovers planted re-gained copies") {
    import spark.implicits._
    // same content key under three different gains → identical hash;
    // different keys → different hashes
    val rows = Seq((1L, 7L, 20), (2L, 7L, 25), (3L, 7L, 30), (4L, 8L, 20))
      .toDF("id", "key", "gain")
    val wav = Audio.encodeWavKeyed(spark, rows, "id", "key", "gain").toDF()
    val h = Audio.envelopeHash64(spark, wav, "id", "payload")
      .collect().map(a => a.id -> a.ehash).toMap
    assert(h(1L) == h(2L) && h(2L) == h(3L),
      "a volume change must not move the envelope hash")
    assert(h(1L) != h(4L), "different content must hash differently")
    // byte-level: the re-gained copy really shares no bytes
    val payloads = wav.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(payloads(1L), payloads(2L)))

    // files shorter than the 64-window envelope are quarantined, not
    // hashed on garbage windows
    val short = {
      val pcm = Array.fill[Byte](40 * 2)(1) // 40 samples < 64
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, 40),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val dropped = Audio.envelopeHash64(spark,
      Seq((42L, short)).toDF("id", "payload"), "id", "payload").collect()
    assert(dropped.isEmpty)

    // q78 at sf0.001: keys 0..99 occur twice ({k, k+400}, the copy
    // gain-shifted), keys 100..399 once → exactly 100 dup groups
    val groups = graft.queries.LlmQueries.q78AudioDedup(spark, sf0001).collect()
    assert(groups.length == 100)
    groups.foreach { g =>
      val keep = g.getLong(1)
      assert(g.getLong(2) == 2L && g.getLong(3) == keep + 400)
    }
  }
}
