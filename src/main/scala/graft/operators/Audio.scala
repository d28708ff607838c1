package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-column plumbing: opaque WAV payloads + decoded per-file
  * features, the audio sibling of [[Multimodal]]'s image path.
  *
  * Encode and decode are REAL — the JDK ships the RIFF/WAV codec in
  * `javax.sound.sampled` (`AudioSystem.write`/`getAudioInputStream`),
  * so like the image path no external library is needed. The Spark
  * shape is identical to every codec stage: batched partition-local
  * mapPartitions, payload bytes never enter a shuffle, only the small
  * decoded feature row does.
  *
  * The synthetic waveform is an integer SAWTOOTH, not a sine: every
  * sample is exact integer arithmetic in doc id and sample index, so a
  * SQL-only oracle replays the full encode→decode→feature pipeline
  * bit-for-bit (a sine's `round(A·sin(x))` is hostage to last-ulp
  * differences between libm implementations; integer arithmetic is
  * not — the same reasoning as [[Multimodal.dHash64]]'s integer box
  * sums).
  */
object Audio {

  case class EncodedAudio(id: Long, payload: Array[Byte])

  /** The sample layout both decoders' integer kernels assume: signed
    * 16-bit mono little-endian PCM. A VALID WAV in any other layout
    * (8-bit, stereo, big-endian, float) would silently produce wrong
    * features/hashes if fed to the `data.length/2` + manual-LE
    * assembly below — so format mismatch is treated exactly like an
    * undecodable payload and the row is quarantine-dropped. */
  private def is16BitMonoLePcm(fmt: AudioFormat): Boolean =
    fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian

  case class DecodedAudio(id: Long, sampleRate: Int, nSamples: Int,
      sumSquares: Long, zeroCrossings: Int, peak: Int)

  // ---- canonical RIFF/WAVE fast path -------------------------------------
  // javax.sound's AudioSystem routes every write/read through a GLOBAL
  // provider registry whose lookup contends across threads — measured
  // r10: 5000 tiny encode+decode round-trips take 0.59 s on ONE thread
  // but 1.25 s across 32 (parallelism inverted by the registry lock).
  // The canonical 44-byte PCM WAV container is public-spec trivial:
  //   - encodeCanonicalWav emits exactly the canonical header + LE
  //     sample bytes (byte-identical to the JDK writer's output for
  //     this format — asserted in AudioSpec);
  //   - parsePcm16MonoLe walks the real chunk grammar (RIFF header,
  //     fmt, data, skipping unknown chunks incl. pad bytes) and
  //     accepts ONLY the exact layout the integer kernels assume,
  //     returning None for everything else — callers then fall back to
  //     AudioSystem, so the accepted-format universe and the
  //     quarantine behavior are UNCHANGED.

  private def u32le(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
    b(p + 2) = ((v >> 16) & 0xff).toByte; b(p + 3) = ((v >> 24) & 0xff).toByte
  }
  private def u16le(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
  }
  private def rdU32le(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def rdU16le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  /** Canonical 16-bit mono PCM WAV bytes for the given little-endian
    * sample bytes. */
  private[graft] def encodeCanonicalWav(pcmLe: Array[Byte],
      sampleRate: Int): Array[Byte] = {
    val out = new Array[Byte](44 + pcmLe.length)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    u32le(out, 4, 36 + pcmLe.length)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    u32le(out, 16, 16) // PCM fmt chunk length
    u16le(out, 20, 1) // audio format: PCM
    u16le(out, 22, 1) // channels: mono
    u32le(out, 24, sampleRate)
    u32le(out, 28, sampleRate * 2) // byte rate
    u16le(out, 32, 2) // block align
    u16le(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    u32le(out, 40, pcmLe.length)
    System.arraycopy(pcmLe, 0, out, 44, pcmLe.length)
    out
  }

  /** Parse a WAV payload IF it is 16-bit mono LE PCM: walks the RIFF
    * chunk grammar to the fmt and data chunks. Returns (sampleRate,
    * dataOffset, nSamples) without copying, or None for any other
    * layout / malformed container (caller falls back to AudioSystem). */
  private[graft] def parsePcm16MonoLe(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var p = 12
    var rate = -1
    while (p + 8 <= b.length) {
      val len = rdU32le(b, p + 4)
      if (len < 0 || len > Int.MaxValue - 8) return None
      val body = p + 8
      if (body + len > b.length) return None
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ') {
        if (len < 16) return None
        // PCM(1), mono, 16-bit — anything else → None (fallback path).
        // Also require the DERIVED fields to be consistent
        // (blockAlign == 2, byteRate == rate·2): AudioSystem derives
        // frame size from blockAlign, so accepting an inconsistent
        // header here would make the fast path disagree with the
        // fallback on sample count instead of deferring to it.
        if (rdU16le(b, body) != 1 || rdU16le(b, body + 2) != 1 ||
          rdU16le(b, body + 14) != 16) return None
        if (rdU16le(b, body + 12) != 2) return None
        rate = rdU32le(b, body + 4).toInt
        if (rdU32le(b, body + 8) != rate.toLong * 2L) return None
      } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' &&
          b(p + 3) == 'a') {
        if (rate < 0) return None // fmt must precede data
        return Some((rate, body, (len / 2).toInt))
      }
      p = body + len.toInt + (len.toInt & 1) // chunks pad to even length
    }
    None
  }

  /** Period divisor of the synthetic sawtooth (also used as the scale
    * denominator): v(k) = A·(2·((k·f) mod P) − P), |v| ≤ A·P. */
  val Period = 512

  /** Deterministic synthetic 16-bit mono PCM sawtooth for id:
    * n = 400 + (id mod 5)·100 samples, frequency multiplier
    * f = 3 + id mod 7, amplitude factor A = 40 + (id mod 3)·10
    * (|v| ≤ 60·512 = 30720 < 2¹⁵ — no clipping). Every decoded
    * statistic is closed-form integer arithmetic in id. */
  private[graft] def syntheticPcm(id: Long): Array[Short] = {
    val n = (400 + (id % 5) * 100).toInt
    val f = (3 + id % 7).toInt
    val a = (40 + (id % 3) * 10).toInt
    Array.tabulate(n) { k =>
      val m = (k.toLong * f % Period).toInt
      (a * (2 * m - Period)).toShort
    }
  }

  /** Real WAV ENCODE (javax.sound.sampled) of the per-id synthetic
    * waveform: 8 kHz, 16-bit, mono, little-endian — genuine RIFF byte
    * streams (`RIFF….WAVE` magic), batched partition-local. */
  def encodeWav(spark: SparkSession, rows: Dataset[Row], idCol: String,
      batchSize: Int = 64): Dataset[EncodedAudio] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val pcm = syntheticPcm(id)
            val bytes = new Array[Byte](pcm.length * 2)
            var k = 0
            while (k < pcm.length) {
              bytes(2 * k) = (pcm(k) & 0xff).toByte
              bytes(2 * k + 1) = ((pcm(k) >> 8) & 0xff).toByte
              k += 1
            }
            // canonical writer — byte-identical to AudioSystem's WAVE
            // output for this format (AudioSpec), without its
            // cross-thread registry contention
            EncodedAudio(id, encodeCanonicalWav(bytes, 8000))
          }
        }
      }
  }

  case class AudioHash(id: Long, ehash: Long)

  /** Synthetic CONTENT-KEYED PCM: waveform params derive from
    * `contentKey` (two ids sharing a key have the same waveform up to
    * gain), the GAIN from the caller — so planted re-gained copies
    * share no bytes with their originals. A MIXTURE of two sawtooths
    * with independent key-derived frequencies and phases (37, 73 ⊥
    * 512, so distinct keys → distinct phase pairs): one pure sawtooth
    * has a near-flat energy envelope whose gradient bits carry little
    * content entropy — the two-component beat pattern makes the
    * envelope content-specific. |v| ≤ 2·512·gain, so gains ≤ 30 stay
    * inside 16 bits. */
  private[graft] def syntheticPcmKeyed(contentKey: Long, gain: Int): Array[Short] = {
    val n = (400 + (contentKey % 5) * 100).toInt
    val f1 = (3 + contentKey % 7).toInt
    val f2 = (5 + contentKey % 11).toInt
    val p1 = ((contentKey * 37) % Period).toInt
    val p2 = ((contentKey * 73) % Period).toInt
    Array.tabulate(n) { k =>
      val m1 = ((k.toLong * f1 + p1) % Period).toInt
      val m2 = ((k.toLong * f2 + p2) % Period).toInt
      (gain * ((2 * m1 - Period) + (2 * m2 - Period))).toShort
    }
  }

  /** Real WAV encode of the content-keyed family; `keyCol`/`gainCol`
    * are column expressions so callers plant duplicate groups (same
    * key) and volume-shifted re-encodes (different gain) — the audio
    * analogue of [[Multimodal.encodePhotoPng]]. */
  def encodeWavKeyed(spark: SparkSession, rows: Dataset[Row], idCol: String,
      keyCol: String, gainCol: String, batchSize: Int = 64): Dataset[EncodedAudio] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(keyCol).cast("long"),
        col(gainCol).cast("int")).as[(Long, Long, Int)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, key, gain) =>
            val pcm = syntheticPcmKeyed(key, gain)
            val bytes = new Array[Byte](pcm.length * 2)
            var k = 0
            while (k < pcm.length) {
              bytes(2 * k) = (pcm(k) & 0xff).toByte
              bytes(2 * k + 1) = ((pcm(k) >> 8) & 0xff).toByte
              k += 1
            }
            EncodedAudio(id, encodeCanonicalWav(bytes, 8000))
          }
        }
      }
  }

  /** Perceptual audio fingerprint: a VOLUME-INVARIANT energy-envelope
    * gradient hash — the audio sibling of [[Multimodal.dHash64]].
    * Decode (real codec) → 64 window energy sums in exact integer
    * arithmetic (window of sample k is k·64/n, the area-bucketing
    * discipline) → 63 bits, bit w = 1 iff e(w+1) > e(w).
    *
    * Volume invariance is EXACT, not approximate: a gain change scales
    * every sample by g, so every window energy scales by g² and every
    * comparison — including ties — is preserved (for the synthetic
    * family, e_w = a²·s_w with s_w amplitude-free). A re-encoded or
    * re-gained copy that shares no bytes with the original therefore
    * lands on the identical 63-bit hash, while different content
    * diverges in the envelope. Downstream dedup shuffles 8 bytes per
    * file, never PCM. */
  def envelopeHash64(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, batchSize: Int = 64): Dataset[AudioHash] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            // fast chunk-grammar parse; non-canonical layouts fall back
            // to AudioSystem so the accepted universe is unchanged
            val parsed = parsePcm16MonoLe(bytes) match {
              case Some((_, off, n)) => Some((bytes, off, n))
              case None => decodeViaAudioSystem(bytes).map {
                case (_, data) => (data, 0, data.length / 2)
              }
            }
            parsed.flatMap { case (data, off, n) =>
              if (n < 64) None
              else {
                val e = new Array[Long](64)
                var k = 0
                while (k < n) {
                  val v = ((data(off + 2 * k) & 0xff) |
                    (data(off + 2 * k + 1) << 8)).toShort.toLong
                  e((k.toLong * 64 / n).toInt) += v * v
                  k += 1
                }
                var bits = 0L
                var w = 0
                while (w < 63) {
                  if (e(w + 1) > e(w)) bits |= (1L << w)
                  w += 1
                }
                Some(AudioHash(id, bits))
              }
            }
          }
        }
      }
  }

  /** AudioSystem fallback for payloads the canonical parser declines:
    * returns (sampleRate, raw 16-bit mono LE PCM bytes) or None for
    * undecodable / non-16-bit-mono-LE payloads (quarantine). */
  private def decodeViaAudioSystem(bytes: Array[Byte]): Option[(Int, Array[Byte])] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (!is16BitMonoLePcm(fmt)) None
      else Some((fmt.getSampleRate.toInt, ais.readAllBytes()))
    } catch { case _: Exception => None }

  /** Real WAV DECODE: AudioSystem parses the RIFF container and
    * format, the PCM frames are read back, and per-file features come
    * out in exact integer arithmetic — sum of squared samples (energy;
    * RMS = sqrt(sumSquares/n) downstream), strict sign-change
    * zero-crossing count, and absolute peak. Undecodable payloads are
    * dropped (the corrupt-blob quarantine contract). */
  def decodeAudio(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, batchSize: Int = 64): Dataset[DecodedAudio] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            val parsed = parsePcm16MonoLe(bytes) match {
              case Some((rate, off, n)) => Some((rate, bytes, off, n))
              case None => decodeViaAudioSystem(bytes).map {
                case (rate, data) => (rate, data, 0, data.length / 2)
              }
            }
            parsed.map { case (rate, data, off, n) =>
              var sumSq = 0L
              var zc = 0
              var peak = 0
              var prev = 0
              var k = 0
              while (k < n) {
                val v = ((data(off + 2 * k) & 0xff) |
                  (data(off + 2 * k + 1) << 8)).toShort.toInt
                sumSq += v.toLong * v
                if (k > 0 && prev.toLong * v < 0) zc += 1
                if (math.abs(v) > peak) peak = math.abs(v)
                prev = v
                k += 1
              }
              DecodedAudio(id, rate, n, sumSq, zc, peak)
            }
          }
        }
      }
  }
}
