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
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
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
            val bos = new ByteArrayOutputStream()
            AudioSystem.write(
              new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
                pcm.length),
              AudioFileFormat.Type.WAVE, bos)
            EncodedAudio(id, bos.toByteArray)
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
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
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
            val bos = new ByteArrayOutputStream()
            AudioSystem.write(
              new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
                pcm.length),
              AudioFileFormat.Type.WAVE, bos)
            EncodedAudio(id, bos.toByteArray)
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
            try {
              val ais = AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(bytes))
              if (!is16BitMonoLePcm(ais.getFormat)) None
              else {
              val data = ais.readAllBytes()
              val n = data.length / 2
              if (n < 64) None
              else {
                val e = new Array[Long](64)
                var k = 0
                while (k < n) {
                  val v = ((data(2 * k) & 0xff) | (data(2 * k + 1) << 8)).toShort.toLong
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
            } catch { case _: Exception => None }
          }
        }
      }
  }

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
            try {
              val ais = AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(bytes))
              val fmt = ais.getFormat
              if (!is16BitMonoLePcm(fmt)) None
              else {
              val data = ais.readAllBytes()
              val n = data.length / 2
              var sumSq = 0L
              var zc = 0
              var peak = 0
              var prev = 0
              var k = 0
              while (k < n) {
                val v = ((data(2 * k) & 0xff) | (data(2 * k + 1) << 8)).toShort.toInt
                sumSq += v.toLong * v
                if (k > 0 && prev.toLong * v < 0) zc += 1
                if (math.abs(v) > peak) peak = math.abs(v)
                prev = v
                k += 1
              }
              Some(DecodedAudio(id, fmt.getSampleRate.toInt, n, sumSq, zc, peak))
              }
            } catch { case _: Exception => None }
          }
        }
      }
  }
}
