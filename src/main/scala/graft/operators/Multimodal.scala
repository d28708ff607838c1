package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with a batched per-partition "decode" stage.
  *
  * The real decode (image/audio codecs) is STUBBED — those libraries
  * are not in this container — behind [[decodeStub]], a deterministic
  * fake. Everything Spark-side is real and tested: the binary column
  * schema, the metadata extraction as codegen'd expressions, and the
  * mapPartitions batch shape (fixed-size micro-batches per partition,
  * exactly how a vectorized decoder UDF consumes rows at scale).
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

  case class DecodedFeature(id: Long, batchOrdinal: Int, dim: Int,
      checksum: Long, features: Array[Double])

  case class ResizedImage(id: Long, srcW: Int, srcH: Int, dstW: Int,
      dstH: Int, pixels: Array[Double])

  case class SampledFrame(id: Long, frameIdx: Int, offset: Long,
      frame: Array[Byte])

  /** Batched partition-local decode stub: consumes (id, payload) rows
    * in micro-batches of `batchSize` (the shape a vectorized codec
    * wants), emits a fixed-dim feature vector derived deterministically
    * from the bytes. Swap the body for a real codec; the plumbing —
    * encoder, batching, partition-locality — is the operator. */
  def decodeStub(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, dim: Int = 8, batchSize: Int = 64): Dataset[DecodedFeature] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
          batch.map { case (id, bytes) =>
            val checksum = bytes.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L)
            val feats = Array.tabulate(dim) { d =>
              val stripe = bytes.indices.filter(_ % dim == d).map(i => bytes(i) & 0xff)
              if (stripe.isEmpty) 0.0 else stripe.sum.toDouble / stripe.length
            }
            DecodedFeature(id, bi, dim, checksum, feats)
          }
        }
      }
  }

  /** Resize stub: treats the payload as a srcW×srcH "image" (row-major
    * bytes, truncated/padded deterministically) and area-averages it
    * down to dstW×dstH. The real op swaps the pixel loop for a codec +
    * interpolation kernel; the Spark shape — partition-local, no
    * shuffle, typed output with source+target dims as metadata — is
    * what carries to 100 TB (resize is embarrassingly parallel, so the
    * ONLY design question is keeping it off the driver and out of the
    * shuffle, which mapPartitions guarantees). */
  def resizeStub(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, srcW: Int = 16, srcH: Int = 16,
      dstW: Int = 4, dstH: Int = 4): Dataset[ResizedImage] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val px = Array.tabulate(srcW * srcH)(i =>
            if (i < bytes.length) (bytes(i) & 0xff).toDouble else 0.0)
          val out = Array.tabulate(dstW * dstH) { j =>
            val (bx, by) = (j % dstW, j / dstW)
            val (cw, ch) = (srcW / dstW, srcH / dstH)
            val cells = for {
              y <- by * ch until (by + 1) * ch
              x <- bx * cw until (bx + 1) * cw
            } yield px(y * srcW + x)
            cells.sum / cells.length
          }
          ResizedImage(id, srcW, srcH, dstW, dstH, out)
        }
      }
  }

  /** Frame-sample stub: treats the payload as a "video" of fixed-size
    * frames and emits every `stride`-th frame with its byte offset —
    * the decode-free keyframe-sampling shape (a real sampler reads
    * container metadata instead of fixed strides; partition-local
    * fan-out of rows → frames is the Spark-side contract either way). */
  def frameSample(spark: SparkSession, rows: Dataset[Row], idCol: String,
      payloadCol: String, frameBytes: Int = 16, stride: Int = 4): Dataset[SampledFrame] = {
    import spark.implicits._
    rows.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).map { f =>
            val off = f.toLong * frameBytes
            SampledFrame(id, f, off,
              java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + frameBytes))
          }
        }
      }
  }
}
