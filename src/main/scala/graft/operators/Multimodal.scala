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
}
