package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

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

  test("decodeStub: deterministic batched features with fixed dim") {
    val docs = Tables.load(spark, sf0001, "documents").limit(100)
    val bin = Multimodal.withBinaryMeta(docs, "doc_id", "text")
    val a = Multimodal.decodeStub(spark, bin, "doc_id", "payload", dim = 8, batchSize = 16)
      .collect().sortBy(_.id)
    val b = Multimodal.decodeStub(spark, bin, "doc_id", "payload", dim = 8, batchSize = 16)
      .collect().sortBy(_.id)
    assert(a.length == 100)
    assert(a.forall(_.features.length == 8))
    assert(a.map(_.checksum).toSeq == b.map(_.checksum).toSeq, "decode must be deterministic")
    assert(a.forall(_.batchOrdinal >= 0))
  }

  test("resizeStub: area-average 16x16 -> 4x4 with dim metadata") {
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val bin = Multimodal.withBinaryMeta(docs, "doc_id", "text")
    val out = Multimodal.resizeStub(spark, bin, "doc_id", "payload").collect()
    assert(out.length == 50)
    assert(out.forall(r => r.pixels.length == 16 && r.dstW == 4 && r.srcW == 16))
    // a constant-byte payload must resize to that constant
    import spark.implicits._
    val const = Seq((1L, Array.fill[Byte](256)(7.toByte))).toDF("doc_id", "payload")
    val r = Multimodal.resizeStub(spark, const, "doc_id", "payload").head()
    assert(r.pixels.forall(_ == 7.0))
  }

  test("frameSample: every stride-th fixed-size frame with byte offsets") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](160)(_.toByte) // 10 frames of 16
    val df = Seq((5L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal.frameSample(spark, df, "doc_id", "payload",
      frameBytes = 16, stride = 4).collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 4, 8))
    assert(frames.map(_.offset).toSeq == Seq(0L, 64L, 128L))
    assert(frames.forall(_.frame.length == 16))
    assert(frames(1).frame(0) == 64.toByte, "frame bytes must come from the offset")
  }
}
