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
}
