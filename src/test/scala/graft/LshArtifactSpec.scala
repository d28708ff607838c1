package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{LshArtifact, MinHashLSH}

/** Persisted LSH band-bucket artifact: build once, incremental append
  * signs only NEW docs, crash replay is a no-op, and the candidate
  * join over the artifact matches a from-scratch run. */
class LshArtifactSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("refresh signs only new docs; replayed and unchanged runs sign zero") {
    val control = tmp("lsh-control")
    val artifact = tmp("lsh-artifact") + "/bb" // refresh creates it
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    val d1 = docs.where(col("doc_id") < 60)
    val n1 = LshArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", batchId = "b1")
    assert(n1 == d1.count())

    // unchanged corpus: ZERO signatures recomputed (watermark excludes
    // every doc before any shingle work happens)
    assert(LshArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", batchId = "b2") == 0L)

    // grown corpus: only the delta is signed
    val n2 = LshArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", batchId = "b3")
    assert(n2 == docs.count() - d1.count())

    // the artifact equals a from-scratch signature run, row for row
    val fresh = MinHashLSH.bandBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val art = LshArtifact.bandBuckets(spark, artifact)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(art == fresh)
  }

  test("crash between append and commit replays into a no-op") {
    val control = tmp("lsh-control2")
    val artifact = tmp("lsh-artifact2") + "/bb"
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    val d1 = docs.where(col("doc_id") < 50)
    LshArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", batchId = "b1")

    // crash-ordered run: rows for the new window land, watermark does not
    LshArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", batchId = "b2", failBeforeCommit = true)

    // replay: the anti-join guard drops every already-landed row
    assert(LshArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", batchId = "b2-replay") == 0L)

    // no duplicate doc rows, and content still equals a fresh rebuild
    val art = LshArtifact.bandBuckets(spark, artifact)
    assert(art.groupBy("doc", "band").count().where(col("count") > 1).isEmpty)
    val fresh = MinHashLSH.bandBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(art.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet == fresh)

    // and the watermark DID advance through the replay: one more
    // unchanged run scans zero docs
    assert(LshArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", batchId = "b3") == 0L)
  }

  test("artifact-backed verified pairs equal the in-session pipeline") {
    val control = tmp("lsh-control3")
    val artifact = tmp("lsh-artifact3") + "/bb"
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
    LshArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", batchId = "b1")
    val fromArtifact = LshArtifact.verifiedPairs(spark, artifact, docs,
        "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inSession = MinHashLSH.nearDupPairs(docs, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromArtifact == inSession && fromArtifact.nonEmpty)
  }
}
