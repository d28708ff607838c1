package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{PostingsArtifact, TextDedup}

/** Persisted Jaccard shingle artifact: build once, incremental append
  * shingles only NEW docs, crash replay is a no-op, the artifact-backed
  * pair pipeline matches a from-scratch blockedJaccardPairs run at
  * every corpus size (the dfreq re-rank keeps prefix filtering
  * recall-exact under growth), and sinceId scopes to the day's batch. */
class PostingsArtifactSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def docs =
    Tables.load(spark, sf0001, "documents").select("doc_id", "text", "source")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("refresh shingles only new docs; replayed and unchanged runs shingle zero") {
    val control = tmp("post-control")
    val artifact = tmp("post-artifact") + "/shs"
    val d1 = docs.where(col("doc_id") < 60)
    val n1 = PostingsArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", "source", batchId = "b1")
    assert(n1 == d1.count())

    // unchanged corpus: ZERO shingle sets recomputed (watermark excludes
    // every doc before any tokenization happens)
    assert(PostingsArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", "source", batchId = "b2") == 0L)

    // grown corpus: only the delta is shingled
    val n2 = PostingsArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", "source", batchId = "b3")
    assert(n2 == docs.count() - d1.count())

    // one row per doc, and the artifact's shingle sets equal a fresh run
    val art = PostingsArtifact.shingleFrame(spark, artifact)
    assert(art.groupBy("doc").count().where(col("count") > 1).isEmpty)
    val fresh = docs.select(col("doc_id").cast("long").as("doc"),
        TextDedup.shingleHashes64(col("text"), 3).as("shs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toSet
    assert(art.select("doc", "shs")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toSet == fresh)
  }

  test("crash between append and commit replays into a no-op; pairs match the in-session pipeline") {
    val control = tmp("post-control2")
    val artifact = tmp("post-artifact2") + "/shs"
    val d1 = docs.where(col("doc_id") < 50)
    PostingsArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", "source", batchId = "b1")

    // crash-ordered grown run: rows land, watermark does not
    PostingsArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", "source", batchId = "b2", failBeforeCommit = true)

    // replay: the doc-presence guard (complete here — one file-atomic
    // row per doc) drops every already-landed row
    assert(PostingsArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", "source", batchId = "b2-replay") == 0L)
    assert(PostingsArtifact.shingleFrame(spark, artifact)
      .groupBy("doc").count().where(col("count") > 1).isEmpty)

    // watermark DID advance through the replay
    assert(PostingsArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", "source", batchId = "b3") == 0L)

    // the artifact-backed pair pipeline equals the from-scratch run
    val fromArtifact = pairSet(
      PostingsArtifact.pairs(spark, artifact, minJaccard = 0.3))
    val inSession = pairSet(TextDedup.blockedJaccardPairs(docs,
      "doc_id", "text", "source", n = 3, minJaccard = 0.3))
    assert(fromArtifact == inSession && fromArtifact.nonEmpty)
  }

  test("torn append (some docs of the window committed) is healed on replay") {
    val control = tmp("post-control4")
    val artifact = tmp("post-artifact4") + "/shs"
    val d1 = docs.where(col("doc_id") < 50)
    PostingsArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", "source", batchId = "b1")
    PostingsArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", "source", batchId = "b2", failBeforeCommit = true)

    // simulate the committer-v2 tear: only half the new docs' rows were
    // task-committed before the job died
    val full = spark.read.parquet(artifact)
    val schema = full.schema
    val torn = full.where(!(col("doc") >= 50 && col("doc") % 2 === 0)).collect()
    val fs = new org.apache.hadoop.fs.Path(artifact)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(artifact), true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(torn.toSeq), schema)
      .write.parquet(artifact)

    // replay appends exactly the missing docs; content equals a rebuild
    PostingsArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", "source", batchId = "b2-replay")
    val art = PostingsArtifact.shingleFrame(spark, artifact)
    assert(art.groupBy("doc").count().where(col("count") > 1).isEmpty)
    assert(art.count() == docs.count())
    assert(pairSet(PostingsArtifact.pairs(spark, artifact, minJaccard = 0.3)) ==
      pairSet(TextDedup.blockedJaccardPairs(docs,
        "doc_id", "text", "source", n = 3, minJaccard = 0.3)))
  }

  test("growth keeps prefix filtering recall-exact (re-ranked dfreq) and sinceId scopes the batch") {
    val control = tmp("post-control3")
    val artifact = tmp("post-artifact3") + "/shs"
    val d1 = docs.where(col("doc_id") < 250)
    PostingsArtifact.refresh(spark, control, artifact, "docs", d1,
      "doc_id", "text", "source", batchId = "day1")
    val day1Pairs = pairSet(
      PostingsArtifact.pairs(spark, artifact, minJaccard = 0.3))
    assert(day1Pairs == pairSet(TextDedup.blockedJaccardPairs(d1,
      "doc_id", "text", "source", n = 3, minJaccard = 0.3)))

    // grow: document frequencies change, prefixes re-rank, and the
    // artifact-backed pairs still equal a full from-scratch run
    PostingsArtifact.refresh(spark, control, artifact, "docs", docs,
      "doc_id", "text", "source", batchId = "day2")
    val fullPairs = pairSet(
      PostingsArtifact.pairs(spark, artifact, minJaccard = 0.3))
    assert(fullPairs == pairSet(TextDedup.blockedJaccardPairs(docs,
      "doc_id", "text", "source", n = 3, minJaccard = 0.3)))

    // the day-2 batch = pairs touching a new doc; old–old pairs were
    // day 1's output, so batch ∪ day1 covers the full corpus exactly
    val batch = pairSet(PostingsArtifact.pairs(spark, artifact,
      minJaccard = 0.3, sinceId = 249L))
    assert(batch.forall { case (a, b, _) => a > 249L || b > 249L })
    assert((day1Pairs ++ batch) == fullPairs)
  }
}
