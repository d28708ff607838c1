package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Upd

class StreamingDedupSpec extends SparkTestBase {

  test("streaming keep-last upsert across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Upd]
    val result = StreamingDedup.keepLastStream(spark, input.toDS())
    val query = result.writeStream
      .format("memory")
      .queryName("keeplast_out")
      .outputMode("update")
      .start()
    try {
      input.addData(Upd(1L, 1L, "created", 10.0), Upd(2L, 1L, "created", 5.0))
      query.processAllAvailable()
      input.addData(Upd(1L, 2L, "paid", 12.0))
      query.processAllAvailable()
      // stale replay for key 1 (seq 1) must NOT displace seq 2
      input.addData(Upd(1L, 1L, "created", 10.0), Upd(3L, 1L, "created", 7.0))
      query.processAllAvailable()

      val latest = spark.sql(
        """SELECT key, status FROM (
          |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) rn
          |  FROM keeplast_out) WHERE rn = 1 ORDER BY key""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(latest == Seq((1L, "paid"), (2L, "created"), (3L, "created")))
    } finally query.stop()
  }
}
