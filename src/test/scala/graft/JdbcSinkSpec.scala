package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Incremental
import graft.sources.JdbcSink

/** JDBC MERGE-staging sink against embedded Derby (the JDBC engine on
  * the Spark classpath): upsert and delete-insert parity with the
  * parquet-lake Incremental operators, redelivery idempotence, and the
  * stage-then-crash retry window. */
class JdbcSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def url(): String =
    "jdbc:derby:" + Files.createTempDirectory("graft-derby").toString +
      "/db;create=true"

  private def snapshot(u: String, table: String): Set[(Long, String, Double)] =
    JdbcSink.readTable(spark, u, table)
      .collect().map(r => (r.getLong(r.fieldIndex("k")),
        r.getString(r.fieldIndex("s")), r.getDouble(r.fieldIndex("v")))).toSet

  private def base = Seq(
    (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0))
    .toDF("k", "s", "v")
  private def batch = Seq(
    (2L, "B", 20.0), (4L, "D", 40.0), (5L, "e", 5.0))
    .toDF("k", "s", "v")

  test("upsertViaStaging equals the parquet-path Incremental.upsert") {
    val u = url()
    JdbcSink.upsertViaStaging(base, u, "TGT", Seq("k"))
    JdbcSink.upsertViaStaging(batch, u, "TGT", Seq("k"))
    val viaLake = Incremental.upsert(base, batch, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(snapshot(u, "TGT") == viaLake)
    assert(viaLake == Set((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0),
      (4L, "D", 40.0), (5L, "e", 5.0)))
  }

  test("deleteInsertViaStaging equals the parquet-path Incremental.deleteInsert") {
    val u = url()
    JdbcSink.upsertViaStaging(base, u, "TGT", Seq("k"))
    JdbcSink.deleteInsertViaStaging(batch, u, "TGT", Seq("k"))
    val viaLake = Incremental.deleteInsert(base, batch, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(snapshot(u, "TGT") == viaLake)
  }

  test("redelivered batch re-merges to the same target state") {
    val u = url()
    JdbcSink.upsertViaStaging(base, u, "TGT", Seq("k"))
    JdbcSink.upsertViaStaging(batch, u, "TGT", Seq("k"))
    val once = snapshot(u, "TGT")
    JdbcSink.upsertViaStaging(batch, u, "TGT", Seq("k"))
    assert(snapshot(u, "TGT") == once)
  }

  test("crash between stage and merge: target untouched, retry lands the batch") {
    val u = url()
    JdbcSink.upsertViaStaging(base, u, "TGT", Seq("k"))
    val before = snapshot(u, "TGT")
    // worst-ordered crash: the batch is staged but never merged
    JdbcSink.upsertViaStaging(batch, u, "TGT", Seq("k"),
      failAfterStage = true)
    assert(snapshot(u, "TGT") == before, "un-merged stage must not leak")
    // the retry overwrites stale staging and merges
    JdbcSink.upsertViaStaging(batch, u, "TGT", Seq("k"))
    assert(snapshot(u, "TGT") ==
      Set((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0),
        (4L, "D", 40.0), (5L, "e", 5.0)))
  }

  test("duplicate-keyed batch fails loudly in the database, never picks a winner silently") {
    val u = url()
    JdbcSink.upsertViaStaging(base, u, "TGT", Seq("k"))
    val before = snapshot(u, "TGT")
    // two source rows for key 2: ANSI MERGE must raise (the contract:
    // dedup the batch with Dedup.keepLast first, as the reference does)
    val dup = Seq((2L, "B1", 20.0), (2L, "B2", 21.0)).toDF("k", "s", "v")
    intercept[java.sql.SQLException] {
      JdbcSink.upsertViaStaging(dup, u, "TGT", Seq("k"))
    }
    assert(snapshot(u, "TGT") == before, "failed merge must not mutate the target")
    // the documented remedy makes the same batch loadable
    JdbcSink.upsertViaStaging(
      Incremental.upsert(dup.limit(0), dup, Seq("k"), Seq(col("s"))),
      u, "TGT", Seq("k"))
    assert(snapshot(u, "TGT").contains((2L, "B2", 21.0)))
  }

  test("composite business key merges on both columns") {
    val u = url()
    val b0 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "s", "v")
    val b1 = Seq((1L, "y", 20.0), (2L, "x", 3.0)).toDF("k", "s", "v")
    JdbcSink.upsertViaStaging(b0, u, "TGT", Seq("k", "s"))
    JdbcSink.upsertViaStaging(b1, u, "TGT", Seq("k", "s"))
    assert(snapshot(u, "TGT") ==
      Set((1L, "x", 1.0), (1L, "y", 20.0), (2L, "x", 3.0)))
    // delete-insert with the composite key (correlated-EXISTS path)
    JdbcSink.deleteInsertViaStaging(
      Seq((1L, "x", 100.0)).toDF("k", "s", "v"), u, "TGT", Seq("k", "s"))
    assert(snapshot(u, "TGT") ==
      Set((1L, "x", 100.0), (1L, "y", 20.0), (2L, "x", 3.0)))
  }

  test("LOB business key over the VARCHAR cast bound is refused before any statement runs") {
    val u = url()
    JdbcSink.upsertViaStaging(base, u, "TGT", Seq("k", "s"))
    // Spark maps StringType to Derby CLOB, so `s` as a key compares
    // through CAST(.. AS VARCHAR(4096)); a longer key would error
    // mid-MERGE on Derby and MATCH THE WRONG ROW on engines whose cast
    // truncates — the sink must refuse the batch with the bound named
    val longKey = "x" * (JdbcSink.maxLobKeyChars + 1)
    val bad = Seq((9L, longKey, 9.0)).toDF("k", "s", "v")
    val before = snapshot(u, "TGT")
    val e1 = intercept[IllegalArgumentException] {
      JdbcSink.upsertViaStaging(bad, u, "TGT", Seq("k", "s"))
    }
    assert(e1.getMessage.contains(JdbcSink.maxLobKeyChars.toString))
    val e2 = intercept[IllegalArgumentException] {
      JdbcSink.deleteInsertViaStaging(bad, u, "TGT", Seq("k", "s"))
    }
    assert(e2.getMessage.contains("surrogate"))
    assert(snapshot(u, "TGT") == before, "refused batch leaves the target untouched")
    // keys AT the bound still merge (the cast is lossless there)
    val atBound = "y" * JdbcSink.maxLobKeyChars
    JdbcSink.upsertViaStaging(Seq((9L, atBound, 9.0)).toDF("k", "s", "v"),
      u, "TGT", Seq("k", "s"))
    assert(snapshot(u, "TGT") == before + ((9L, atBound, 9.0)))
  }
}
