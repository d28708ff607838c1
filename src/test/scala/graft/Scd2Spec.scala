package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd2

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def log(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "attr", "ts")

  private def hist(df: DataFrame): Seq[(Long, String, Long, Option[Long], Int, Boolean)] =
    df.select($"k", $"attr", $"valid_from", $"valid_to", $"version", $"is_current")
      .as[(Long, String, Long, Option[Long], Int, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("fromChangeLog: versions, validity chain, consecutive-identical collapse") {
    val h = hist(Scd2.fromChangeLog(
      log((1L, "a", 10L), (1L, "a", 20L), (1L, "b", 30L), (1L, "a", 40L),
        (2L, "x", 5L)),
      Seq("k"), Seq("attr"), "ts"))
    assert(h === Seq(
      (1L, "a", 10L, Some(30L), 1, false), // 20L re-states "a" → collapsed
      (1L, "b", 30L, Some(40L), 2, false),
      (1L, "a", 40L, None, 3, true),
      (2L, "x", 5L, None, 1, true)))
  }

  test("fromChangeLog: same-(key,ts) ties resolve to max attr tuple, null ts dropped") {
    val h = hist(Scd2.fromChangeLog(
      log((1L, "a", 10L), (1L, "c", 10L), (1L, "b", 10L))
        .unionByName(Seq(("z", 1L)).toDF("attr", "k")
          .withColumn("ts", lit(null).cast("long"))
          .select("k", "attr", "ts")),
      Seq("k"), Seq("attr"), "ts"))
    assert(h === Seq((1L, "c", 10L, None, 1, true)))
  }

  test("fromChangeLog builds the whole history in ONE exchange") {
    val plan = Scd2.fromChangeLog(log((1L, "a", 10L)), Seq("k"), Seq("attr"), "ts")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("applyBatch == rebuild from the full log (incl. late-arriving rows)") {
    val log1 = log((1L, "a", 10L), (1L, "b", 30L), (2L, "x", 5L), (3L, "m", 1L))
    // batch: new key, a current-value re-statement (collapses), a new
    // version, and a LATE row landing between two existing versions
    val log2 = log((1L, "a", 20L), (2L, "x", 50L), (2L, "y", 60L), (4L, "q", 7L))
    val applied = hist(Scd2.applyBatch(
      Scd2.fromChangeLog(log1, Seq("k"), Seq("attr"), "ts"),
      log2, Seq("k"), Seq("attr"), "ts"))
    val rebuilt = hist(Scd2.fromChangeLog(
      log1.unionByName(log2), Seq("k"), Seq("attr"), "ts"))
    assert(applied === rebuilt)
    assert(applied.filter(_._1 == 3L) === Seq((3L, "m", 1L, None, 1, true)))
  }

  test("applyBatch late insert splits an existing version exactly") {
    val h1 = Scd2.fromChangeLog(log((1L, "a", 10L), (1L, "c", 40L)),
      Seq("k"), Seq("attr"), "ts")
    val h = hist(Scd2.applyBatch(h1, log((1L, "b", 25L)), Seq("k"), Seq("attr"), "ts"))
    assert(h === Seq(
      (1L, "a", 10L, Some(25L), 1, false),
      (1L, "b", 25L, Some(40L), 2, false),
      (1L, "c", 40L, None, 3, true)))
  }

  test("pointInTime: facts pick the version active at their ts, boundary inclusive") {
    val hist = Scd2.fromChangeLog(
      log((1L, "a", 10L), (1L, "b", 30L)), Seq("k"), Seq("attr"), "ts")
    val facts = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 29L),
      (103L, 1L, 30L), (104L, 1L, 99L), (105L, 2L, 50L))
      .toDF("fact_id", "k", "fts")
    val out = Scd2.pointInTime(facts, hist, "k", $"fts", $"fact_id")
      .select($"fact_id", $"dim_attr", $"dim_version")
      .as[(Long, Option[String], Option[Int])]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (100L, None, None),            // before the first version
      (101L, Some("a"), Some(1)),    // valid_from boundary is inclusive
      (102L, Some("a"), Some(1)),
      (103L, Some("b"), Some(2)),    // switches exactly at the change ts
      (104L, Some("b"), Some(2)),    // current version is open-ended
      (105L, None, None)))           // key with no history
  }

  test("applyBatch leaves untouched keys outside any window/shuffle") {
    // materialized history, as a stored dimension table would be
    val h1 = spark.createDataFrame(
      Scd2.fromChangeLog(log((1L, "a", 10L), (2L, "x", 5L)),
          Seq("k"), Seq("attr"), "ts")
        .collect().toSeq.asJava,
      Scd2.fromChangeLog(log((1L, "a", 10L)), Seq("k"), Seq("attr"), "ts").schema)
    val out = Scd2.applyBatch(h1, log((1L, "b", 20L)), Seq("k"), Seq("attr"), "ts")
    val plan = out.queryExecution.executedPlan.toString
    // untouched branch: broadcast anti join only — the rebuilt branch
    // carries the single window exchange
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(plan).isDefined, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }
}
