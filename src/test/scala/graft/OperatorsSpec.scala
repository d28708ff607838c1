package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Incremental}

class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("dedup keepLast keeps the max-order row per key") {
    val df = Seq((1L, 1L, "old"), (1L, 3L, "new"), (1L, 2L, "mid"), (2L, 1L, "only"))
      .toDF("k", "seq", "v")
    val out = Dedup.keepLast(df, Seq("k"), Seq(col("seq")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "new"), (2L, "only")))
  }

  test("upsert: updates win over base, new keys append, base-only survive") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val upd = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    val out = Incremental.upsert(base, upd, Seq("k")).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("upsertOrdered equals upsert row-for-row; exactly one (range) exchange") {
    val base = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderstatus")
    val upd = base.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
    val plain = Incremental.upsert(base, upd, Seq("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val ordered = Incremental.upsertOrdered(base, upd, Seq("o_orderkey"))
    val got = ordered.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == plain)
    // AQE's toString prints final + initial sections, so assert the
    // SHAPE: the one window exchange is range, and nothing hashes
    val plan = ordered.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning") &&
      !plan.contains("Exchange hashpartitioning"),
      s"upsertOrdered must ride one range exchange, no hash:\n$plan")
  }

  test("deleteInsert replaces exactly the delta keys") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val delta = Seq((2L, "B2"), (2L, "B2b")).toDF("k", "v")
    val out = Incremental.deleteInsert(base, delta, Seq("k"))
      .orderBy("k", "v").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B2"), (2L, "B2b"), (3L, "c")))
  }

  test("schemaProject keeps target order and drops both-side extras") {
    val df = Seq((1, "x", 2.0)).toDF("a", "b", "c")
    val out = Incremental.schemaProject(df, Seq("c", "a", "not_there"))
    assert(out.columns.toSeq == Seq("c", "a"))
  }

  test("fullLoadReplace orders writes parents-first") {
    val t = Seq((1, "r")).toDF("k", "v")
    val seq = Incremental.fullLoadReplace(
      Map("child" -> t, "parent" -> t), Seq("parent", "child"))
    assert(seq.map(_._1) == Seq("parent", "child"))
  }

  test("snapshotDiff classifies insert/update/delete; null attrs diff null-safely") {
    val prev = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, None, 3.0), (4L, Some("d"), 4.0))
      .toDF("k", "s", "v")
    val cur = Seq((1L, Some("a"), 1.0),      // unchanged → dropped
      (2L, None, 2.0),                       // b → null: update
      (3L, None, 3.0),                       // null == null: unchanged
      (5L, Some("e"), 5.0))                  // new key: insert (4 deleted)
      .toDF("k", "s", "v")
    val out = Incremental.snapshotDiff(prev, cur, Seq("k"))
      .as[(Long, String, Option[String], Double)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (2L, "update", None, 2.0),
      (4L, "delete", Some("d"), 4.0),        // deletes report previous attrs
      (5L, "insert", Some("e"), 5.0)))
  }

  test("incremental window filter is pushed into the parquet scan") {
    // r8: events.ts is the physical micros timestamp — the window
    // filter belongs on it (ts_ns is derived and cannot push down)
    val ev = Tables.load(spark, sf0001, "events")
    val filtered = Incremental.windowFilter(ev, "ts", "2024-01-15 00:00:00")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts"),
      s"expected pushed ts filter in plan:\n$plan")
    // the nanos variant still FILTERS correctly on the derived column
    // (values agree with the pushed-down path), it just doesn't push
    val nanos = Incremental.windowFilterNanos(ev, "ts_ns",
      Tables.utcNanos("2024-01-15 00:00:00"))
    assert(nanos.count() == filtered.count())
  }
}
