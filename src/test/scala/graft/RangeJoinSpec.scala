package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned interval join: bit-equivalence with the naive non-equi join
  * (which Spark plans as a nested loop), boundary semantics, and
  * intervals spanning many bins. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  // points every 7 µs over [0, 7000); intervals of mixed lengths —
  // shorter than, equal to, and 3× the bin width — at varied offsets
  private lazy val pts: DataFrame =
    (0L until 7000L by 7L).toDF("p_us").repartition(3).cache()
  private lazy val ivs: DataFrame =
    Seq(
      (1L, 0L, 100L),     // bin-aligned start
      (2L, 95L, 105L),    // straddles a bin edge
      (3L, 250L, 1150L),  // spans 3+ bins
      (4L, 500L, 500L),   // zero-length: matches nothing
      (5L, 700L, 690L),   // negative: matches nothing
      (6L, 6990L, 7300L), // runs past the last point
      (7L, 40L, 60L)      // nested inside interval 1
    ).toDF("iv_id", "s_us", "e_us").cache()

  private def naive(points: DataFrame, intervals: DataFrame): Set[(Long, Long)] =
    points.crossJoin(intervals)
      .where(col("p_us") >= col("s_us") && col("p_us") < col("e_us"))
      .select("iv_id", "p_us").as[(Long, Long)].collect().toSet

  test("matches the naive non-equi join exactly, with no duplicate pairs") {
    val got = RangeJoin.binnedIntervalJoin(pts, "p_us", ivs, "s_us", "e_us",
        binUs = 300L)
      .select("iv_id", "p_us").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate (interval, point) pairs")
    assert(got.toSet == naive(pts, ivs))
  }

  test("start is inclusive, end is exclusive") {
    val p = Seq(100L, 199L, 200L).toDF("p_us")
    val iv = Seq((1L, 100L, 200L)).toDF("iv_id", "s_us", "e_us")
    val got = RangeJoin.binnedIntervalJoin(p, "p_us", iv, "s_us", "e_us", 50L)
      .select("p_us").as[Long].collect().toSet
    assert(got == Set(100L, 199L))
  }

  test("bin width coarser and finer than intervals both stay exact") {
    for (bin <- Seq(1L, 64L, 1000L, 100000L)) {
      val got = RangeJoin.binnedIntervalJoin(pts, "p_us", ivs, "s_us", "e_us", bin)
        .select("iv_id", "p_us").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"dups at bin=$bin")
      assert(got.toSet == naive(pts, ivs), s"mismatch at bin=$bin")
    }
  }

  test("negative timestamps (pre-epoch) bin correctly") {
    val p = Seq(-250L, -1L, 0L, 10L).toDF("p_us")
    val iv = Seq((1L, -300L, 5L)).toDF("iv_id", "s_us", "e_us")
    val got = RangeJoin.binnedIntervalJoin(p, "p_us", iv, "s_us", "e_us", 100L)
      .select("p_us").as[Long].collect().toSet
    assert(got == Set(-250L, -1L, 0L))
  }

  test("empty intervals frame and non-positive bin width") {
    val none = RangeJoin.binnedIntervalJoin(pts, "p_us",
      ivs.limit(0), "s_us", "e_us", 300L)
    assert(none.count() == 0)
    intercept[IllegalArgumentException] {
      RangeJoin.binnedIntervalJoin(pts, "p_us", ivs, "s_us", "e_us", 0L)
    }
  }

  test("q53 plans a hash/merge equi-join on the bin — never a nested loop") {
    val plan = graft.queries.AnalyticsQueries.queries("q53_range_join")
      .apply(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bin id:\n$plan")
  }
}
