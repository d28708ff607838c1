package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Count-min heavy hitters: exactness vs a full groupBy-HAVING on a
  * Zipf corpus, one-sided error (never undercounts), the pruning
  * payoff the pre-filter exists for, and per-batch artifact merge
  * invariance. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish corpus: key k (1..200) appears ⌈2000/k⌉ times, spread
    * round-robin over 3 "days" — heavy tail plus a long flat one. */
  private lazy val zipf: DataFrame = {
    val rows = for {
      k <- 1 to 200
      i <- 1 to (2000 / k + 1)
    } yield (k.toLong, s"2024-01-0${i % 3 + 1} 00:00:00")
    rows.toDF("key", "d").withColumn("ts", to_timestamp(col("d")))
      .repartition(4).cache()
  }

  private def exactHeavy(df: DataFrame, minCount: Long): Set[(Long, Long)] =
    df.groupBy("key").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .as[(Long, Long)].collect().toSet

  test("heavyHitters equals the exact groupBy-HAVING on a Zipf corpus") {
    val got = HeavyHitters.heavyHitters(zipf, Seq("key"), minCount = 100L)
      .as[(Long, Long)].collect().toSet
    assert(got == exactHeavy(zipf, 100L))
    assert(got.nonEmpty && got.size < 30) // genuinely selective
  }

  test("estimates never undercount any key (one-sided CMS error)") {
    val cms = HeavyHitters.keySketch(zipf, Seq("key"))
    val under = zipf.groupBy("key").agg(count(lit(1)).as("n"))
      .withColumn("est", HeavyHitters.estimate(cms, Seq(col("key"))))
      .where(col("est") < col("n"))
    assert(under.count() == 0)
  }

  test("CMS pre-filter prunes the shuffle down to ~the heavy rows") {
    val minCount = 100L
    val cms = HeavyHitters.keySketch(zipf, Seq("key"))
    val total = zipf.count()
    val surviving = zipf
      .where(HeavyHitters.estimate(cms, Seq(col("key"))) >= minCount)
      .count()
    val heavy = exactHeavy(zipf, minCount)
    val trueHeavyRows = heavy.toSeq.map(_._2).sum
    // ε·N ≈ 1 at this scale: surviving rows ≈ the heavy keys' own rows
    // (on a Zipf corpus the heavy head owns most ROWS — the prune's
    // payoff is collapsing the KEY cardinality entering the shuffle)
    assert(surviving <= trueHeavyRows + total / 10,
      s"pruned scan kept $surviving of $total rows (heavy rows: $trueHeavyRows)")
    val survivingKeys = zipf
      .where(HeavyHitters.estimate(cms, Seq(col("key"))) >= minCount)
      .select("key").distinct().count()
    assert(survivingKeys <= heavy.size + 5,
      s"$survivingKeys keys survived for ${heavy.size} true heavies")
  }

  test("merged per-day artifacts estimate identically to one global sketch") {
    val artifacts = HeavyHitters.batchArtifacts(zipf, "ts", Seq("key"))
      .orderBy("batch_date").collect()
    assert(artifacts.length == 3)
    val merged = HeavyHitters.merge(
      artifacts.map(_.getAs[Array[Byte]]("sketch")).toSeq)
    val global = HeavyHitters.keySketch(zipf, Seq("key"))
    val diff = zipf.select(col("key")).distinct()
      .withColumn("em", HeavyHitters.estimate(merged, Seq(col("key"))))
      .withColumn("eg", HeavyHitters.estimate(global, Seq(col("key"))))
      .where(col("em") =!= col("eg"))
    assert(diff.count() == 0)
    // and heavy hitters recomputed FROM the merged artifact are exact
    val got = HeavyHitters.fromSketch(zipf, Seq("key"), 100L, merged)
      .as[(Long, Long)].collect().toSet
    assert(got == exactHeavy(zipf, 100L))
  }

  test("minCount must be positive") {
    intercept[IllegalArgumentException] {
      HeavyHitters.fromSketch(zipf, Seq("key"), 0L,
        HeavyHitters.keySketch(zipf, Seq("key")))
    }
  }

  test("bounded-key tier: hinted path is sketch-free, plain-planned, bit-equal") {
    // the r16 tier switch: a caller-bounded key takes the plain
    // groupBy-HAVING (no CMS pass, no probe filter in the plan); an
    // over-the-bar or absent hint keeps the sketch path. Both tiers
    // must return identical rows.
    val bounded = HeavyHitters.heavyHitters(zipf, Seq("key"), 100L,
      maxDistinctHint = Some(1000L))
    val plan = bounded.queryExecution.executedPlan.toString
    assert(!plan.contains("cms_estimate") && !plan.contains("count_min_sketch"),
      s"bounded tier must not plan any CMS work:\n$plan")
    val viaSketch = HeavyHitters.heavyHitters(zipf, Seq("key"), 100L)
    assert(bounded.as[(Long, Long)].collect().toSet ==
      viaSketch.as[(Long, Long)].collect().toSet)
    // a hint ABOVE the bar must not flip the plan to the bounded tier
    val wide = HeavyHitters.heavyHitters(zipf, Seq("key"), 100L,
      maxDistinctHint = Some(HeavyHitters.BoundedKeyBar + 1))
    assert(wide.queryExecution.analyzed.toString.contains("count_min_sketch") ||
      wide.queryExecution.executedPlan.toString.contains("cms_estimate"),
      "an over-the-bar hint must keep the sketch path")
  }
}
