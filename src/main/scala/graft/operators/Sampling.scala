package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-splitting primitives for training-data pipelines.
  *
  * The split assignment must be a pure function of the row's identity —
  * never `rand()` — so that (a) re-runs and backfills land every row in
  * the same split, (b) the split survives repartitioning/recovery, and
  * (c) two engines agree on it (the assignment is md5-based and
  * oracle-checked against DuckDB). This is the deterministic-split
  * discipline a 100 TB corpus needs: assignment is row-local, no
  * shuffle, no state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id: first 8 hex chars
    * of md5(id) as an integer — uniform, engine-portable (DuckDB:
    * ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % buckets). */
  def hashBucket(idCol: Column, buckets: Int = 100): Column =
    (conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Adds a `split` column: "train"/"val"/"test" by cumulative
    * percentage cut points (e.g. 80/10/10 → trainPct=80, valPct=10).
    * Percentages are scaled to the bucket count, so a non-default
    * `buckets` changes split granularity, not the split fractions. */
  /** The split label as a pure COLUMN function of the id — usable
    * anywhere a row carries the id (e.g. labeling both sides of a
    * near-dup pair without joining the corpus: split is derived, not
    * stored, so the audit stays map-only). */
  def splitOf(idCol: Column, trainPct: Int = 80, valPct: Int = 10,
      buckets: Int = 100): Column = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val cutTrain = trainPct * buckets / 100
    val cutVal = (trainPct + valPct) * buckets / 100
    // integer-truncated cuts must not silently erase a requested split
    require(trainPct == 0 || cutTrain > 0,
      s"buckets=$buckets too coarse for trainPct=$trainPct")
    require(valPct == 0 || cutVal > cutTrain,
      s"buckets=$buckets too coarse for valPct=$valPct")
    val b = hashBucket(idCol, buckets)
    when(b < cutTrain, lit("train"))
      .when(b < cutVal, lit("val"))
      .otherwise(lit("test"))
  }

  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10,
      buckets: Int = 100): DataFrame =
    df.withColumn("split", splitOf(col(idCol), trainPct, valPct, buckets))

  /** Deterministic per-group quota: keep at most `n` rows per group,
    * chosen by md5-rank of the row id — the corpus-balancing cap
    * ("no source may contribute more than N docs") with the same
    * re-run-stable, engine-portable discipline as [[hashSplit]]. The
    * rank-≤-n filter triggers Spark's WindowGroupLimit rewrite: each
    * input partition pre-prunes to n·|groups| rows before the single
    * group exchange, so a 10⁹-doc source ships n rows, not 10⁹. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val rk = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*)
        .orderBy(md5(col(idCol).cast("string")), col(idCol)))
    df.withColumn("__rk", rk).where(col("__rk") <= n).drop("__rk")
  }

  /** Greedy token-budget shard packing: within each group (split,
    * source, …) rows are ordered by the md5 discipline and assigned
    * `shard = floor(tokens_before / budget)` — the shard whose budget
    * window the doc's running start falls in. Every doc lands in
    * exactly one shard, shard sizes hover at ~budget tokens (one doc
    * may straddle a boundary; an over-budget doc gets its own shard,
    * never dropped) — the sequence-packing step that turns a cleaned
    * corpus into training shards. Deterministic: a re-run (or a
    * different partitioning) packs identically. Runs as the
    * [[packByBudgetBucketed]] distributed prefix sum, so the per-group
    * sort+scan parallelizes instead of landing on one task per
    * split. */
  def packByBudget(df: DataFrame, groupCols: Seq[String], idCol: String,
      tokenCol: String, budget: Long): DataFrame =
    packByBudgetBucketed(df, groupCols, idCol, tokenCol, budget)

  /** The direct one-window form of [[packByBudget]] — partitions by
    * the group columns alone, so with a handful of groups ONE task
    * sorts and prefix-scans the biggest group regardless of cluster
    * size (r13: 1.33 s of q58's 2.77 at x100 sat in this stage on 3
    * tasks). Kept as the equality pin for the distributed form; not
    * the public path. */
  private[graft] def packByBudgetWindowed(df: DataFrame,
      groupCols: Seq[String], idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    df.withColumn("shard", floor(before / budget).cast("long"))
  }

  /** [[packByBudget]] as a DISTRIBUTED prefix sum. The plain form's
    * window partitions by the group columns alone — with a handful of
    * groups (train/val/test) ONE task sorts and scans the biggest
    * group however many executors exist. Here the md5 order key's
    * leading `prefixLen` hex chars split every group into 16^prefixLen
    * contiguous sub-ranges (hex substring order IS md5-string order,
    * so bucket-major order is exactly the plain form's order): pass 1
    * aggregates per-bucket token totals (map-side combined — each
    * input partition ships ≤ |groups|·16^prefixLen partial rows), a
    * bucket-count-sized window turns them into exclusive bucket
    * offsets, and pass 2 broadcast-joins the offsets back and runs the
    * running sum per (group, bucket) — the sort and the window scan
    * parallelize 16^prefixLen-way. Identical output to the plain form
    * (same total order, same sums); costs one extra scan of
    * (groupCols, idCol, tokenCol) for pass 1. */
  private[graft] def packByBudgetBucketed(df: DataFrame,
      groupCols: Seq[String], idCol: String, tokenCol: String,
      budget: Long, prefixLen: Int = 2): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen must be in [1,8], got $prefixLen")
    val keyed = df
      .withColumn("__pk_k", md5(col(idCol).cast("string")))
      .withColumn("__pk_b", substring(col("__pk_k"), 1, prefixLen))
    val gb = (groupCols :+ "__pk_b").map(col)
    val totals = keyed.groupBy(gb: _*).agg(sum(col(tokenCol)).as("__pk_t"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pk_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__pk_off", coalesce(sum(col("__pk_t")).over(wOff), lit(0L)))
      .select((groupCols :+ "__pk_b").zipWithIndex.map { case (c, i) =>
        col(c).as(s"__pk_j$i") } :+ col("__pk_off"): _*)
    // null-safe equi-join: a null group value is a window partition in
    // the plain form and must stay one here
    val cond = (groupCols :+ "__pk_b").zipWithIndex
      .map { case (c, i) => keyed(c) <=> col(s"__pk_j$i") }
      .reduce(_ && _)
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(gb: _*)
      .orderBy(col("__pk_k"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), cond)
      .withColumn("shard", floor(
        (col("__pk_off") + coalesce(sum(col(tokenCol)).over(wLoc), lit(0L)))
          / budget).cast("long"))
      .drop((Seq("__pk_k", "__pk_b", "__pk_off") ++
        (groupCols :+ "__pk_b").indices.map(i => s"__pk_j$i")): _*)
  }

  /** Temperature-scaled mixture sampling (the Pile / multilingual-
    * balancing discipline): stratum `s` with n_s rows gets target
    * k_s = min(n_s, round(T · n_s^α / Σ_t n_t^α)) — α = 1 keeps the
    * natural mix, α = 0 equalizes strata, values between damp the
    * head-domain dominance a power-law corpus otherwise hands the
    * training mix. Selection WITHIN each stratum is the md5-rank
    * discipline ([[capPerGroup]]): deterministic, re-run stable,
    * engine-portable. Targets are capped at the stratum size — a
    * stratum smaller than its target contributes everything it has
    * (up-sampling is an epoch-repetition concern, not a
    * materialization concern).
    *
    * The per-stratum counts collect to the driver: |strata| rows —
    * bounded-by-construction metadata (the stop-list/centroid
    * precedent), and what buys the LITERAL max-target rank cap below,
    * which triggers Spark's WindowGroupLimit rewrite so every input
    * partition pre-prunes to maxK·|strata| rows before the single
    * stratum exchange — the same property that makes [[capPerGroup]]
    * scale. The exact per-stratum cut then applies via a broadcast
    * decision-table join. */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
      alpha: Double, totalTarget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(totalTarget >= 1, s"totalTarget must be >= 1, got $totalTarget")
    val spark = df.sparkSession
    import spark.implicits._
    // null-stratum rows cannot survive the equi-join below (NULL never
    // equals the decision table's key), so drop them from the count up
    // front — explicitly, not via a driver NPE — and return an empty
    // frame for an empty input instead of crashing on max of nothing
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().flatMap(r =>
        Option(r.get(0)).map(s => (s.toString, r.getLong(1))))
    if (counts.isEmpty) return df.limit(0)
    // the normalizer is a floating-point sum, so its value depends on
    // addend ORDER — collect order here is partition-arbitrary, and an
    // oracle engine sums in its own order; at a round() half-boundary
    // that can shift a target by 1. Canonical order (stratum name)
    // makes z a pure function of the data on any engine that sums the
    // same way (the q68 oracle uses sum(... ORDER BY lang))
    val z = counts.sortBy(_._1)
      .map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val targets = counts.map { case (s, n) =>
      (s, math.min(n, math.round(totalTarget * math.pow(n.toDouble, alpha) / z)))
    }
    // the rank-cap pre-prune is an OPTIMIZATION (the exact per-stratum
    // cut applies via the decision table) — clamping, never wrapping,
    // keeps it merely less effective when a target exceeds Int range
    val maxK = math.min(targets.map(_._2).max, Int.MaxValue.toLong).toInt
    val targetDf = targets.toSeq.toDF("__stratum", "__k")
    val rk = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(stratumCol)
        .orderBy(md5(col(idCol).cast("string")), col(idCol)))
    df.withColumn("__rk", rk)
      .where(col("__rk") <= maxK) // literal → WindowGroupLimit pre-prune
      .join(broadcast(targetDf),
        col(stratumCol).cast("string") === col("__stratum"))
      .where(col("__rk") <= col("__k"))
      .drop("__rk", "__k", "__stratum")
  }

  /** Seeded per-stratum sampling (e.g. balance sources or languages in
    * a training mix): keeps ~`fractions(stratum)` of each stratum,
    * deterministic under the seed via the same md5 discipline (id and
    * stratum both feed the hash so strata draw independently). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    val u = conv(substring(
      md5(concat_ws("|", lit(seed), col(stratumCol), col(idCol).cast("string"))),
      1, 8), 16, 10).cast("long").cast("double") / 4294967296.0
    df.where(u < frac)
  }
}
