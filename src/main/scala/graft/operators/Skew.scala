package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split (on by default in Spark 4) handles most skew at
  * runtime; explicit salting remains the tool when one side must be
  * pre-replicated — e.g. a fact⋈dim join where a handful of dim keys
  * cover half the fact ("hot products"), or when the skewed stage is a
  * groupBy rather than a join.
  *
  * saltedJoin: the skewed (large) side gets a random-but-deterministic
  * salt in [0, factor); the small side is replicated `factor`× with
  * every salt value; the join key becomes (key, salt), spreading each
  * hot key over `factor` reducers. Cost: small side × factor — choose
  * factor ≈ hottest-key-rows / average-partition-rows.
  */
object Skew {

  /** Deterministic per-row salt derived from stable columns (never
    * rand() — retries/speculative tasks must agree). */
  def salt(factor: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(factor)).cast("int")

  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      factor: Int, saltSource: Seq[String]): DataFrame = {
    val salted = skewed.withColumn("__salt",
      salt(factor, saltSource.map(col): _*))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key detection over a deterministic ROW-level hash-sample:
    * keys whose sampled row share exceeds `minShare`. The sample hash
    * runs over `rowIdCols` (a stable row identity), NOT the key — a
    * key-hash sample keeps all-or-none of a hot key's rows and learns
    * nothing about its mass. One pruned scan of 1/sampleMod of the
    * data with a map-side-combined count; the total rides a broadcast
    * 1-row frame, so nothing but the (small) hot-key list leaves the
    * plan. The cheap pre-pass that SIZES and SCOPES salting at 100 TB
    * — run it on yesterday's partition, persist the list. */
  def hotKeys(df: DataFrame, key: String, rowIdCols: Seq[String],
      minShare: Double, sampleMod: Int = 100): DataFrame = {
    require(sampleMod >= 1, "sampleMod must be ≥ 1 (1 = no sampling)")
    require(minShare > 0.0 && minShare <= 1.0, "minShare must be in (0, 1]")
    require(rowIdCols.nonEmpty, "rowIdCols required (row-level sample identity)")
    val sampled =
      if (sampleMod > 1)
        df.where(pmod(xxhash64(rowIdCols.map(col): _*), lit(sampleMod)) === 0)
      else df
    val counts = sampled.groupBy(col(key)).agg(count(lit(1)).as("n_sampled"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_sampled")).as("__total"))))
      .withColumn("share", col("n_sampled") / col("__total"))
      .where(col("share") >= minShare)
      .select(col(key), col("n_sampled"), round(col("share"), 6).as("share"))
  }

  /** Salting scoped to the detected hot keys: cold rows keep salt 0
    * and join exactly as before; hot rows spread over `factor`
    * reducers, and the small side is replicated ONLY for the hot keys
    * — factor×|hot| extra rows instead of factor×|small|. Same results
    * as a plain join (asserted in SkewAndSinkSpec). */
  /** The small side replicated `factor`× for hot keys only (salt 0
    * elsewhere): |small| + (factor−1)·|hot| rows — the replication
    * bound PlanAuditSpec pins. */
  private[graft] def replicateForHot(small: DataFrame, key: String,
      factor: Int, hot: Seq[Any]): DataFrame =
    small.withColumn("__salt",
      explode(when(col(key).isin(hot: _*),
        array((0 until factor).map(lit): _*)).otherwise(array(lit(0)))))

  /** ADAPTIVE: an empty hot list (the [[hotKeys]] pre-pass found no
    * key above the share threshold) degrades to the plain join — no
    * salt column, no replication explode, no widened (key, salt)
    * exchange. The same discipline as BloomPrune's broadcast tier: pay
    * the mitigation only in the regime that needs it. Both paths are
    * result-identical (SkewAndSinkSpec asserts each against the plain
    * join).
    *
    * Measured overhead of the machinery (r11, q65 data at sf0.1, one
    * window, pooled min-of-8 ×2): plain shuffle_hash join 0.60 s,
    * salted 0.83 s → the sampling pre-pass + salt column + hot-key
    * replication + widened exchange cost +0.23 s (+38 %). That is the
    * insurance premium for bounding the hot key's reducer: at sf0.1
    * a single reducer absorbs the hot third of the fact easily, so
    * plain wins; in the x10/x30 sweep (BASELINE.md, q65 3.3×
    * sub-linear at 30×) the salted exchange is what keeps the curve
    * sub-linear. Bench ratios vs the DuckDB oracle (which runs the
    * PLAIN join) therefore overstate the engine gap by that 38 %. */
  def partialSaltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      factor: Int, saltSource: Seq[String], hot: Seq[Any]): DataFrame = {
    if (hot.isEmpty) return skewed.join(small, Seq(key))
    val salted = skewed.withColumn("__salt",
      when(col(key).isin(hot: _*), salt(factor, saltSource.map(col): _*))
        .otherwise(lit(0)))
    salted.join(replicateForHot(small, key, factor, hot), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * final aggregate on key — the classic hot-key groupBy fix when one
    * key would otherwise pin a single reducer. Aggregations must be
    * decomposable (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      factor: Int, saltSource: Seq[String]): DataFrame =
    df.withColumn("__salt", salt(factor, saltSource.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).cast("bigint").as("n_rows"))
}
