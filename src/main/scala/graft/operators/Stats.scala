package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Row-count reports, per-batch stats, batch-run audit log.
  *
  * Reference: query/đếm số dòng mỗi bảng.sql (per-table row counts via
  * sys.partitions), misa_crm_loader.py:1125 (COUNT(DISTINCT
  * etl_batch_id) batch stats), sql/00_master_setup.sql:65-95
  * (etl_control audit table: per-run source, window, row counts,
  * status).
  *
  * Scale: `count(*)` on parquet is answered from footer metadata (no
  * data read); the grouped stats are partial-aggregated map-side before
  * one shuffle on the (small) group key.
  */
object Stats {

  /** Per-table row counts, descending — the reference's most-run
    * query, answered the way the reference itself answers it: from
    * METADATA. The reference counts via `sys.partitions` (query/đếm số
    * dòng mỗi bảng.sql); the parquet analogue is the footer row-group
    * counts ([[graft.sources.ParquetMeta.rowCount]] — driver-pooled
    * footer reads, or a Spark job over the file listing past a few
    * hundred files). Exact, zero data pages read; equality with the
    * scan-based form is spec'd in ParquetMetaSpec. r11: 0.9 s of nine
    * no-column scans at the x10 tier → ~20 ms. */
  def rowCounts(spark: SparkSession, sfDir: String,
      tables: Seq[String] = Tables.allTables): DataFrame = {
    import spark.implicits._
    tables.map { t =>
        (t, graft.sources.ParquetMeta.rowCount(spark, s"$sfDir/$t.parquet"))
      }.toDF("table_name", "n_rows")
      .orderBy(desc("n_rows"), col("table_name"))
  }

  /** Scan-based twin of [[rowCounts]] for inputs that are NOT immutable
    * parquet directories (views, post-filter frames): one no-column
    * vectorized scan per table, unioned. */
  def rowCountsScan(spark: SparkSession, sfDir: String,
      tables: Seq[String] = Tables.allTables): DataFrame =
    tables.map { t =>
      Tables.load(spark, sfDir, t)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"))
    }.reduce(_ unionByName _).orderBy(desc("n_rows"), col("table_name"))

  /** Per-day batch stats over an event feed: rows, distinct actors,
    * exact-decimal value total (cross-engine stable). */
  def batchStats(events: DataFrame): DataFrame =
    // two-phase distinct: partial-dedup on (date, user) BEFORE the
    // exchange replaces the count_distinct Expand — the partial agg
    // ships one row per (date, user) instead of 2× every event row,
    // and the second agg is distinct-pair-sized. Exact: n_events and
    // total_value re-aggregate from the per-user partials; n_users
    // counts non-null user groups (count_distinct's null contract).
    // Measured x100 (100 M events): 2.03 → 1.76 s (BASELINE.md r12).
    events.groupBy(to_date(col("ts")).as("batch_date"), col("user_id"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("value").cast("decimal(18,2)")).as("__v"))
      .groupBy("batch_date")
      .agg(
        sum(col("__n")).as("n_events"),
        count(col("user_id")).as("n_users"),
        sum(col("__v")).cast("double").as("total_value"))
      .sortWithinPartitions("batch_date")

  /** Batch-run audit rows: one per source with run window + volume +
    * derived status (etl_control analogue). */
  def auditLog(events: DataFrame): DataFrame =
    events.groupBy(col("event_type").as("etl_source"))
      .agg(
        count(lit(1)).as("n_rows"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .withColumn("status", when(col("n_rows") > 0, lit("SUCCESS")).otherwise(lit("EMPTY")))
      .sortWithinPartitions("etl_source")

  /** Sketch-based batch stats for 100 TB feeds: HLL++
    * `approx_count_distinct` replaces the exact distinct (whose
    * count-distinct expand doubles shuffle volume) with a fixed-size
    * mergeable sketch — map-side partials are ~1.5 KB per group
    * regardless of cardinality. Default rsd 2.3 %; drift vs exact is
    * bounded in AnalyticsSpec. */
  def approxBatchStats(events: DataFrame, rsd: Double = 0.023): DataFrame =
    events.groupBy(to_date(col("ts")).as("batch_date"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .sortWithinPartitions("batch_date")

  /** Per-batch mergeable sketch ARTIFACTS (Datasketches HLL): one
    * binary sketch per (batch_date, key) plus exact row counts. Unlike
    * `approx_count_distinct` — whose HLL++ buffer lives only inside
    * one query — these sketches are values: persist them next to the
    * batch (a few KB per group at lgK=12) and any later query answers
    * cross-batch distinct counts by UNIONING sketches instead of
    * rescanning source data. At 100 TB this turns "distinct users this
    * quarter" from a lake scan into a metadata-scale merge; the
    * reference's etl_control row counts are the exact-count analogue
    * of the same per-batch-artifact discipline. */
  def sketchArtifacts(events: DataFrame, keyCol: String,
      distinctCol: String, lgK: Int = 12): DataFrame =
    events.groupBy(to_date(col("ts")).as("batch_date"), col(keyCol))
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Merge persisted sketch artifacts: estimates are IDENTICAL to a
    * direct sketch over the union of the batches (HLL union is exact
    * over sketch state — asserted in AnalyticsSpec), so pre-batched
    * rollups lose nothing vs a full rescan. */
  def mergeSketches(artifacts: DataFrame, groupCols: Seq[String]): DataFrame =
    artifacts.groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"),
        sum(col("n_events")).as("n_events"))

  /** Theta-sketch per-batch artifacts: like [[sketchArtifacts]] but
    * supporting full SET ALGEBRA — theta sketches intersect and
    * difference, not just union, so retention questions ("how many of
    * yesterday's users came back?") are answered from the persisted
    * artifacts alone, no source rescan. Below ~2^lgK distinct keys the
    * sketch is in exact mode and the estimates are exact counts. */
  def thetaArtifacts(events: DataFrame, keyCol: String,
      distinctCol: String): DataFrame =
    events.groupBy(to_date(col("ts")).as("batch_date"), col(keyCol))
      .agg(theta_sketch_agg(col(distinctCol)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Day-over-day retention from theta artifacts: per (key, date),
    * active = |day|, retained = |day ∩ prev day|, churned = |prev \
    * day|, new = |day \ prev|. One lag window over the artifact frame
    * (rows = days × keys — metadata scale regardless of corpus size). */
  def retentionFromSketches(artifacts: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("batch_date")
    artifacts
      .withColumn("__prev", lag(col("sketch"), 1).over(w))
      .select(col("batch_date"), col(keyCol),
        theta_sketch_estimate(col("sketch")).as("n_active"),
        when(col("__prev").isNull, lit(null).cast("bigint"))
          .otherwise(theta_sketch_estimate(
            theta_intersection(col("sketch"), col("__prev")))).as("n_retained"),
        when(col("__prev").isNull, lit(null).cast("bigint"))
          .otherwise(theta_sketch_estimate(
            theta_difference(col("sketch"), col("__prev")))).as("n_new"),
        when(col("__prev").isNull, lit(null).cast("bigint"))
          .otherwise(theta_sketch_estimate(
            theta_difference(col("__prev"), col("sketch")))).as("n_churned"))
  }

  /** Tumbling-window rollup (batch form of the streaming windowed
    * aggregate): epoch-aligned fixed windows via `window()`, partial
    * aggregation map-side, one shuffle on (window, key). */
  def tumblingStats(events: DataFrame, width: String,
      keyCol: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col(keyCol), col("n_events"), col("total_value"))

  /** Top-n rows per group by `order` (desc-ranked via the caller's
    * Column order), with the rank exposed as `rnk`. Spark rewrites the
    * `row_number <= n` filter into WindowGroupLimit, so each shuffle
    * partition keeps only its top-n rows BEFORE the sort — the
    * per-group data volume at 100 TB is n·|groups|, not |rows|
    * (asserted in PlanAuditSpec). Ranking columns must make the order
    * total (append a unique key) or ranks at ties are nondeterministic. */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], n: Int): DataFrame =
    df.withColumn("rnk",
        row_number().over(
          Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)))
      .where(col("rnk") <= n)
}
