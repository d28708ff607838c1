package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ParquetSink

/** The etl_control watermark cycle that makes incremental runs
  * self-driving (reference: sql/00_master_setup.sql:65-95 —
  * etl_control.batch_runs / data_sources.last_extract_time — and
  * dags/incremental_etl_dag.py:59-84, which reads the last successful
  * run to size its window and writes the new watermark back after
  * load).
  *
  * Control table: an append-only parquet log of batch commits,
  * (source_id, batch_id, watermark_us, records_loaded, status). The
  * effective watermark of a source is the MAX over its SUCCESS rows —
  * append-only means a crashed run (no commit row) simply leaves the
  * watermark where it was.
  *
  * Exactly-once: the window filter is INCLUSIVE of the stored
  * watermark (`ts >= wm`) and the new watermark is max(ts) actually
  * seen, so the boundary row is re-read on the next run; the load is
  * an upsert (MERGE) on the business key, so the overlap — and any
  * crash-replay of a whole window — lands every row exactly once.
  * Commit ordering is load-then-watermark: a crash between them
  * replays the window, never skips it.
  */
object EtlControl {

  /** Last committed watermark (epoch micros) for `sourceId`, or
    * `defaultUs` if the control table has no SUCCESS rows for it. */
  /** A control/target dir counts as present only when it has content —
    * a pre-created empty directory (mktemp conventions) must behave
    * like a missing one, not crash parquet schema inference. */
  private[operators] def nonEmptyDir(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def lastWatermarkMicros(spark: SparkSession, controlDir: String,
      sourceId: String, defaultUs: Long): Long = {
    if (!nonEmptyDir(spark, controlDir)) return defaultUs
    val row = spark.read.parquet(controlDir)
      .where(col("source_id") === sourceId && col("status") === "SUCCESS")
      .agg(max("watermark_us")).head()
    if (row.isNullAt(0)) defaultUs else row.getLong(0)
  }

  /** Append one commit row to the control log (the batch_runs insert —
    * append-only, so commits from concurrent sources never rewrite
    * each other). */
  def commitRun(spark: SparkSession, controlDir: String, sourceId: String,
      batchId: String, watermarkUs: Long, recordsLoaded: Long,
      status: String = "SUCCESS"): Unit = {
    import spark.implicits._
    Seq((sourceId, batchId, watermarkUs, recordsLoaded, status))
      .toDF("source_id", "batch_id", "watermark_us", "records_loaded", "status")
      .withColumn("committed_at", current_timestamp())
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(controlDir)
  }

  /** Row-count bounds for the next batch derived from the control
    * log's history (the "row-count delta vs prior batch" gate the
    * reference checks by hand): bounds are the last SUCCESS batch's
    * records_loaded ± tolerance. IDLE commits (cycles that saw no new
    * rows — see [[runIncrementalCycle]]) are excluded, so a quiet
    * period cannot poison the bounds; the watermark+commit-time sort
    * is deterministic under replayed-boundary ties. Returns None when
    * no history exists (first batch — nothing to compare against).
    * Feed the result to [[Validate.RowCountBetween]]. */
  def expectedRowBounds(spark: SparkSession, controlDir: String,
      sourceId: String, tolerance: Double = 0.5): Option[(Long, Long)] = {
    if (!nonEmptyDir(spark, controlDir)) return None
    val rows = spark.read.parquet(controlDir)
      .where(col("source_id") === sourceId && col("status") === "SUCCESS")
      .orderBy(desc("watermark_us"), desc("committed_at"))
      .select("records_loaded").limit(1).collect()
    rows.headOption.map { r =>
      val n = r.getLong(0).toDouble
      (math.floor(n * (1 - tolerance)).toLong,
        math.ceil(n * (1 + tolerance)).toLong)
    }
  }

  /** Diff-driven FULL-SNAPSHOT cycle: the reference's full-load
    * sources (shopee full_load DAG) rewrite their whole target every
    * run whether anything changed or not. This cycle diffs the
    * incoming snapshot against the live target
    * ([[Incremental.snapshotDiff]] — one full-outer shuffle), applies
    * the delta only when one exists, and commits the CHANGE COUNT to
    * the control log: an unchanged snapshot is an IDLE commit with
    * ZERO target writes (files stay byte-identical — asserted in
    * EtlControlSpec), and the log's records_loaded now measures real
    * churn, so [[expectedRowBounds]] gates on "how much changed",
    * which is the quantity that signals an upstream incident. Returns
    * (inserts, updates, deletes). */
  def runSnapshotCycle(spark: SparkSession, controlDir: String,
      sourceId: String, snapshot: DataFrame, keys: Seq[String],
      targetDir: String, batchId: String): (Long, Long, Long) = {
    val fs = new org.apache.hadoop.fs.Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(targetDir))) {
      val n = snapshot.count()
      ParquetSink.atomicReplace(spark, targetDir)(
        staging => snapshot.write.parquet(staging))
      commitRun(spark, controlDir, sourceId, batchId,
        watermarkUs = 0L, recordsLoaded = n, status = "SUCCESS")
      return (n, 0L, 0L)
    }
    val target = spark.read.parquet(targetDir)
    val diff = Incremental.snapshotDiff(target, snapshot, keys).persist()
    try {
      val counts = diff.groupBy("change_op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (ins, upd, del) = (counts.getOrElse("insert", 0L),
        counts.getOrElse("update", 0L), counts.getOrElse("delete", 0L))
      val churn = ins + upd + del
      if (churn > 0)
        // the new target IS the snapshot (it's a full load); the diff
        // decided WHETHER to write, and its counts are the audit record
        ParquetSink.atomicReplace(spark, targetDir)(
          staging => snapshot.write.parquet(staging))
      commitRun(spark, controlDir, sourceId, batchId, watermarkUs = 0L,
        recordsLoaded = churn, status = if (churn > 0) "SUCCESS" else "IDLE")
      (ins, upd, del)
    } finally { diff.unpersist(); () }
  }

  /** Self-driving incremental DEDUP-CLUSTER cycle: fold a delivered
    * near-dup pair batch into the persisted (node, component)
    * assignment ([[DupGroups.updateClusters]] — only components the
    * batch touches are rebuilt), publish atomically, commit the batch
    * to the control log. Exactly-once under at-least-once delivery,
    * two ways: a batch id already committed SUCCESS is skipped without
    * running a job, and a crash-window replay (published assignment,
    * missing commit) re-folds the same pairs — a no-op by
    * updateClusters' replay idempotence (DupGroupsSpec). The prior
    * assignment is read from parquet, satisfying updateClusters'
    * materialized-input contract. Returns (nAssignments, applied). */
  def runDedupCycle(spark: SparkSession, controlDir: String,
      sourceId: String, pairs: DataFrame, aCol: String, bCol: String,
      assignDir: String, batchId: String, watermarkUs: Long = 0L,
      failBeforeCommit: Boolean = false): (Long, Boolean) = {
    if (nonEmptyDir(spark, controlDir) && !spark.read.parquet(controlDir)
        .where(col("source_id") === sourceId && col("batch_id") === batchId &&
          col("status") === "SUCCESS")
        .isEmpty)
      return (spark.read.parquet(assignDir).count(), false)
    val updated =
      if (!nonEmptyDir(spark, assignDir))
        DupGroups.connectedComponents(pairs, aCol, bCol)
      else
        DupGroups.updateClusters(spark.read.parquet(assignDir), pairs,
          aCol, bCol)
    ParquetSink.atomicReplace(spark, assignDir)(
      staging => updated.write.parquet(staging))
    // the assignment is durably in parquet now — free the CC result's
    // reliable-checkpoint files, or a per-cycle caller (the streaming
    // continuousDedup path) grows the checkpoint store one snapshot
    // per batch forever
    CacheRegistry.freeReliableCheckpoints(updated)
    val n = spark.read.parquet(assignDir).count()
    if (!failBeforeCommit)
      commitRun(spark, controlDir, sourceId, batchId, watermarkUs, n)
    (n, true)
  }

  /** One self-driving incremental cycle against a parquet target:
    * read watermark → pushed-down window scan → MERGE into target
    * (staged atomic swap) → commit new watermark. Returns
    * (newWatermarkUs, deltaRows).
    *
    * `failBeforeCommit` is a crash-injection hook for the
    * exactly-once spec: it stops after the target is published but
    * before the watermark commit — the worst-ordered crash, which the
    * next cycle must absorb by replaying the window. */
  def runIncrementalCycle(spark: SparkSession, controlDir: String,
      sourceId: String, source: DataFrame, tsCol: String,
      keys: Seq[String], targetDir: String, defaultWatermarkUs: Long,
      batchId: String, failBeforeCommit: Boolean = false): (Long, Long) = {
    val wm = lastWatermarkMicros(spark, controlDir, sourceId, defaultWatermarkUs)
    // literal timestamp predicate on the scan column → PushedFilters
    val delta = source.where(col(tsCol) >= timestamp_micros(lit(wm)))
    val stats = delta.agg(
      count(lit(1)).as("n"), max(unix_micros(col(tsCol))).as("mx"),
      count(when(unix_micros(col(tsCol)) > wm, 1)).as("nNew")).head()
    val (nRows, newWm) =
      (stats.getLong(0), if (stats.isNullAt(1)) wm else stats.getLong(1))
    val nNew = stats.getLong(2)
    if (nRows > 0) {
      val fs = new org.apache.hadoop.fs.Path(targetDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val merged =
        if (fs.exists(new org.apache.hadoop.fs.Path(targetDir))) {
          val target = spark.read.parquet(targetDir)
          Incremental.upsert(target, delta.select(target.columns.map(col).toSeq: _*),
            keys, order = Seq(col(tsCol)))
        } else
          // bootstrap load: the first window can already carry several
          // versions of one key — same keep-last contract as the MERGE
          Dedup.keepLast(delta, keys, Seq(col(tsCol)))
      // merged reads the live target, so materialize to staging BEFORE
      // the swap (atomicReplace stages for exactly this reason)
      ParquetSink.atomicReplace(spark, targetDir)(
        staging => merged.write.parquet(staging))
    }
    // a cycle that saw only the replayed boundary rows commits as IDLE:
    // audit-visible, but excluded from the watermark read and from
    // expectedRowBounds (an idle period must not poison the row-count
    // gate or tie-break against the real prior batch)
    val status = if (nNew > 0) "SUCCESS" else "IDLE"
    if (!failBeforeCommit)
      // records_loaded = rows strictly above the prior watermark: the
      // replayed inclusive-boundary rows are MERGE no-ops, and counting
      // them would inflate the baseline expectedRowBounds derives for
      // the next batch's row-count gate
      commitRun(spark, controlDir, sourceId, batchId, newWm, nNew, status)
    (newWm, nRows)
  }
}
