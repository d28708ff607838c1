package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-load semantics: window filter, upsert/MERGE, delete+insert,
  * full replace, schema projection.
  *
  * Reference: dags/incremental_etl_dag.py:59-84 (lookback window),
  * misa_crm_loader.py:215-500 (MERGE on business key),
  * misa_crm_loader.py:847-880 + dags/incremental_refresh_bridge_dag.py
  * (delete-by-key then insert), shopee_orders_loader.py:162-211
  * (full-load replace with FK-safe cascade clear),
  * misa_crm_loader.py:123,274 (column-intersect against target schema).
  */
object Incremental {

  /** `update_time >= watermark` as a literal predicate on the scan column
    * so Catalyst pushes it into the parquet reader (PushedFilters) —
    * at 100 TB this is the difference between reading a day and reading
    * the lake. Apply BEFORE any join/explode. */
  def windowFilter(df: DataFrame, tsCol: String, watermark: String): DataFrame =
    df.where(col(tsCol) >= lit(watermark).cast("timestamp"))

  /** Variant for nano-epoch long columns. NOTE (r8): events.ts_ns is
    * now DERIVED from the physical micros timestamp, so this no longer
    * reaches PushedFilters there — incremental event windows belong on
    * [[windowFilter]] over `ts` (the physical column). Kept for long
    * epoch columns that ARE physical. */
  def windowFilterNanos(df: DataFrame, nsCol: String, watermarkNs: Long): DataFrame =
    df.where(col(nsCol) >= lit(watermarkNs))

  /** MERGE: rows from `updates` replace same-key rows in `base`; new keys
    * append. One union + one hash shuffle on `keys` (the keep-last
    * window); no driver round-trips. `order` breaks intra-source
    * duplicates (e.g. update_time); source precedence wins above it. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      order: Seq[Column] = Nil): DataFrame = {
    val cols = base.columns.toSeq
    val tagged = base.select(cols.map(col): _*).withColumn("__src", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("__src", lit(1)))
    Dedup.keepLast(tagged, keys, order :+ col("__src")).drop("__src")
  }

  /** [[upsert]] whose single window exchange is RANGE-partitioned on
    * the keys (range clusters equal keys exactly like hash), so the
    * merged output comes back in globally key-ordered partitions — a
    * consumer that wants the result key-sorted pays only an in-memory
    * sortWithinPartitions instead of a second full exchange, and the
    * range sampler reads just the key columns. Same rows as [[upsert]]
    * (asserted in OperatorsSpec); prefer plain [[upsert]] when the
    * output is consumed unordered. */
  def upsertOrdered(base: DataFrame, updates: DataFrame, keys: Seq[String],
      order: Seq[Column] = Nil): DataFrame = {
    val cols = base.columns.toSeq
    val tagged = base.select(cols.map(col): _*).withColumn("__src", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("__src", lit(1)))
      .repartitionByRange(keys.map(col): _*)
    Dedup.keepLast(tagged, keys, order :+ col("__src")).drop("__src")
  }

  /** Delete-by-key then insert (bridge refresh). The delta key set is
    * small relative to base → broadcast the anti-join side. */
  def deleteInsert(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val deltaKeys = delta.select(keys.map(col): _*).distinct()
    base.join(broadcast(deltaKeys), keys, "left_anti")
      .unionByName(delta.select(base.columns.map(col).toSeq: _*))
  }

  /** Full-load replace with FK-safe ordering: children cleared before
    * parents, parents written before children. Returns the (table, df)
    * write sequence; the caller owns the sink. `fkOrder` lists parents
    * first (e.g. orders before lineitem). */
  def fullLoadReplace(
      tables: Map[String, DataFrame],
      fkOrder: Seq[String]): Seq[(String, DataFrame)] = {
    val clearOrder = fkOrder.reverse.filter(tables.contains)
    require(clearOrder.nonEmpty, "no tables to replace")
    fkOrder.filter(tables.contains).map(t => t -> tables(t))
  }

  /** Snapshot diff — change-data-capture between two full loads: one
    * row per difference, `change_op` ∈ {insert, update, delete}. The
    * reference's full-load replace (shopee_orders_loader.py:162-211)
    * rewrites everything and learns nothing; diffing the snapshots
    * yields the minimal delta to feed [[upsert]]/[[deleteInsert]] (or
    * an SCD2 [[Scd2.applyBatch]]) instead of a full rewrite.
    *
    * One full-outer shuffle join on the key (both sides hash once,
    * AQE skew-safe); attribute tuples compare null-safely as structs,
    * so column-level nulls diff correctly. Unchanged rows are dropped
    * before anything downstream. Deletes carry the PREVIOUS attrs
    * (there is no current row to report); inserts/updates carry the
    * current ones. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
      keys: Seq[String]): DataFrame = {
    val attrs = cur.columns.filterNot(keys.contains).toSeq
    require(attrs.nonEmpty, "snapshotDiff: no non-key columns to compare")
    val p = prev.select(keys.map(col) :+
      struct(attrs.map(col): _*).as("__pa"): _*)
    val c = cur.select(keys.map(col) :+
      struct(attrs.map(col): _*).as("__ca"): _*)
    val op = when(col("__pa").isNull, lit("insert"))
      .when(col("__ca").isNull, lit("delete"))
      .when(!(col("__pa") <=> col("__ca")), lit("update"))
    val out = p.join(c, keys, "full_outer")
      .withColumn("change_op", op)
      .where(col("change_op").isNotNull)
    val reported = coalesce(col("__ca"), col("__pa"))
    out.select(keys.map(col) ++ Seq(col("change_op")) ++
      attrs.map(a => reported.getField(a).as(a)): _*)
  }

  /** Historical backfill plan: split [start, end) into fixed windows,
    * oldest first (scripts/ backfill runs in the reference iterate
    * day-windows through the same incremental path; logs/
    * backfill_results_*.json record one entry per window). Each window
    * is then processed with windowFilter + upsert — identical code path
    * to the live incremental load. */
  def backfillWindows(start: java.time.Instant, end: java.time.Instant,
      window: java.time.Duration): Seq[(java.time.Instant, java.time.Instant)] = {
    require(!window.isZero && !window.isNegative, "window must be positive")
    Iterator.iterate(start)(_.plus(window))
      .takeWhile(_.isBefore(end))
      .map(w => (w, Seq(w.plus(window), end).min))
      .toSeq
  }

  /** Project to the intersection of df columns and the target schema, in
    * target order — schema-only driver work, no data movement
    * (misa_crm_loader.py:123,274). */
  def schemaProject(df: DataFrame, targetCols: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    df.select(targetCols.filter(have.contains).map(col): _*)
  }
}
