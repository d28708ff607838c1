package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history: every attribute change becomes a new
  * version row carrying `valid_from` / `valid_to` / `version` /
  * `is_current`, instead of overwriting in place.
  *
  * Reference: the loaders keep only the latest version per business key
  * (misa_crm_loader.py:215-500 MERGE "when matched then update");
  * SCD2 is the history-preserving twin of that MERGE — the standard
  * warehouse answer when "what did this dimension look like when the
  * fact happened" must stay answerable (the same point-in-time concern
  * [[AsOfJoin]] serves on the query side).
  *
  * Scale design: everything is windowed over ONE hash partitioning on
  * the business key — the tie-break, change-point, validity and version
  * windows all share `partitionBy(keys)`, and their sort orders are
  * prefix-compatible, so the whole history build is a single
  * exchange+sort regardless of corpus size. No join, no driver state.
  * Incremental application ([[applyBatch]]) rebuilds ONLY the keys
  * present in the batch (broadcast semi/anti split); untouched keys
  * pass through without a shuffle, which on a bucketed/partitioned lake
  * layout becomes a partial rewrite of touched buckets only (the
  * [[graft.streaming.StreamingSink]] pattern).
  */
object Scd2 {

  /** Build the full SCD2 history from a change log.
    *
    * Consecutive rows with identical attribute tuples collapse into one
    * version (re-stating the same value is not a change). Rows sharing
    * the exact same (key, ts) are tie-broken deterministically: the row
    * whose attribute tuple sorts LAST wins — the winner must be a pure
    * function of the data, not of arrival order, or re-runs over a
    * shuffled corpus produce different histories.
    *
    * Output: keys ++ attrCols ++ (valid_from, valid_to, version,
    * is_current), with `valid_to = null` on each key's current row and
    * half-open validity `[valid_from, valid_to)`.
    */
  def fromChangeLog(changes: DataFrame, keys: Seq[String],
      attrCols: Seq[String], tsCol: String): DataFrame = {
    require(keys.nonEmpty && attrCols.nonEmpty, "keys and attrCols required")
    val attrs = struct(attrCols.map(col): _*)
    val byKey = Window.partitionBy(keys.map(col): _*)
    // (ts, attrs) refines (ts): Catalyst satisfies the later windows'
    // required ordering from this sort's prefix — one exchange+sort.
    val tieW = byKey.orderBy(col(tsCol), attrs)
    val w = byKey.orderBy(col(tsCol))
    changes
      .where(col(tsCol).isNotNull)
      // same-(key, ts) dedup: keep the row whose attrs sort last
      .withColumn("__nxt_ts", lead(col(tsCol), 1).over(tieW))
      .where(col("__nxt_ts").isNull || col("__nxt_ts") =!= col(tsCol))
      // change points: attrs differ from the previous surviving row
      .withColumn("__prev", lag(attrs, 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> attrs))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keys.map(col) ++ attrCols.map(col) ++ Seq(
        col("valid_from"), col("valid_to"), col("version"),
        col("is_current")): _*)
  }

  /** Point-in-time fact⋈dimension join: each fact row gets the
    * dimension version active at its timestamp ("what did this
    * dimension look like when the fact happened" — the query SCD2
    * history exists to answer). Because [[fromChangeLog]]'s versions
    * tile each key's timeline contiguously (valid_to = next
    * valid_from, current version open-ended), the version active at t
    * is exactly the last one with valid_from ≤ t — an as-of join on
    * valid_from, so this composes [[AsOfJoin]]'s merge formulation:
    * ONE shuffle on the key, no range join, no per-key collect. Facts
    * before a key's first version get nulls (as-of LEFT semantics).
    * Dimension columns arrive prefixed `dim_`. */
  def pointInTime(facts: DataFrame, history: DataFrame, key: String,
      factTs: Column, factSeq: Column): DataFrame =
    AsOfJoin.asOf(facts, factTs, factSeq,
      history, col("valid_from"), col("version"), key, prefix = "dim_")

  /** Apply a batch of change rows (keys ++ attrCols ++ tsCol) to an
    * existing history, touching ONLY the keys present in the batch:
    * history rows of untouched keys pass through verbatim (anti join
    * against the broadcast batch-key set — no shuffle of the history),
    * touched keys are re-derived from their existing versions plus the
    * new rows through [[fromChangeLog]]. Late-arriving changes are
    * therefore handled exactly: a change landing between two existing
    * versions splits them, and a re-statement of an existing value
    * collapses away. Equivalent to rebuilding from the full log
    * (asserted in Scd2Spec), at the cost of the batch's keys only.
    */
  def applyBatch(history: DataFrame, updates: DataFrame, keys: Seq[String],
      attrCols: Seq[String], tsCol: String): DataFrame = {
    val logCols = keys.map(col) ++ attrCols.map(col)
    val batchKeys = updates.select(keys.map(col): _*).distinct()
    val untouched = history.join(broadcast(batchKeys), keys, "left_anti")
    val touchedLog = history.join(broadcast(batchKeys), keys, "left_semi")
      .select(logCols :+ col("valid_from").as(tsCol): _*)
      .unionByName(updates.select(logCols :+ col(tsCol): _*))
    untouched.unionByName(
      fromChangeLog(touchedLog, keys, attrCols, tsCol))
  }
}
