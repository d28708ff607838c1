package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join (point-in-time lookup): for each left row, attach the
  * latest right row with `right.ts <= left.ts` within the same key —
  * the attribution/"state at time T" primitive the reference's staging
  * schema answers with correlated lookups on its `update_time` indexes
  * (sql/00_master_setup.sql IX_*_update_time).
  *
  * Spark has no built-in as-of operator, and the two obvious encodings
  * rot at scale: a range self-join is quadratic inside each key, and a
  * per-key `collect_list` + UDF holds whole keys in memory. This is the
  * sort-merge formulation instead: tag both sides, union, ONE window
  * over (key, ts, side, seq) carrying the last-seen right payload
  * forward. Exactly one hash shuffle on the key (the window exchange),
  * linear work per row, no join at all — the same plan shape Spark
  * gives a window dedup, so AQE skew handling applies unchanged at
  * 100 TB.
  *
  * Tie semantics: a right row at ts == left ts IS visible (side orders
  * right before left at equal ts); among right rows with equal ts the
  * one with the largest `rightSeq` wins. Left rows with no earlier
  * right row get nulls — an as-of LEFT join.
  */
object AsOfJoin {

  /** All `left` columns, plus each `right` column as `<prefix><name>`.
    * `leftTs`/`rightTs` must be mutually comparable (use the same
    * integer epoch unit on both sides for exact semantics); `*Seq` are
    * per-row tiebreakers making the merge order total. */
  def asOf(left: DataFrame, leftTs: Column, leftSeq: Column,
      right: DataFrame, rightTs: Column, rightSeq: Column,
      key: String, prefix: String = "asof_"): DataFrame = {
    val lpType = StructType(left.schema.fields)
    val rpType = StructType(right.schema.fields)
    val lp = struct(left.columns.map(col): _*)
    val rp = struct(right.columns.map(col): _*)
    val leftU = left.select(col(key).as("__k"), leftTs.as("__ts"),
      leftSeq.as("__seq"), lit(1).as("__side"), lp.as("__lp"),
      lit(null).cast(rpType).as("__rp"))
    val rightU = right.select(col(key).as("__k"), rightTs.as("__ts"),
      rightSeq.as("__seq"), lit(0).as("__side"), lit(null).cast(lpType).as("__lp"),
      rp.as("__rp"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = leftU.unionByName(rightU)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val leftCols = left.columns.map(c => col(s"__lp.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__match.$c").as(s"$prefix$c"))
    merged.select(leftCols ++ rightCols: _*)
  }
}
