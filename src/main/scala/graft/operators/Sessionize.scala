package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong
  * to one session while the gap between them stays ≤ `gap`; a larger
  * gap starts a new session. The batch twin of the reference's 15-min
  * incremental micro-batch windows (dags/incremental_etl_dag.py:59-84),
  * and the standard first step of clickstream / training-log analytics.
  *
  * Plan shape: lag + running sum share one window spec (partition by
  * key, order by ts,seq), so Catalyst plans a single exchange + sort —
  * ONE shuffle on the key, no self-join, no per-key collect. Gap
  * arithmetic is integer (caller supplies an epoch column, e.g. micros)
  * so session boundaries are exact and engine-portable.
  */
object Sessionize {

  /** Adds `session_id` (1-based ordinal per key, in time order).
    * `tsEpoch` must be an integer epoch column (same unit as `gap`);
    * `seq` breaks ts ties to keep the order total. */
  def withSessionId(events: DataFrame, key: String, tsEpoch: Column,
      seq: Column, gap: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(tsEpoch, seq)
    val newSession = when(
      tsEpoch - lag(tsEpoch, 1).over(order) <= gap, lit(0)).otherwise(lit(1))
    events.withColumn("session_id",
      sum(newSession).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
