package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Primary-key dedup, keep-last.
  *
  * Reference: shopee_orders_loader.py:283-340
  * `_deduplicate_shopee_dataframe` — `drop_duplicates(subset=pk,
  * keep="last")` before every full load, with a per-table PK map.
  *
  * Scale design: a single hash shuffle on the PK (window partitioning),
  * never a global sort. pandas `keep="last"` is positional (last record
  * wins); callers express "last" with an explicit ordering column — an
  * ingestion sequence number or update_time — so the operator is
  * deterministic under distribution, where "file order" is meaningless
  * across 1000 executors.
  */
object Dedup {

  /** Keep one row per `keys`, the maximum under `order` (ties must be
    * broken by the caller's ordering — include a unique column last). */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep-first variant (misa_crm_loader keeps first-seen on some paths). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
