package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Flat order×item CSV ingestion (the reference's export shape:
  * docs/TikTok_Orders_MultiRow_*.csv — one row per line item, order
  * columns repeated, nested fields flattened to bracket names like
  * `payment[total_amount]` / `lineitem[product_name]`).
  *
  * Re-relationalization: bracket names become `payment_total_amount` /
  * `lineitem_product_name`; the frame splits into an orders table
  * (keep-first per order id — one hash shuffle) and an items table
  * (the `lineitem_*` columns + the order key). The inverse of
  * [[graft.operators.Flatten.prefixFlatten]].
  */
object CsvFlatOrderSource {

  def read(spark: SparkSession, path: String): DataFrame =
    normalizeNames(spark.read.option("header", "true").csv(path))

  /** `a[b]` → `a_b`, strip BOM/whitespace. */
  def normalizeNames(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      val clean = c.replace("﻿", "").trim
        .replace("[", "_").replace("]", "")
      if (clean == c) d else d.withColumnRenamed(c, clean)
    }

  /** Split a flat frame into (orders, items). Order columns = everything
    * not prefixed `itemPrefix`; items keep the order key for the FK. */
  def split(flat: DataFrame, orderKey: String,
      itemPrefix: String = "lineitem_"): (DataFrame, DataFrame) = {
    val itemCols = flat.columns.filter(_.startsWith(itemPrefix)).toSeq
    val orderCols = flat.columns.filterNot(_.startsWith(itemPrefix)).toSeq
    val orders = Dedup.keepFirst(
      flat.select(orderCols.map(col): _*), Seq(orderKey),
      order = Seq(col(orderKey)))
    val items = flat.select((orderKey +: itemCols).map(col): _*)
    (orders, items)
  }
}
