package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order×item flatten with prefixed columns + multiplicity flags.
  *
  * Reference: misa_crm_transformer.py:206-338
  * `_transform_sale_orders_batch` — every order×item pair becomes one row
  * with `order_*` and `item_*` prefixed columns plus `has_multiple_items`
  * and `total_items_in_order`.
  *
  * Scale design: the multiplicity count is a window over the join key —
  * it rides the same hash shuffle as the join (same key), so AQE can
  * coalesce; no extra aggregation pass or second shuffle of the fact.
  */
object Flatten {
  def prefixFlatten(
      orders: DataFrame, items: DataFrame,
      orderKey: String, itemKey: String,
      orderPrefix: String = "order_", itemPrefix: String = "item_"): DataFrame = {
    val o = orders.columns.foldLeft(orders)((d, c) => d.withColumnRenamed(c, orderPrefix + c))
    val i = items.columns.foldLeft(items)((d, c) => d.withColumnRenamed(c, itemPrefix + c))
    val joined = o.join(i, o(orderPrefix + orderKey) === i(itemPrefix + itemKey), "left")
    val w = Window.partitionBy(col(orderPrefix + orderKey))
    joined
      .withColumn("total_items_in_order",
        count(col(itemPrefix + itemKey)).over(w).cast("bigint"))
      .withColumn("has_multiple_items", col("total_items_in_order") > 1)
  }
}
