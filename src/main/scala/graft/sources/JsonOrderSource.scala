package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.SafeCasts
import graft.operators.Normalize

/** Nested-order JSON ingestion → normalized relational tables.
  *
  * Mirrors the reference's source shape end-to-end: extractors pull
  * order JSON with nested `recipient_address` and arrays `item_list` /
  * `package_list` (shopee_orders_extractor.py), the transformer fans one
  * order into orders / recipient_address / order_items / packages /
  * package_items (shopee_orders_transformer.py:145-365).
  *
  * Spark-first: JSON-lines read with an EXPLICIT schema (inference is a
  * second full scan — never on the hot path), `from_json`-free because
  * the reader itself is schema'd, children via struct projection and
  * codegen'd explode. Unix epochs → UTC timestamps with the 0→null rule.
  */
object JsonOrderSource {

  val itemSchema: StructType = StructType(Seq(
    StructField("order_item_id", LongType),
    StructField("item_id", LongType),
    StructField("item_name", StringType),
    StructField("model_quantity_purchased", StringType),
    StructField("model_original_price", StringType),
    StructField("product_location_id", ArrayType(StringType))))

  val packageSchema: StructType = StructType(Seq(
    StructField("package_number", StringType),
    StructField("logistics_status", StringType),
    StructField("item_list", ArrayType(StructType(Seq(
      StructField("order_item_id", LongType),
      StructField("model_quantity", StringType)))))))

  val orderSchema: StructType = StructType(Seq(
    StructField("order_sn", StringType),
    StructField("order_status", StringType),
    StructField("total_amount", StringType),
    StructField("cod", StringType),
    StructField("create_time", LongType),
    StructField("update_time", LongType),
    StructField("recipient_address", StructType(Seq(
      StructField("name", StringType),
      StructField("city", StringType),
      StructField("zipcode", StringType)))),
    StructField("item_list", ArrayType(itemSchema)),
    StructField("package_list", ArrayType(packageSchema))))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(orderSchema).json(path)

  /** One nested frame → the five relational tables of the reference ERD. */
  def normalize(raw: DataFrame): Map[String, DataFrame] = {
    val orders = raw.select(
      col("order_sn"),
      col("order_status"),
      SafeCasts.safeFloat(col("total_amount")).as("total_amount"),
      SafeCasts.safeBool(col("cod")).as("cod"),
      SafeCasts.unixSecondsToTs(col("create_time")).as("create_time"),
      SafeCasts.unixSecondsToTs(col("update_time")).as("update_time"))

    val recipient = Normalize.childFromStruct(raw, Seq("order_sn"),
      "recipient_address",
      Seq("name" -> "name", "city" -> "city", "zipcode" -> "zipcode"))

    val items = Normalize.childFromArray(raw, Seq("order_sn"), "item_list", "item")
      .select(col("order_sn"),
        col("item.order_item_id").as("order_item_id"),
        col("item.item_id").as("item_id"),
        col("item.item_name").as("item_name"),
        SafeCasts.safeInt(col("item.model_quantity_purchased"))
          .as("model_quantity_purchased"),
        SafeCasts.safeFloat(col("item.model_original_price"))
          .as("model_original_price"),
        col("item.product_location_id").as("product_location_id"))

    val itemLocations = Normalize.childFromArray(
      items, Seq("order_sn", "order_item_id"), "product_location_id", "location_id")

    val packages = Normalize.childFromArray(raw, Seq("order_sn"), "package_list", "pkg")
      .select(col("order_sn"),
        col("pkg.package_number").as("package_number"),
        col("pkg.logistics_status").as("logistics_status"),
        col("pkg.item_list").as("item_list"))

    val packageItems = Normalize.childFromArray(
        packages, Seq("order_sn", "package_number"), "item_list", "pi")
      .select(col("order_sn"), col("package_number"),
        col("pi.order_item_id").as("order_item_id"),
        SafeCasts.safeInt(col("pi.model_quantity")).as("model_quantity"))

    Map(
      "orders" -> orders,
      "recipient_address" -> recipient,
      "order_items" -> items.drop("product_location_id"),
      "order_item_locations" -> itemLocations,
      "packages" -> packages.drop("item_list"),
      "package_items" -> packageItems)
  }
}
