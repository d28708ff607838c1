package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Nested-JSON → relational normalization.
  *
  * Reference: shopee_orders_transformer.py:145-365 — one order JSON fans
  * out into orders / recipient_address / order_items /
  * order_item_locations / packages / package_items; child tables carry
  * the parent key (`order_sn`), array fields (`item_list`,
  * `package_list`, `product_location_id`) explode into rows.
  *
  * Spark-first: `from_json` with an explicit schema (never inference on
  * the hot path — inference is a second full scan), struct field
  * projection for 1:1 children, `explode`/`posexplode` (codegen'd
  * generators) for 1:N. Parsing is row-local → no shuffle at all; the
  * fan-out is pipelined inside whole-stage codegen.
  */
object Normalize {

  /** Parse a JSON string column against an explicit schema. */
  def parseJson(df: DataFrame, jsonCol: String, schema: DataType,
      as: String = "parsed"): DataFrame =
    df.withColumn(as, from_json(col(jsonCol), schema))

  /** Child table: parent keys + fields projected from a struct column.
    * Rows where the struct is null are dropped (reference skips orders
    * with no recipient_address, shopee_orders_transformer.py:229-232). */
  def childFromStruct(df: DataFrame, parentKeys: Seq[String],
      structCol: String, fields: Seq[(String, String)]): DataFrame =
    df.where(col(structCol).isNotNull)
      .select(parentKeys.map(col) ++
        fields.map { case (f, as) => col(s"$structCol.$f").as(as) }: _*)

  /** Child table: parent keys + one row per array element
    * (item_list → order_items, shopee_orders_transformer.py:245-314). */
  def childFromArray(df: DataFrame, parentKeys: Seq[String],
      arrayCol: String, as: String): DataFrame =
    df.select(parentKeys.map(col) :+ explode(col(arrayCol)).as(as): _*)

  /** As childFromArray but keeps the element ordinal (positional PK for
    * arrays without a natural key). */
  def childFromArrayWithPos(df: DataFrame, parentKeys: Seq[String],
      arrayCol: String, as: String, posAs: String = "pos"): DataFrame =
    df.select(parentKeys.map(col) :+ posexplode(col(arrayCol)): _*)
      .withColumnRenamed("pos", posAs).withColumnRenamed("col", as)
}
