package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ETL audit columns appended to every loaded frame.
  *
  * Reference: shopee_orders_transformer.py:88-95 `_add_etl_metadata`
  * (etl_batch_id uuid, etl_created_at/updated_at now(), etl_source tag)
  * and the DEFAULT columns of sql/00_master_setup.sql staging tables.
  *
  * `at` is injectable so batch runs are reproducible/testable; production
  * callers pass None and get `current_timestamp()` (evaluated once per
  * query, constant-folded — not per row).
  */
object EtlMeta {
  def withEtlMetadata(
      df: DataFrame,
      batchId: String,
      source: String,
      at: Option[java.sql.Timestamp] = None): DataFrame = {
    val ts = at.map(t => lit(t)).getOrElse(current_timestamp())
    df.withColumn("etl_batch_id", lit(batchId))
      .withColumn("etl_created_at", ts)
      .withColumn("etl_updated_at", ts)
      .withColumn("etl_source", lit(source))
  }
}
