package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side layout operators — where 100 TB performance is actually
  * won: a table laid out right makes every later scan partition-pruned
  * and every later join co-located.
  *
  * Reference analogue: the loaders write MSSQL tables with clustered PK
  * + secondary indexes (sql/00_master_setup.sql); on a lake the same
  * roles are played by partition directories (coarse pruning) and
  * in-file ordering (row-group min/max pruning).
  */
object ParquetSink {

  /** Date-partitioned event layout: `.../event_date=YYYY-MM-DD/part-*`.
    * Incremental window filters then prune whole directories before a
    * byte is read (PartitionFilters, verified in ParquetSinkSpec). */
  def writeDatePartitioned(events: DataFrame, path: String,
      tsCol: String = "ts"): Unit =
    events
      .withColumn("event_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  /** Key-clustered layout: repartition on the join/dedup key then sort
    * within partitions — row-groups become key-ranged so point/merge
    * reads skip via parquet min/max stats, and downstream same-key
    * shuffles hash identically. (True hive bucketing needs a metastore
    * table; this is the pure-directory equivalent.) */
  def writeKeyClustered(df: DataFrame, path: String, key: String,
      numFiles: Int): Unit =
    df.repartition(numFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** IVF cell layout for an embedding corpus: partition directories by
    * cluster id, so an ANN probe reads nprobe/k of the data
    * (graft.operators.Ann.ivfTopK's scale path). */
  def writeIvfPartitioned(embeddings: DataFrame, path: String,
      clusterCol: String = "__c"): Unit =
    embeddings.write.mode(SaveMode.Overwrite)
      .partitionBy(clusterCol)
      .parquet(path)

  /** True hive-bucketed table (catalog-backed): rows hash-clustered
    * into `nBuckets` files per the key, bucket spec recorded in the
    * catalog. Two tables bucketed the same way join with ZERO
    * exchanges — the shuffle was paid once at write time, which is the
    * whole game for a fact⋈fact join run daily at 100 TB (asserted in
    * SkewAndSinkSpec: no Exchange in the joined plan). */
  def writeBucketedTable(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
