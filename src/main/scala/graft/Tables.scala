package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet star-schema access (TESTDATA.md contract).
  *
  * All operators read through here so scans stay declarative: Catalyst
  * applies column pruning + predicate pushdown into the parquet reader
  * (reference analogue: the extractors under
  * /root/reference/src/extractors/ page JSON from REST APIs; our
  * source is columnar storage, so "extract" = a pruned parquet scan).
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events")

  val allTables: Seq[String] = starTables ++ Seq("documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * map to its microsecond TimestampType. Read it as raw nanos
    * (legacy nanosAsLong) and expose BOTH:
    *   - `ts`    timestamp (micros, for date math / output), and
    *   - `ts_ns` raw long — incremental window filters compare on this
    *     so the predicate still pushes into the parquet scan
    *     (PushedFilters); a filter on the derived `ts` would not.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Nanos since epoch for a UTC literal like "2024-03-01 00:00:00". */
  def utcNanos(ts: String): Long = {
    val inst = java.time.LocalDateTime
      .parse(ts.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    inst.getEpochSecond * 1000000000L + inst.getNano
  }
}
