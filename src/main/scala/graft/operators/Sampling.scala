package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-splitting primitives for training-data pipelines.
  *
  * The split assignment must be a pure function of the row's identity —
  * never `rand()` — so that (a) re-runs and backfills land every row in
  * the same split, (b) the split survives repartitioning/recovery, and
  * (c) two engines agree on it (the assignment is md5-based and
  * oracle-checked against DuckDB). This is the deterministic-split
  * discipline a 100 TB corpus needs: assignment is row-local, no
  * shuffle, no state.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id: first 8 hex chars
    * of md5(id) as an integer — uniform, engine-portable (DuckDB:
    * ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % buckets). */
  def hashBucket(idCol: Column, buckets: Int = 100): Column =
    (conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Adds a `split` column: "train"/"val"/"test" by cumulative
    * percentage cut points (e.g. 80/10/10 → trainPct=80, valPct=10).
    * Percentages are scaled to the bucket count, so a non-default
    * `buckets` changes split granularity, not the split fractions. */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10,
      buckets: Int = 100): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val cutTrain = trainPct * buckets / 100
    val cutVal = (trainPct + valPct) * buckets / 100
    // integer-truncated cuts must not silently erase a requested split
    require(trainPct == 0 || cutTrain > 0,
      s"buckets=$buckets too coarse for trainPct=$trainPct")
    require(valPct == 0 || cutVal > cutTrain,
      s"buckets=$buckets too coarse for valPct=$valPct")
    val b = hashBucket(col(idCol), buckets)
    df.withColumn("split",
      when(b < cutTrain, lit("train"))
        .when(b < cutVal, lit("val"))
        .otherwise(lit("test")))
  }

  /** Seeded per-stratum sampling (e.g. balance sources or languages in
    * a training mix): keeps ~`fractions(stratum)` of each stratum,
    * deterministic under the seed via the same md5 discipline (id and
    * stratum both feed the hash so strata draw independently). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    val u = conv(substring(
      md5(concat_ws("|", lit(seed), col(stratumCol), col(idCol).cast("string"))),
      1, 8), 16, 10).cast("long").cast("double") / 4294967296.0
    df.where(u < frac)
  }
}
