package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split (on by default in Spark 4) handles most skew at
  * runtime; explicit salting remains the tool when one side must be
  * pre-replicated — e.g. a fact⋈dim join where a handful of dim keys
  * cover half the fact ("hot products"), or when the skewed stage is a
  * groupBy rather than a join.
  *
  * saltedJoin: the skewed (large) side gets a random-but-deterministic
  * salt in [0, factor); the small side is replicated `factor`× with
  * every salt value; the join key becomes (key, salt), spreading each
  * hot key over `factor` reducers. Cost: small side × factor — choose
  * factor ≈ hottest-key-rows / average-partition-rows.
  */
object Skew {

  /** Deterministic per-row salt derived from stable columns (never
    * rand() — retries/speculative tasks must agree). */
  def salt(factor: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(factor)).cast("int")

  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      factor: Int, saltSource: Seq[String]): DataFrame = {
    val salted = skewed.withColumn("__salt",
      salt(factor, saltSource.map(col): _*))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * final aggregate on key — the classic hot-key groupBy fix when one
    * key would otherwise pin a single reducer. Aggregations must be
    * decomposable (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      factor: Int, saltSource: Seq[String]): DataFrame =
    df.withColumn("__salt", salt(factor, saltSource.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__c")).cast("bigint").as("n_rows"))
}
