package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval (range) join: points joined to the intervals that
  * contain them, with NO equi key.
  *
  * Reference analogue: incident/promo-window attribution over the
  * event feed — "every event inside any error-burst window" — the
  * downstream query shape the reference's staged events table feeds.
  *
  * Spark has no range-join optimization: `a JOIN b ON a.ts >= b.s AND
  * a.ts < b.e` plans as BroadcastNestedLoopJoin (|points|·|intervals|
  * comparisons — fine only while intervals broadcast AND the product
  * stays small) or a cartesian. The standard scale rewrite (used by
  * the Databricks range-join hint and DuckDB's IEJoin literature) is
  * BINNING: quantize time into fixed bins of `binUs` micros; an
  * interval registers in each bin it overlaps, a point lives in
  * exactly ONE bin, and the join becomes a plain shuffled equi-join
  * on the bin id followed by the exact containment predicate. Every
  * matching (point, interval) pair meets in exactly one bin — the
  * point's own — so the output needs NO dedup, and non-matching pairs
  * from distant bins are never materialized.
  *
  * Cost: |points| + Σ(interval span/binUs + 1) shuffled rows instead
  * of a nested-loop product. Pick `binUs` ≈ the typical interval
  * length (each interval then lands in ≤ 2 bins); a burst of
  * same-bin activity is an AQE-splittable skewed JOIN partition, not
  * a window/collect hotspot. Exactness vs the naive non-equi join is
  * asserted in RangeJoinSpec (incl. multi-bin intervals and
  * inclusive-start/exclusive-end boundaries); the no-BNLJ plan shape
  * is pinned in PlanAuditSpec.
  */
object RangeJoin {

  /** Join each `points` row (integer-micros column `ptUsCol`) to every
    * `intervals` row whose [`startUsCol`, `endUsCol`) contains it.
    * Column sets must be disjoint (rename before calling). Zero- and
    * negative-length intervals match nothing (filtered before the bin
    * explode — Spark's `sequence(a, b)` would count DOWN for b < a and
    * fabricate bins). */
  def binnedIntervalJoin(points: DataFrame, ptUsCol: String,
      intervals: DataFrame, startUsCol: String, endUsCol: String,
      binUs: Long): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    val ivBins = intervals
      .where(col(endUsCol) > col(startUsCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startUsCol) / binUs),
        floor((col(endUsCol) - 1) / binUs))))
    points.withColumn("__bin", floor(col(ptUsCol) / binUs))
      .join(ivBins, Seq("__bin"))
      .where(col(ptUsCol) >= col(startUsCol) && col(ptUsCol) < col(endUsCol))
      .drop("__bin")
  }
}
