package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, types}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval attribution for FIXED-LENGTH windows: per-
  * incident event count, value sum, and DISTINCT-user count computed
  * with ZERO joins — the scale rewrite of the binned interval join
  * ([[RangeJoin.binnedIntervalJoin]]) for the aggregate-only shape.
  *
  * Reference analogue: the same incident-window attribution the staged
  * events feed serves; this form answers it when every window has the
  * same length (the q53 shape: [s, s+W) anchored at each error event).
  *
  * Where it wins: enumerating (incident, event) pairs costs
  * Θ(events × windows-per-event); the sweep is linear in
  * events + incidents regardless of error density. MEASURED TRADEOFF
  * (r14, x100 corpus, 10 M events / 2 M windows ⇒ only ~4.6×
  * fan-out): sweep 25.2 s vs the adopted bin-join "firstocc" form
  * 5.97 s — two full passes over the ~34 M-row delta frame (the
  * offsets barrier forces the second) cost more than that modest
  * fan-out, so q53 does NOT use it. The crossover is density: at
  * ~25×+ windows-per-event (denser incidents or longer windows) the
  * pair mass passes the delta mass and this form is the one that
  * still runs. The first-occurrence trick that makes COUNT DISTINCT
  * aggregable (derived here) is what the adopted q53 form reuses
  * inside the join:
  *
  *   - an event at t lies in window [s, s+W) ⇔ s ∈ (t−W, t], so each
  *     event becomes two COUNT/VALUE delta rows (+1/+v at t−W+1,
  *     −1/−v at t+1) and every incident's n_events / total_value is
  *     the running delta sum evaluated at its own s;
  *   - an event at t is its user's FIRST in-window occurrence ⇔
  *     prev < s ≤ t (prev = the user's previous event time), i.e.
  *     s ∈ (max(t−W, prev), t] — which turns COUNT DISTINCT user into
  *     the same prefix-summable delta form: for each user present in
  *     [s, s+W) exactly one of their events satisfies prev < s.
  *
  * The prefix sum itself is distributed with the q58 discipline
  * (Sampling.packByBudgetBucketed): positions are range-bucketed, one
  * hash exchange clusters each bucket, per-bucket running sums come
  * from one Window pass, and the cross-bucket offsets are the
  * exclusive prefix over ≤ `buckets` per-bucket totals (driver-side,
  * metadata-scale, broadcast back). Buckets are uniform over the
  * position span — right for time-uniform event feeds; a skewed feed
  * would swap in sampled quantile boundaries, same machinery.
  *
  * Exactness notes (oracle-bit-exact by construction):
  *   - counts are pure integer deltas; value sums are decimal(18,2)
  *     deltas — +v/−v pairs of fully-passed events cancel EXACTLY in
  *     decimal, so the evaluated sum is exactly the in-window sum;
  *   - a window whose events all carry NULL values must yield NULL
  *     total_value (like SQL SUM), not the cancelled 0.00 — a fourth
  *     delta column counts non-null values and gates the sum;
  *   - null-user events count in n_events/total_value but never in
  *     n_users (COUNT DISTINCT ignores nulls); null-timestamp events
  *     and null-start incidents drop exactly like the non-equi join
  *     predicate drops them;
  *   - same-user ties at one timestamp: the later event's prev equals
  *     its own t, making its contribution interval (t, t] empty — the
  *     user still counts exactly once, under any lag tie order.
  */
object Sweep {

  /** Per-incident (n_events, n_users, total_value) over the fixed
    * window [s, s+winUs). Output columns: `idCol`, n_events (long),
    * n_users (long), total_value (wide decimal — cast downstream;
    * per-event deltas are decimal(18,2) but cross-bucket offsets ride
    * at decimal(38,2) so cumulative offsets can't overflow-null),
    * one row per incident with a non-null start, UNORDERED (callers
    * add their own sort). */
  def fixedWindowStats(events: DataFrame, tsCol: String, userCol: String,
      valCol: String, incidents: DataFrame, idCol: String, sCol: String,
      winUs: Long, buckets: Int = 512): DataFrame = {
    require(winUs > 0, s"winUs must be positive, got $winUs")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val dec = "decimal(18,2)"
    val ev = events.where(col(tsCol).isNotNull)
      .select(col(tsCol).as("__t"), col(userCol).as("__u"),
        col(valCol).cast(dec).as("__v"))
    val inc = incidents.where(col(sCol).isNotNull)
      .select(col(idCol), col(sCol).as("__s"))

    // one lag pass gives each non-null-user event its user's previous
    // event time; persisted because the delta build and the bucket
    // totals both read it (skinny rows, batch-bounded columns)
    val prevd = CacheRegistry.persist(
      ev.where(col("__u").isNotNull)
        .withColumn("__prev",
          lag(col("__t"), 1).over(Window.partitionBy("__u").orderBy("__t")))
        .select(col("__t"), col("__prev")))

    val nullDec = lit(null).cast(dec)
    val zeroL = lit(0L)
    // (__pos, __dn events, __dnv non-null values, __dv value,
    //  __du users, __id, __k) — deltas k=0 sort before probes k=1 at
    // equal position, so a probe's running sum includes same-position
    // deltas (s = t means the event IS in [s, s+W))
    def idNull = lit(null).cast(incidents.schema(idCol).dataType)
    val evLo = ev.select((col("__t") - winUs + 1).as("__pos"),
      lit(1L).as("__dn"),
      when(col("__v").isNotNull, 1L).otherwise(0L).as("__dnv"),
      col("__v").as("__dv"), zeroL.as("__du"),
      idNull.as(idCol), lit(0).as("__k"))
    val evHi = ev.select((col("__t") + 1).as("__pos"),
      lit(-1L).as("__dn"),
      when(col("__v").isNotNull, -1L).otherwise(0L).as("__dnv"),
      (-col("__v")).as("__dv"), zeroL.as("__du"),
      idNull.as(idCol), lit(0).as("__k"))
    val usLo = prevd.select(
      (greatest(col("__t") - winUs,
        coalesce(col("__prev"), col("__t") - winUs)) + 1).as("__pos"),
      zeroL.as("__dn"), zeroL.as("__dnv"), nullDec.as("__dv"),
      lit(1L).as("__du"), idNull.as(idCol), lit(0).as("__k"))
    val usHi = prevd.select((col("__t") + 1).as("__pos"),
      zeroL.as("__dn"), zeroL.as("__dnv"), nullDec.as("__dv"),
      lit(-1L).as("__du"), idNull.as(idCol), lit(0).as("__k"))
    val probes = inc.select(col("__s").as("__pos"),
      zeroL.as("__dn"), zeroL.as("__dnv"), nullDec.as("__dv"),
      zeroL.as("__du"), col(idCol), lit(1).as("__k"))
    val all = evLo.union(evHi).union(usLo).union(usHi).union(probes)

    // uniform range buckets over the position span (two tiny scan aggs)
    val evMM = ev.agg(min(col("__t")), max(col("__t"))).head()
    val out =
      if (evMM.isNullAt(0)) {
        // no events at all: every incident window is empty
        inc.select(col(idCol), lit(0L).as("n_events"), lit(0L).as("n_users"),
          nullDec.as("total_value"))
      } else {
        val inMM = inc.agg(min(col("__s")), max(col("__s"))).head()
        val lo = math.min(evMM.getLong(0) - winUs + 1,
          if (inMM.isNullAt(0)) Long.MaxValue else inMM.getLong(0))
        val hi = math.max(evMM.getLong(1) + 1,
          if (inMM.isNullAt(1)) Long.MinValue else inMM.getLong(1))
        val width = math.max(1L, (hi - lo) / buckets + 1)
        val withB = all.withColumn("__b",
          ((col("__pos") - lo) / width).cast("int"))
        // per-bucket exclusive offsets: ≤ `buckets` totals, driver-side
        // running sum, broadcast back (the q58 two-pass prefix shape)
        val totals = withB.groupBy("__b")
          .agg(sum("__dn").as("tn"), sum("__dnv").as("tnv"),
            sum("__dv").as("tv"), sum("__du").as("tu"))
          .orderBy("__b").collect()
        var (on, onv, ou) = (0L, 0L, 0L)
        var ov = java.math.BigDecimal.ZERO
        val offsets = totals.map { r =>
          val row = (r.getInt(0), on, onv, new java.math.BigDecimal(ov.toString), ou)
          on += r.getLong(1); onv += r.getLong(2)
          if (!r.isNullAt(3)) ov = ov.add(r.getDecimal(3))
          ou += r.getLong(4)
          row
        }.toSeq
        val spark = events.sparkSession
        // offsets stay WIDE (decimal(38,2)) through the join: a
        // cumulative cross-bucket offset can exceed 16 integer digits
        // long before any single in-window sum does, and a non-ANSI
        // narrow cast would null it (then coalesce would zero it,
        // silently corrupting total_value). Only per-event deltas are
        // (18,2); the final per-incident sum is narrowed by callers.
        // Built with an EXPLICIT DecimalType(38,2) schema: the implicit
        // tuple encoder would funnel the driver-side BigDecimal through
        // Spark's default decimal(38,18) first, capping real headroom
        // at 20 integer digits instead of 36 (r15 ADVICE).
        val offSchema = types.StructType(Seq(
          types.StructField("__b", types.IntegerType, nullable = false),
          types.StructField("__on", types.LongType, nullable = false),
          types.StructField("__onv", types.LongType, nullable = false),
          types.StructField("__ov", types.DecimalType(38, 2), nullable = true),
          types.StructField("__ou", types.LongType, nullable = false)))
        val offRows = offsets.map { case (b, cn, cnv, cv, cu) =>
          Row(b, cn, cnv, cv.setScale(2), cu)
        }
        val offDf = broadcast(spark.createDataFrame(
          offRows.asJava, offSchema))
        val w = Window.partitionBy("__b").orderBy(col("__pos"), col("__k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        withB
          .withColumn("__cn", sum(col("__dn")).over(w))
          .withColumn("__cnv", sum(col("__dnv")).over(w))
          .withColumn("__cv", sum(col("__dv")).over(w))
          .withColumn("__cu", sum(col("__du")).over(w))
          .where(col("__k") === 1)
          .join(offDf, Seq("__b"))
          .select(col(idCol),
            (col("__on") + col("__cn")).as("n_events"),
            (col("__ou") + col("__cu")).as("n_users"),
            when(col("__onv") + col("__cnv") > 0,
              coalesce(col("__ov"), lit(0).cast(dec)) +
                coalesce(col("__cv"), lit(0).cast(dec)))
              .otherwise(nullDec).as("total_value"))
      }
    out
  }
}
