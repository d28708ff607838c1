package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Validate
import graft.operators.Validate._

/** Data-quality gates (reference: misa_crm_loader.py:1021
  * validate_loaded_data, misa_crm_transformer.py:771,
  * tiktok_shop_transformer.py:451 — imperative checks re-expressed as
  * declarative expectations over one aggregate pass). */
object QualityQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Violation-seeded orders batch: deterministic key-derived nulls,
    * out-of-set statuses, negative totals, uncastable codes and
    * duplicated keys — so the quality report has known pass AND fail
    * rows the oracle recomputes. */
  private def seededOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.unionByName(o.where(col("o_orderkey") % 499 === 0))
      .withColumn("o_custkey",
        when(col("o_orderkey") % 97 === 0, lit(null).cast("bigint"))
          .otherwise(col("o_custkey")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 101 === 0, lit("Z"))
          .otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 103 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")))
      .withColumn("ship_code",
        when(col("o_orderkey") % 89 === 0, lit("XX"))
          .otherwise(col("o_orderkey").cast("string")))
  }

  /** New-in-r4 — declarative data-quality gate: 7 expectations
    * (null-rate, set/range conformance, try_cast type conformance,
    * key uniqueness, row-count bounds) evaluated in ONE aggregate
    * pass; report has seeded failures (o_custkey nulls, negative
    * totals, duplicate keys) and passes. */
  def q39QualityGate(s: SparkSession, dir: String): DataFrame =
    Validate.check(seededOrders(s, dir), Seq(
        NotNull("o_custkey", maxNullRate = 0.005),
        NotNull("o_orderkey"),
        InSet("o_orderstatus", Seq("O", "F", "P"), maxBadRate = 0.02),
        InRange("o_totalprice", min = Some(0.0), max = None, maxBadRate = 0.005),
        TypeConforms("ship_code", "bigint", maxBadRate = 0.02),
        Unique("o_orderkey"),
        RowCountBetween(1000L, 100000000L)))
      .withColumn("passed", col("passed").cast("string"))

  /** New-in-r4 — referential-integrity gate (the FK concern behind the
    * reference's cascade-ordered loads): lineitem→orders checked twice,
    * once with seeded orphans (every 211th key negated → FAIL at 0.1%)
    * and once clean (PASS); one anti-join each, same report schema as
    * q39 so the rows union into one quality report. */
  def q40FkIntegrity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    val seeded = li.withColumn("l_orderkey_bad",
      when(col("l_orderkey") % 211 === 0, -col("l_orderkey") - 1)
        .otherwise(col("l_orderkey")))
    Validate.checkFk(seeded, orders, "l_orderkey_bad", "o_orderkey",
        maxOrphanRate = 0.001)
      .unionByName(Validate.checkFk(li, orders, "l_orderkey", "o_orderkey"))
      .withColumn("passed", col("passed").cast("string"))
      .orderBy("column")
  }

  /** New-in-r6 — cross-window drift report: the second half of the
    * event feed profiled against the first (per event_type row counts
    * and value means), relative mean shift flagged at 3 %. Flags are
    * derived from the ROUNDED shift on both engines so the oracle
    * compares bit-exactly. */
  def q63DriftReport(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    Validate.driftReport(e.where(col("ts") >= cut), e.where(col("ts") < cut),
        "event_type", "value", relTol = 0.03)
      .select(col("event_type"), col("n_cur"), col("n_prev"),
        round(col("mean_cur"), 4).as("mean_cur"),
        round(col("mean_prev"), 4).as("mean_prev"),
        round(col("rel_mean_shift"), 4).as("rel_mean_shift"),
        (col("mean_cur").isNull || col("mean_prev").isNull ||
          round(col("rel_mean_shift"), 4) > 0.03).as("is_drift"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_quality_gate" -> (q39QualityGate _),
    "q40_fk_integrity" -> (q40FkIntegrity _),
    "q63_drift_report" -> (q63DriftReport _)
  )

  val oracleSql: Map[String, String] = Map(
    "q63_drift_report" ->
      """WITH cur AS (
        |  SELECT event_type, count(*) AS n_rows, avg(value) AS mean_val
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1),
        |prev AS (
        |  SELECT event_type, count(*) AS n_rows, avg(value) AS mean_val
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1)
        |SELECT coalesce(cur.event_type, prev.event_type) AS event_type,
        |  CAST(cur.n_rows AS BIGINT) AS n_cur, CAST(prev.n_rows AS BIGINT) AS n_prev,
        |  round(cur.mean_val, 4) AS mean_cur, round(prev.mean_val, 4) AS mean_prev,
        |  round(abs(cur.mean_val - prev.mean_val) / greatest(abs(prev.mean_val), 1e-12), 4) AS rel_mean_shift,
        |  (cur.mean_val IS NULL OR prev.mean_val IS NULL
        |    OR round(abs(cur.mean_val - prev.mean_val) / greatest(abs(prev.mean_val), 1e-12), 4) > 0.03) AS is_drift
        |FROM cur FULL OUTER JOIN prev ON cur.event_type = prev.event_type
        |ORDER BY event_type""".stripMargin,

    "q39_quality_gate" ->
      """WITH seeded AS (
        |  SELECT
        |    CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 101 = 0 THEN 'Z' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 103 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 89 = 0 THEN 'XX' ELSE CAST(o_orderkey AS VARCHAR) END AS ship_code,
        |    o_orderkey
        |  FROM (SELECT * FROM orders
        |        UNION ALL SELECT * FROM orders WHERE o_orderkey % 499 = 0)),
        |m AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 END), 0) AS BIGINT) AS bad_cust,
        |    CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 END), 0) AS BIGINT) AS bad_okey,
        |    CAST(coalesce(sum(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P') THEN 1 END), 0) AS BIGINT) AS bad_status,
        |    CAST(coalesce(sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0.0 THEN 1 END), 0) AS BIGINT) AS bad_price,
        |    CAST(coalesce(sum(CASE WHEN ship_code IS NOT NULL AND try_cast(ship_code AS BIGINT) IS NULL THEN 1 END), 0) AS BIGINT) AS bad_ship,
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS bad_uni
        |  FROM seeded),
        |rep AS (
        |  SELECT 'not_null' AS expectation, 'o_custkey' AS "column", n AS n_rows,
        |    bad_cust AS n_bad, round(bad_cust / greatest(n, 1), 6) AS bad_rate,
        |    0.005 AS threshold FROM m
        |  UNION ALL SELECT 'not_null', 'o_orderkey', n, bad_okey,
        |    round(bad_okey / greatest(n, 1), 6), 0.0 FROM m
        |  UNION ALL SELECT 'in_set', 'o_orderstatus', n, bad_status,
        |    round(bad_status / greatest(n, 1), 6), 0.02 FROM m
        |  UNION ALL SELECT 'in_range', 'o_totalprice', n, bad_price,
        |    round(bad_price / greatest(n, 1), 6), 0.005 FROM m
        |  UNION ALL SELECT 'type_conforms', 'ship_code', n, bad_ship,
        |    round(bad_ship / greatest(n, 1), 6), 0.02 FROM m
        |  UNION ALL SELECT 'unique', 'o_orderkey', n, bad_uni,
        |    round(bad_uni / greatest(n, 1), 6), 0.0 FROM m
        |  UNION ALL SELECT 'row_count', '', n, CAST(0 AS BIGINT),
        |    CASE WHEN n BETWEEN 1000 AND 100000000 THEN 0.0 ELSE 1.0 END, 0.0 FROM m)
        |SELECT expectation, "column", n_rows, n_bad,
        |  CAST(bad_rate AS DOUBLE) AS bad_rate, CAST(threshold AS DOUBLE) AS threshold,
        |  CAST(bad_rate <= threshold AS VARCHAR) AS passed
        |FROM rep ORDER BY expectation, "column"""".stripMargin,

    "q40_fk_integrity" ->
      """WITH pk AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL),
        |seeded AS (SELECT CASE WHEN l_orderkey % 211 = 0 THEN -l_orderkey - 1
        |                       ELSE l_orderkey END AS k FROM lineitem),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CASE WHEN k IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM pk WHERE pk.o_orderkey = k)
        |    THEN 1 END), 0) AS BIGINT) AS bad FROM seeded),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CASE WHEN l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM pk WHERE pk.o_orderkey = l_orderkey)
        |    THEN 1 END), 0) AS BIGINT) AS bad FROM lineitem),
        |rep AS (
        |  SELECT 'fk_integrity' AS expectation, 'l_orderkey' AS "column",
        |    n AS n_rows, bad AS n_bad, round(bad / greatest(n, 1), 6) AS bad_rate,
        |    0.0 AS threshold FROM s2
        |  UNION ALL SELECT 'fk_integrity', 'l_orderkey_bad', n, bad,
        |    round(bad / greatest(n, 1), 6), 0.001 FROM s1)
        |SELECT expectation, "column", n_rows, n_bad,
        |  CAST(bad_rate AS DOUBLE) AS bad_rate, CAST(threshold AS DOUBLE) AS threshold,
        |  CAST(bad_rate <= threshold AS VARCHAR) AS passed
        |FROM rep ORDER BY "column"""".stripMargin
  )
}
