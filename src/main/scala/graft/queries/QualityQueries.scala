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
  private[graft] def seededOrders(s: SparkSession, dir: String): DataFrame = {
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
      .sortWithinPartitions("column")
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
      .sortWithinPartitions("event_type")
  }

  /** New-in-r11 — per-column table profile (Deequ-style): row/null/
    * distinct counts + typed extremes for every events column in ONE
    * aggregate pass, oracle-replayed exactly in DuckDB. The batch-QA
    * report the reference's validate_loaded_data approximates with
    * count checks (misa_crm_loader.py:1021), widened to the per-column
    * form a 100 TB feed needs before training on it. */
  def q85Profile(s: SparkSession, dir: String): DataFrame =
    Validate.profile(t(s, dir, "events"),
      Seq("event_id", "user_id", "event_type", "value", "ts", "props"))

  /** New-in-r11 — ZERO-SCAN numeric profile from parquet footer
    * statistics ([[graft.sources.ParquetMeta.columnStats]]): exact
    * per-column null counts and numeric min/max merged across
    * row-group footers — no column data read at all, the same
    * metadata-only discipline as q01's footer row counts (the
    * reference answers its count checks from sys.partitions metadata;
    * đếm số dòng mỗi bảng.sql). The oracle recomputes the identical
    * numbers by scanning, so the gate proves the footer path EXACT,
    * not just plausible: over 100 TB this is the difference between a
    * profile in footer-read time and a full-corpus scan. String
    * columns get exact null counts but never footer extremes (writers
    * may truncate binary stats). */
  def q86FooterStats(s: SparkSession, dir: String): DataFrame =
    graft.sources.ParquetMeta.columnStats(s, s"$dir/lineitem.parquet",
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_discount", "l_returnflag"))
      .sortWithinPartitions("column_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_quality_gate" -> (q39QualityGate _),
    "q40_fk_integrity" -> (q40FkIntegrity _),
    "q63_drift_report" -> (q63DriftReport _),
    "q85_profile" -> (q85Profile _),
    "q86_footer_stats" -> (q86FooterStats _)
  )

  val oracleSql: Map[String, String] = Map(
    "q86_footer_stats" ->
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CASE WHEN l_orderkey IS NULL THEN 1 END), 0) AS BIGINT) AS ok_nulls,
        |  CAST(min(l_orderkey) AS DOUBLE) AS ok_min, CAST(max(l_orderkey) AS DOUBLE) AS ok_max,
        |  CAST(coalesce(sum(CASE WHEN l_linenumber IS NULL THEN 1 END), 0) AS BIGINT) AS ln_nulls,
        |  CAST(min(l_linenumber) AS DOUBLE) AS ln_min, CAST(max(l_linenumber) AS DOUBLE) AS ln_max,
        |  CAST(coalesce(sum(CASE WHEN l_quantity IS NULL THEN 1 END), 0) AS BIGINT) AS q_nulls,
        |  CAST(min(l_quantity) AS DOUBLE) AS q_min, CAST(max(l_quantity) AS DOUBLE) AS q_max,
        |  CAST(coalesce(sum(CASE WHEN l_extendedprice IS NULL THEN 1 END), 0) AS BIGINT) AS ep_nulls,
        |  CAST(min(l_extendedprice) AS DOUBLE) AS ep_min, CAST(max(l_extendedprice) AS DOUBLE) AS ep_max,
        |  CAST(coalesce(sum(CASE WHEN l_discount IS NULL THEN 1 END), 0) AS BIGINT) AS d_nulls,
        |  CAST(min(l_discount) AS DOUBLE) AS d_min, CAST(max(l_discount) AS DOUBLE) AS d_max,
        |  CAST(coalesce(sum(CASE WHEN l_returnflag IS NULL THEN 1 END), 0) AS BIGINT) AS rf_nulls
        |FROM lineitem)
        |SELECT column_name, n_rows, n_nulls, num_min, num_max FROM (
        |  SELECT 'l_orderkey' AS column_name, n AS n_rows, ok_nulls AS n_nulls,
        |    ok_min AS num_min, ok_max AS num_max FROM m
        |  UNION ALL SELECT 'l_linenumber', n, ln_nulls, ln_min, ln_max FROM m
        |  UNION ALL SELECT 'l_quantity', n, q_nulls, q_min, q_max FROM m
        |  UNION ALL SELECT 'l_extendedprice', n, ep_nulls, ep_min, ep_max FROM m
        |  UNION ALL SELECT 'l_discount', n, d_nulls, d_min, d_max FROM m
        |  UNION ALL SELECT 'l_returnflag', n, rf_nulls,
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM m)
        |ORDER BY column_name""".stripMargin,

    "q85_profile" ->
      """WITH m AS (SELECT
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CASE WHEN event_id IS NULL THEN 1 END), 0) AS BIGINT) AS eid_nulls,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS eid_distinct,
        |  CAST(min(event_id) AS DOUBLE) AS eid_min, CAST(max(event_id) AS DOUBLE) AS eid_max,
        |  round(CAST(sum(CAST(event_id AS DECIMAL(18,2))) AS DOUBLE) / count(event_id), 6) AS eid_avg,
        |  CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 END), 0) AS BIGINT) AS uid_nulls,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS uid_distinct,
        |  CAST(min(user_id) AS DOUBLE) AS uid_min, CAST(max(user_id) AS DOUBLE) AS uid_max,
        |  round(CAST(sum(CAST(user_id AS DECIMAL(18,2))) AS DOUBLE) / count(user_id), 6) AS uid_avg,
        |  CAST(coalesce(sum(CASE WHEN event_type IS NULL THEN 1 END), 0) AS BIGINT) AS et_nulls,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS et_distinct,
        |  min(event_type) AS et_min, max(event_type) AS et_max,
        |  CAST(coalesce(sum(CASE WHEN value IS NULL THEN 1 END), 0) AS BIGINT) AS v_nulls,
        |  CAST(count(DISTINCT value) AS BIGINT) AS v_distinct,
        |  CAST(min(value) AS DOUBLE) AS v_min, CAST(max(value) AS DOUBLE) AS v_max,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 6) AS v_avg,
        |  CAST(coalesce(sum(CASE WHEN ts IS NULL THEN 1 END), 0) AS BIGINT) AS ts_nulls,
        |  CAST(count(DISTINCT ts) AS BIGINT) AS ts_distinct,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS ts_min,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS ts_max,
        |  CAST(coalesce(sum(CASE WHEN props IS NULL THEN 1 END), 0) AS BIGINT) AS p_nulls,
        |  CAST(count(DISTINCT props) AS BIGINT) AS p_distinct,
        |  min(props) AS p_min, max(props) AS p_max
        |FROM events),
        |rep AS (
        |  SELECT 'event_id' AS column_name, n AS n_rows, eid_nulls AS n_nulls,
        |    eid_distinct AS n_distinct, eid_min AS num_min, eid_max AS num_max,
        |    eid_avg AS num_avg, CAST(NULL AS VARCHAR) AS str_min,
        |    CAST(NULL AS VARCHAR) AS str_max FROM m
        |  UNION ALL SELECT 'user_id', n, uid_nulls, uid_distinct,
        |    uid_min, uid_max, uid_avg, NULL, NULL FROM m
        |  UNION ALL SELECT 'event_type', n, et_nulls, et_distinct,
        |    NULL, NULL, NULL, et_min, et_max FROM m
        |  UNION ALL SELECT 'value', n, v_nulls, v_distinct,
        |    v_min, v_max, v_avg, NULL, NULL FROM m
        |  UNION ALL SELECT 'ts', n, ts_nulls, ts_distinct,
        |    NULL, NULL, NULL, ts_min, ts_max FROM m
        |  UNION ALL SELECT 'props', n, p_nulls, p_distinct,
        |    NULL, NULL, NULL, p_min, p_max FROM m)
        |SELECT column_name, n_rows, n_nulls, n_distinct,
        |  CAST(num_min AS DOUBLE) AS num_min, CAST(num_max AS DOUBLE) AS num_max,
        |  CAST(num_avg AS DOUBLE) AS num_avg, str_min, str_max
        |FROM rep ORDER BY column_name""".stripMargin,

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
