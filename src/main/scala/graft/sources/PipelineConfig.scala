package graft.sources

import org.apache.hadoop.conf.Configuration

/** Typed source/target configuration — the reference's settings +
  * production config surface as one immutable, resolvable contract.
  *
  * Reference: config/settings.py:16-240 (env-driven per-source
  * credentials, schema mappings + `get_table_full_name`, connection
  * strings, per-source page/retry/lookback knobs) and
  * config/production.py:12-89 (schedule, retry policy, performance
  * thresholds via `get_performance_thresholds`).
  *
  * Spark-first shape: plain case classes resolved ONCE from an
  * injectable `env` function (tests pass a Map's `get`; production
  * passes `sys.env.get`) — no mutable global settings object. Secrets
  * are held as VAR NAMES, not values: `CredentialsRef.resolve` reads
  * them at use time, so a serialized config (e.g. captured in a Spark
  * closure or printed in a log) never carries a credential. The
  * resolved pieces feed the existing runtime directly:
  *   - [[SourceConfig.credentialProvider]] → [[TokenAuth.CredentialProvider]]
  *     (refresh buffer, retry attempts, persisted token store);
  *   - `maxPagesPerCycle`/`retryAttempts`/`pageSize` →
  *     [[PagedRestSource.fetchToLandingAuthed]]'s caps;
  *   - [[JdbcTargetRef.resolveUrl]] + [[PipelineConfig.tableFullName]] →
  *     [[JdbcSink]] url/table arguments;
  *   - `controlDir`, `schedule`, `thresholds` →
  *     [[graft.operators.EtlControl]] cycles and the SLA bound checks.
  */
object PipelineConfig {

  final class ConfigException(msg: String) extends RuntimeException(msg)

  /** Env-var NAMES for one source's credentials (settings.py:28-51's
    * per-platform blocks). Values are only materialized by
    * [[resolve]]. */
  final case class CredentialsRef(
      clientIdVar: String,
      clientSecretVar: String,
      accessTokenVar: Option[String] = None,
      refreshTokenVar: Option[String] = None) {
    def resolve(env: String => Option[String]): Credentials = {
      def req(v: String): String = env(v).getOrElse(
        throw new ConfigException(
          s"missing required credential env var: $v"))
      Credentials(req(clientIdVar), req(clientSecretVar),
        accessTokenVar.flatMap(env), refreshTokenVar.flatMap(env))
    }
  }

  final case class Credentials(clientId: String, clientSecret: String,
      accessToken: Option[String], refreshToken: Option[String])

  /** One extraction source (settings.py's per-platform knob blocks:
    * page sizes, retry attempts, lookback windows, token refresh
    * buffers — env-overridable with the same defaulting discipline). */
  final case class SourceConfig(
      id: String,
      schema: String,
      credentials: CredentialsRef,
      pageSize: Int = 100,
      maxPagesPerCycle: Int = 100000,
      retryAttempts: Int = 3,
      incrementalLookbackMinutes: Int = 15,
      tokenRefreshBufferSec: Long = 300L,
      tokenStoreDir: Option[String] = None) {
    require(pageSize >= 1 && maxPagesPerCycle >= 1 && retryAttempts >= 1,
      s"source $id: page/retry knobs must be >= 1")

    /** The source's token lifecycle, wired from this config:
      * refresh-ahead buffer, bounded refresh retries, optional
      * persisted store (crash-restart reuse). */
    def credentialProvider(refreshFn: Option[TokenAuth.Token] => TokenAuth.Token,
        clock: () => Long,
        hadoopConf: Configuration = new Configuration()): TokenAuth.CredentialProvider =
      new TokenAuth.CredentialProvider(refreshFn, clock,
        storePath = tokenStoreDir, hadoopConf = hadoopConf,
        refreshSkew = tokenRefreshBufferSec, maxAttempts = retryAttempts)
  }

  /** JDBC target by env reference (settings.py:55-60 + the connection
    * string properties — here one URL var plus optional user/password
    * vars folded in at resolve time). */
  final case class JdbcTargetRef(
      urlVar: String = "GRAFT_JDBC_URL",
      userVar: Option[String] = None,
      passwordVar: Option[String] = None,
      stagingSchema: String = "staging") {
    def resolveUrl(env: String => Option[String]): String = {
      val base = env(urlVar).getOrElse(
        throw new ConfigException(s"missing required jdbc env var: $urlVar"))
      val extras = Seq(
        userVar.flatMap(env).map(u => s"user=$u"),
        passwordVar.flatMap(env).map(p => s"password=$p")).flatten
      // Semicolon-style connection strings only (SQL Server form, the
      // reference's target — settings.py:55-60). `?`/`&`-style URLs
      // (PostgreSQL/MySQL) should pass user/password via connection
      // properties instead of URL folding.
      if (extras.isEmpty) base
      else base + (if (base.endsWith(";")) "" else ";") + extras.mkString(";")
    }
  }

  /** production.py:16-28 — the per-DAG schedule + retry policy. */
  final case class ScheduleConfig(
      incrementalMinutes: Int = 15,
      maxActiveRuns: Int = 1,
      catchup: Boolean = false,
      retries: Int = 3,
      retryDelayMinutes: Int = 5,
      executionTimeoutMinutes: Int = 12)

  /** production.py:80-89 `get_performance_thresholds` — consumed by
    * the control-log SLA checks
    * ([[graft.operators.Validate.expectedDurationBounds]] /
    * `expectedRowBounds`). */
  final case class PerformanceThresholds(
      maxExecutionSec: Long = 600L,
      minRecords: Long = 0L,
      maxErrorRatePct: Double = 20.0)

  final case class Resolved(
      environment: String,
      controlDir: String,
      sources: Seq[SourceConfig],
      target: JdbcTargetRef,
      schemaMappings: Map[String, String],
      schedule: ScheduleConfig,
      thresholds: PerformanceThresholds) {

    def source(id: String): SourceConfig =
      sources.find(_.id == id).getOrElse(
        throw new ConfigException(s"unknown source: $id (have ${sources.map(_.id).mkString(", ")})"))

    /** settings.py:198-216 `get_table_full_name` — schema-qualified
      * table name via the source's schema mapping; unknown sources
      * fail loudly like the reference's ValueError. */
    def tableFullName(sourceId: String, table: String): String = {
      val schema = schemaMappings.getOrElse(sourceId,
        throw new ConfigException(s"no schema mapping for data source: $sourceId"))
      s"$schema.$table"
    }
  }

  /** The reference's three-source wiring (settings.py's shop-stream /
    * CRM / marketplace platform blocks), resolved from an injectable
    * env with the same defaulting discipline. */
  def fromEnv(env: String => Option[String] = name => sys.env.get(name)): Resolved = {
    def int(v: String, d: Int): Int = env(v).map(_.trim.toInt).getOrElse(d)
    def long(v: String, d: Long): Long = env(v).map(_.trim.toLong).getOrElse(d)
    val mappings = Map(
      "shop_stream" -> "staging",
      "crm" -> "staging",
      "marketplace" -> "staging",
      "etl_control" -> "etl_control")
    Resolved(
      environment = env("ENVIRONMENT").getOrElse("development"),
      controlDir = env("GRAFT_CONTROL_DIR").getOrElse("/tmp/graft_etl_control"),
      sources = Seq(
        SourceConfig("shop_stream", mappings("shop_stream"),
          CredentialsRef("SHOP_APP_KEY", "SHOP_APP_SECRET",
            Some("SHOP_ACCESS_TOKEN"), Some("SHOP_REFRESH_TOKEN")),
          pageSize = int("ETL_PAGE_SIZE", 50),
          maxPagesPerCycle = int("SHOP_MAX_PAGES_PER_CYCLE", 100000),
          retryAttempts = int("API_RETRY_ATTEMPTS", 3),
          incrementalLookbackMinutes = int("ETL_INCREMENTAL_LOOKBACK_MINUTES", 15),
          tokenRefreshBufferSec = long("SHOP_TOKEN_REFRESH_BUFFER", 300L),
          tokenStoreDir = env("SHOP_TOKEN_STORE_DIR")),
        SourceConfig("crm", mappings("crm"),
          CredentialsRef("CRM_CLIENT_ID", "CRM_CLIENT_SECRET",
            Some("CRM_ACCESS_TOKEN")),
          pageSize = int("CRM_PAGE_SIZE", 100),
          maxPagesPerCycle = int("CRM_MAX_PAGES_PER_CYCLE", 2),
          retryAttempts = int("API_RETRY_ATTEMPTS", 3),
          incrementalLookbackMinutes = int("CRM_INCREMENTAL_LOOKBACK_HOURS", 24) * 60,
          tokenRefreshBufferSec = long("CRM_TOKEN_REFRESH_BUFFER", 300L),
          tokenStoreDir = env("CRM_TOKEN_STORE_DIR")),
        SourceConfig("marketplace", mappings("marketplace"),
          CredentialsRef("MARKETPLACE_PARTNER_ID", "MARKETPLACE_PARTNER_KEY",
            Some("MARKETPLACE_ACCESS_TOKEN"), Some("MARKETPLACE_REFRESH_TOKEN")),
          pageSize = int("ETL_PAGE_SIZE", 100),
          maxPagesPerCycle = int("MARKETPLACE_MAX_PAGES_PER_CYCLE", 100000),
          retryAttempts = int("API_RETRY_ATTEMPTS", 3),
          incrementalLookbackMinutes = int("MARKETPLACE_INCREMENTAL_LOOKBACK_MINUTES", 15),
          tokenRefreshBufferSec = long("MARKETPLACE_TOKEN_REFRESH_BUFFER", 300L),
          tokenStoreDir = env("MARKETPLACE_TOKEN_STORE_DIR"))),
      target = JdbcTargetRef(
        stagingSchema = env("STAGING_SCHEMA").getOrElse("staging")),
      schemaMappings = mappings,
      schedule = ScheduleConfig(
        incrementalMinutes = int("INCREMENTAL_SCHEDULE_MINUTES", 15),
        retries = int("ETL_TASK_RETRIES", 3),
        retryDelayMinutes = int("ETL_RETRY_DELAY_MINUTES", 5),
        executionTimeoutMinutes = int("ETL_EXECUTION_TIMEOUT_MINUTES", 12)),
      thresholds = PerformanceThresholds(
        maxExecutionSec = long("MAX_EXECUTION_TIME_MINUTES", 10L) * 60L,
        minRecords = long("MIN_RECORDS_THRESHOLD", 0L),
        maxErrorRatePct = env("MAX_ERROR_RATE_PERCENT").map(_.toDouble)
          .getOrElse(20.0)))
  }
}
