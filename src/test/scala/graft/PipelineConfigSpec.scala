package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.operators.EtlControl
import graft.sources.{PagedRestSource, PipelineConfig, TokenAuth}
import graft.sources.PipelineConfig.ConfigException

class PipelineConfigSpec extends SparkTestBase {

  private val fakeEnv: Map[String, String] = Map(
    "ENVIRONMENT" -> "staging",
    "GRAFT_CONTROL_DIR" -> "/tmp/cfg-control",
    "SHOP_APP_KEY" -> "k-shop",
    "SHOP_APP_SECRET" -> "s-shop",
    "SHOP_ACCESS_TOKEN" -> "tok-shop",
    "SHOP_REFRESH_TOKEN" -> "ref-shop",
    "CRM_CLIENT_ID" -> "k-crm",
    "CRM_CLIENT_SECRET" -> "s-crm",
    "CRM_PAGE_SIZE" -> "250",
    "CRM_INCREMENTAL_LOOKBACK_HOURS" -> "48",
    "MARKETPLACE_PARTNER_ID" -> "k-mkt",
    "MARKETPLACE_PARTNER_KEY" -> "s-mkt",
    "GRAFT_JDBC_URL" -> "jdbc:derby:memory:cfg;create=true",
    "MAX_EXECUTION_TIME_MINUTES" -> "2",
    "ETL_TASK_RETRIES" -> "2")

  test("fromEnv resolves the three-source wiring with reference defaulting") {
    val cfg = PipelineConfig.fromEnv(fakeEnv.get)
    assert(cfg.environment == "staging")
    assert(cfg.sources.map(_.id) == Seq("shop_stream", "crm", "marketplace"))
    // env override beats default; un-set knobs keep the reference value
    assert(cfg.source("crm").pageSize == 250)
    assert(cfg.source("crm").incrementalLookbackMinutes == 48 * 60)
    assert(cfg.source("crm").maxPagesPerCycle == 2) // production.py MISA_MAX_PAGES_PER_CYCLE
    assert(cfg.source("shop_stream").incrementalLookbackMinutes == 15)
    assert(cfg.source("marketplace").tokenRefreshBufferSec == 300L)
    assert(cfg.schedule.retries == 2)
    assert(cfg.thresholds.maxExecutionSec == 120L)
    // table mapping mirrors get_table_full_name incl. the loud failure
    assert(cfg.tableFullName("crm", "customers") == "staging.customers")
    assert(cfg.tableFullName("etl_control", "batch_runs") == "etl_control.batch_runs")
    val err = intercept[ConfigException](cfg.tableFullName("nope", "t"))
    assert(err.getMessage.contains("nope"))
    // credentials resolve by VAR NAME, values never in the config object
    val creds = cfg.source("shop_stream").credentials.resolve(fakeEnv.get)
    assert(creds.clientId == "k-shop" && creds.accessToken.contains("tok-shop"))
    val missing = intercept[ConfigException](
      cfg.source("crm").credentials.copy(clientSecretVar = "GONE")
        .resolve(fakeEnv.get))
    assert(missing.getMessage.contains("GONE"))
    assert(cfg.target.resolveUrl(fakeEnv.get).startsWith("jdbc:derby:memory:cfg"))
    // user/password folding: exactly one ';' separator, no ';;' on a
    // trailing-semicolon base, bare base untouched
    val ref = PipelineConfig.JdbcTargetRef(urlVar = "U",
      userVar = Some("UU"), passwordVar = Some("PP"))
    val env1 = Map("U" -> "jdbc:x:db", "UU" -> "u", "PP" -> "p")
    assert(ref.resolveUrl(env1.get) == "jdbc:x:db;user=u;password=p")
    val env2 = Map("U" -> "jdbc:x:db;", "UU" -> "u", "PP" -> "p")
    assert(ref.resolveUrl(env2.get) == "jdbc:x:db;user=u;password=p")
    assert(ref.resolveUrl(Map("U" -> "jdbc:x:db").get) == "jdbc:x:db")
  }

  test("one config object drives a three-source extraction cycle end to end") {
    val cfg = PipelineConfig.fromEnv(fakeEnv.get)
    val landingRoot = Files.createTempDirectory("cfg-landing").toString
    val clock = new AtomicLong(1000L)
    // fake transports: each source serves 3 pages of `pageSize` rows,
    // authenticated against the token minted from ITS OWN credentials
    def transport(src: PipelineConfig.SourceConfig,
        refreshes: AtomicInteger): (Option[String], TokenAuth.Token) => PagedRestSource.Page = {
      val creds = src.credentials.resolve(fakeEnv.get)
      // serve up to 3 pages, but respect the source's own cycle cap
      // (crm's production default is maxPagesPerCycle = 2 — the
      // MISA_MAX_PAGES_PER_CYCLE limit — so its feed ends at the cap)
      val lastPage = math.min(3, src.maxPagesPerCycle) - 1
      (cursor, tok) => {
        assert(tok.accessToken.startsWith(creds.clientId),
          s"token for the wrong source: ${tok.accessToken}")
        val page = cursor.map(_.toInt).getOrElse(0)
        PagedRestSource.Page(
          (0 until src.pageSize).map(i => s"""{"src":"${src.id}","row":${page * src.pageSize + i}}"""),
          if (page < lastPage) Some((page + 1).toString) else None)
      }
    }
    val total = cfg.sources.map { src =>
      val refreshes = new AtomicInteger(0)
      val creds = src.credentials.resolve(fakeEnv.get)
      val provider = src.credentialProvider(
        prior => { refreshes.incrementAndGet()
          TokenAuth.Token(s"${creds.clientId}-at-${clock.get()}", "r",
            clock.get() + 3600) },
        () => clock.get())
      val expectPages = math.min(3, src.maxPagesPerCycle)
      val (pages, rows) = PagedRestSource.fetchToLandingAuthed(spark,
        transport(src, refreshes), provider,
        s"$landingRoot/${src.id}",
        flushEvery = 2, maxPages = src.maxPagesPerCycle,
        maxRetries = src.retryAttempts)
      assert(pages == expectPages && rows == expectPages.toLong * src.pageSize,
        s"${src.id}: got $rows rows / $pages pages")
      assert(refreshes.get() == 1, s"${src.id}: expected one token mint")
      rows
    }.sum
    assert(total == 3L * cfg.source("shop_stream").pageSize +
      2L * cfg.source("crm").pageSize +
      3L * cfg.source("marketplace").pageSize)
  }

  test("duration log: timedRun stamps wall time; SLA bound flags only the slow cycle") {
    val cfg = PipelineConfig.fromEnv(fakeEnv.get)
    val durDir = Files.createTempDirectory("cfg-dur").toString + "/runs"
    // normal cycle: well under the 120 s SLA
    val (out, sec) = EtlControl.timedRun(spark, durDir, "crm", "b1") { 42 }
    assert(out == 42 && sec >= 0.0 && sec < cfg.thresholds.maxExecutionSec)
    assert(EtlControl.slowRuns(spark, durDir,
      cfg.thresholds.maxExecutionSec.toDouble).isEmpty, "no false positive")
    // a slow cycle (stamped directly — sleeping 2 min in CI is not a test)
    EtlControl.logRunDuration(spark, durDir, "crm", "b2", 500.0)
    val slow = EtlControl.slowRuns(spark, durDir,
      cfg.thresholds.maxExecutionSec.toDouble).collect()
    assert(slow.length == 1 && slow.head.getAs[String]("batch_id") == "b2")
    // failure path still stamps (status FAILURE) and rethrows
    intercept[RuntimeException](
      EtlControl.timedRun(spark, durDir, "crm", "b3") {
        throw new RuntimeException("boom") })
    val b3 = spark.read.parquet(durDir)
      .where(org.apache.spark.sql.functions.col("batch_id") === "b3").collect()
    assert(b3.length == 1 && b3.head.getAs[String]("status") == "FAILURE")
    // history-derived bound: last SUCCESS × (1+tol), tightened by the cap
    val bound = EtlControl.expectedDurationBounds(spark, durDir, "crm",
      tolerance = 1.0, slaCapSec = Some(cfg.thresholds.maxExecutionSec.toDouble))
    assert(bound.exists(b => b > 0.0 && b <= 120.0))
  }

  test("capstone: a fully CONFIGURED operational cycle — lease → timed → retrying → incremental load → SLA check") {
    import org.apache.spark.sql.functions.{col, lit}
    val cfg = PipelineConfig.fromEnv(fakeEnv.get)
    val root = Files.createTempDirectory("cfg-e2e").toString
    val control = s"$root/control"
    val failures = s"$root/failures"
    val durations = s"$root/durations"
    val target = s"$root/target"
    val src = cfg.source("shop_stream")
    val feed = Tables.loadEvents(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val flaky = new AtomicInteger(0)

    // cycle 1: transient stage failure absorbed by the configured retry
    // policy, the whole run leased, timed, and committed exactly once
    val ((wm1, rows1), sec1) = EtlControl.withRunLease(spark, control,
        src.id, "worker-1", ttlMs = 60000L) {
      EtlControl.timedRun(spark, durations, src.id, "b1") {
        EtlControl.retryingRun(spark, failures, src.id, "b1", "load",
            retries = cfg.schedule.retries) {
          if (flaky.incrementAndGet() == 1) throw new RuntimeException("flaky io")
          EtlControl.runIncrementalCycle(spark, control, src.id, feed, "ts",
            Seq("event_id"), target, defaultWatermarkUs = 0L, batchId = "b1")
        }
      }
    }
    assert(rows1 > 0 && wm1 > 0 && sec1 > 0.0)
    assert(spark.read.parquet(target).count() == feed.count())
    // one commit row, one duration row, one failure row (the absorbed attempt)
    assert(spark.read.parquet(control)
      .where(col("status") === "SUCCESS").count() == 1)
    assert(spark.read.parquet(failures).count() == 1)
    // SLA: the run is inside the configured bound; no slow-run flag
    assert(EtlControl.slowRuns(spark, durations,
      cfg.thresholds.maxExecutionSec.toDouble).isEmpty)
    // row-count gate primed from the committed history
    val bounds = EtlControl.expectedRowBounds(spark, control, src.id)
    assert(bounds.exists { case (lo, hi) => lo <= rows1 && rows1 <= hi })
    // cycle 2 under the SAME lease holder id while cycle 1's lease is
    // gone (released): an idle re-run commits IDLE and moves nothing
    val ((wm2, _), _) = EtlControl.withRunLease(spark, control, src.id,
        "worker-2", ttlMs = 60000L) {
      EtlControl.timedRun(spark, durations, src.id, "b2") {
        EtlControl.runIncrementalCycle(spark, control, src.id, feed, "ts",
          Seq("event_id"), target, defaultWatermarkUs = 0L, batchId = "b2")
      }
    }
    assert(wm2 == wm1, "idle cycle must not advance the watermark")
    assert(spark.read.parquet(control)
      .where(col("status") === "IDLE").count() == 1)
    assert(spark.read.parquet(durations).count() == 2)
  }

  test("retryingRun: transient failure retries then succeeds; exhaustion leaves FAILURE rows") {
    val cfg = PipelineConfig.fromEnv(fakeEnv.get)
    val failDir = Files.createTempDirectory("cfg-fail").toString + "/failures"
    val attempts = new AtomicInteger(0)
    // fails twice, succeeds on the third try — within retries=2
    val got = EtlControl.retryingRun(spark, failDir, "crm", "b1", "load",
        retries = cfg.schedule.retries) {
      if (attempts.incrementAndGet() <= 2) throw new RuntimeException("transient")
      "ok"
    }
    assert(got == "ok" && attempts.get() == 3)
    val logged = spark.read.parquet(failDir).collect()
    assert(logged.length == 2, "each failed attempt leaves its row")
    assert(logged.map(_.getAs[String]("stage")).toSet == Set("load", "load#retry1"))
    // exhaustion: all attempts fail → rethrow, rows for every attempt
    val always = new AtomicInteger(0)
    intercept[RuntimeException](
      EtlControl.retryingRun(spark, failDir, "crm", "b2", "parse",
          retries = 1) {
        always.incrementAndGet(); throw new RuntimeException("dead") })
    assert(always.get() == 2)
    val b2 = spark.read.parquet(failDir)
      .where(org.apache.spark.sql.functions.col("batch_id") === "b2").collect()
    assert(b2.length == 2)
  }
}
