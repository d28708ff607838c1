package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{PagedRestSource, PipelineConfig, TokenAuth}

/** The composed pipeline entry points — the reference's whole DAG as
  * ONE call over the typed config.
  *
  * Reference: incremental_etl_dag.py:446-533 (three per-source
  * extract → transform → load chains under max_active_runs = 1,
  * schedule/retry policy from production config) and
  * full_load_etl_dag.py:455-525 (same 3-task structure with
  * CROSS-SOURCE ordering: `start >> shopee >> [misa, tiktok] >> end` —
  * the FK-owning source loads before its dependents).
  *
  * Every stage already exists as a tested operator; this file only
  * composes them, so the composed driver inherits each stage's
  * correctness contract:
  *   - mutual exclusion: [[EtlControl.withRunLease]] (one lease for
  *     the whole pipeline run = the DAG's max_active_runs = 1);
  *   - extract: [[PagedRestSource.fetchToLandingAuthed]] with the
  *     source's own page/retry/token knobs from [[PipelineConfig]];
  *   - transform: the caller's landing→typed frame function (the
  *     per-source transformer — schema is source-specific, so it is
  *     wiring, not config);
  *   - validate: [[Validate.check]] — a failed expectation aborts the
  *     source's chain BEFORE the load touches the target (the
  *     reference's validate-then-load task order);
  *   - load + watermark: [[EtlControl.runIncrementalCycle]] (MERGE +
  *     exactly-once commit) or [[EtlControl.runSnapshotCycle]] (full
  *     replace), both staged-atomic;
  *   - failure/duration logs: [[EtlControl.timedRun]] +
  *     [[EtlControl.retryingRun]] with the schedule's retry policy.
  *
  * Scale note: the driver-side loop is per-SOURCE (three iterations),
  * never per-row; all data movement stays inside the composed Spark
  * jobs, so the composition adds nothing to the 100 TB story beyond
  * the stages' own posture.
  */
object Pipeline {

  final class ValidationException(msg: String) extends RuntimeException(msg)

  /** Per-source wiring the typed config cannot carry: the transport,
    * its credential lifecycle, the landing→typed transform, and the
    * target layout. */
  final case class SourceRunner(
      fetch: (Option[String], TokenAuth.Token) => PagedRestSource.Page,
      provider: TokenAuth.CredentialProvider,
      transform: DataFrame => DataFrame,
      tsCol: String,
      keys: Seq[String],
      expectations: Seq[Validate.Expectation] = Nil)

  /** One source's cycle outcome. */
  final case class CycleResult(sourceId: String, pages: Long,
      landedRows: Long, watermarkUs: Long, loadedRows: Long,
      wallSec: Double)

  /** One incremental pipeline run: for each configured source (the
    * DAG's parallel chains, executed here in config order — Spark
    * jobs inside each stage already use the whole cluster, so
    * driver-side source concurrency buys nothing at scale), run
    * extract → transform → validate → MERGE-load → watermark commit,
    * leased, timed, and retried per the config's schedule policy.
    *
    * Exactly-once under crash replay comes from the stages: landing is
    * per-extraction scratch (overwritten), the MERGE replays its
    * watermark window idempotently, and the commit is the last step —
    * re-running a crashed batch id converges (spec'd in
    * PipelineSpec with a failBeforeCommit crash). */
  def runIncremental(spark: SparkSession, cfg: PipelineConfig.Resolved,
      runners: Map[String, SourceRunner], workDir: String, batchId: String,
      holderId: String = "pipeline", defaultWatermarkUs: Long = 0L,
      leaseTtlMs: Long = 3600000L,
      failBeforeCommit: Set[String] = Set.empty): Seq[CycleResult] =
    EtlControl.withRunLease(spark, cfg.controlDir, "incremental_pipeline",
        holderId, ttlMs = leaseTtlMs) {
      cfg.sources.filter(s => runners.contains(s.id)).map { src =>
        runSource(spark, cfg, src, runners(src.id), workDir, batchId,
          defaultWatermarkUs, failBeforeCommit.contains(src.id))
      }
    }

  /** One full-load pipeline run with the reference's CROSS-SOURCE
    * stage order (full_load_etl_dag.py:525 — `shopee >> [misa,
    * tiktok]`): `stages` is a sequence of source-id groups; a group
    * only starts after the previous group's loads committed. Each
    * source runs extract → transform → validate → snapshot replace
    * ([[EtlControl.runSnapshotCycle]] — write-once bootstrap, then
    * diff-gated full replace). */
  def runFullLoad(spark: SparkSession, cfg: PipelineConfig.Resolved,
      runners: Map[String, SourceRunner], workDir: String, batchId: String,
      stages: Seq[Seq[String]], holderId: String = "pipeline",
      leaseTtlMs: Long = 3600000L): Seq[CycleResult] = {
    val known = cfg.sources.map(_.id).toSet
    val asked = stages.flatten
    require(asked.nonEmpty && asked.distinct == asked &&
      asked.forall(known), s"stages must name distinct configured " +
      s"sources; got $asked of $known")
    // fail BEFORE the lease and before any source loads — a stage id
    // with no runner must not surface mid-run after earlier groups
    // already replaced their targets
    require(asked.forall(runners.contains),
      s"every staged source needs a runner; missing: " +
        asked.filterNot(runners.contains).mkString(", "))
    EtlControl.withRunLease(spark, cfg.controlDir, "full_load_pipeline",
        holderId, ttlMs = leaseTtlMs) {
      stages.flatMap(_.map { id =>
        runSource(spark, cfg, cfg.source(id), runners(id), workDir,
          batchId, defaultWatermarkUs = 0L, failBeforeCommit = false,
          fullLoad = true)
      })
    }
  }

  private def runSource(spark: SparkSession, cfg: PipelineConfig.Resolved,
      src: PipelineConfig.SourceConfig, runner: SourceRunner,
      workDir: String, batchId: String, defaultWatermarkUs: Long,
      failBeforeCommit: Boolean, fullLoad: Boolean = false): CycleResult = {
    val failureDir = s"$workDir/failures"
    val landingDir = s"$workDir/landing/${src.id}"
    val targetDir = s"$workDir/target/${src.id}"
    val ((pages, landed, wm, loaded), sec) =
      EtlControl.timedRun(spark, s"$workDir/durations", src.id, batchId) {
        EtlControl.retryingRun(spark, failureDir, src.id, batchId, "cycle",
            retries = cfg.schedule.retries,
            // a failed expectation is deterministic — retrying it would
            // re-hit the external API and re-transform for nothing
            retryOn = !_.isInstanceOf[ValidationException]) {
          // extract — the source's own page/retry caps
          val (p, landedRows) = PagedRestSource.fetchToLandingAuthed(spark,
            runner.fetch, runner.provider, landingDir,
            maxPages = src.maxPagesPerCycle, maxRetries = src.retryAttempts)
          // transform
          val typed = runner.transform(
            PagedRestSource.readLanding(spark, landingDir))
          // validate BEFORE the target is touched
          if (runner.expectations.nonEmpty) {
            val failed = Validate.check(typed, runner.expectations)
              .where(org.apache.spark.sql.functions.col("passed") === false)
              .collect()
            if (failed.nonEmpty)
              throw new ValidationException(
                s"${src.id}/$batchId: ${failed.length} expectation(s) " +
                  s"failed: " + failed.map(r =>
                    s"${r.getAs[String]("expectation")}(${r.getAs[String]("column")})")
                    .mkString(", "))
          }
          // load + watermark commit
          if (fullLoad) {
            val (ins, upd, del) = EtlControl.runSnapshotCycle(spark,
              cfg.controlDir, src.id, typed, runner.keys, targetDir, batchId)
            (p, landedRows, 0L, ins + upd + del)
          } else {
            val (newWm, rows) = EtlControl.runIncrementalCycle(spark,
              cfg.controlDir, src.id, typed, runner.tsCol, runner.keys,
              targetDir, defaultWatermarkUs, batchId,
              failBeforeCommit = failBeforeCommit)
            (p, landedRows, newWm, rows)
          }
        }
      }
    CycleResult(src.id, pages, landed, wm, loaded, sec)
  }
}
