package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.{Dedup, Incremental}

/** Write-side of the streaming incremental path: each micro-batch is
  * MERGEd into a keep-last parquet target — the streaming form of the
  * reference's per-run upsert loader (misa_crm_loader.py:215-500 runs
  * the same MERGE once per 15-min Airflow tick; foreachBatch runs it
  * per micro-batch with exactly the same batch semantics).
  *
  * Exactness: the sink upserts on the business key with a sequence
  * column deciding the winner, so replays of an at-least-once source
  * batch are idempotent — the target equals the batch keep-last of the
  * whole feed (asserted in StreamingSinkSpec), which is the
  * "exactness-preserving" contract a lake MERGE needs.
  *
  * Scale: [[upsertSinkPartitioned]] rewrites only the key-hash
  * partition directories a batch touches (dynamic partition
  * overwrite) — per-batch cost O(touched/nBuckets of the target).
  * [[upsertSink]] is the simpler whole-rewrite form. Either way the
  * operator boundary (`Incremental.upsert` semantics) is what a
  * Delta/Iceberg MERGE would replace on a lakehouse.
  */
object StreamingSink {

  /** Sketch-artifact sink — the streaming producer of
    * [[graft.operators.Stats.sketchArtifacts]]: each micro-batch
    * writes its per-(day, key) HLL artifacts under
    * `artifactDir/batch_id=<id>`. A replayed batch OVERWRITES its own
    * directory, so the log stays correct under foreachBatch's
    * at-least-once contract (asserted by running the same feed twice
    * in StreamingSinkSpec). Readers union the artifact log and
    * [[graft.operators.Stats.mergeSketches]] it — cross-batch distinct
    * counts without touching the event stream again, the streaming
    * half of SURVEY §2 row 38. */
  def sketchArtifactSink(updates: DataFrame, artifactDir: String,
      keyCol: String, distinctCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Stats.sketchArtifacts(batch, keyCol, distinctCol)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$artifactDir/batch_id=$batchId")
        ()
      }

  /** Count-min-sketch artifact sink — the streaming producer of
    * [[graft.operators.HeavyHitters]] state (SURVEY §7's round-7
    * candidate): each micro-batch folds into ONE fixed-size CMS row
    * (sketch binary + row count) under `artifactDir/batch_id=<id>`.
    * Replayed batches overwrite their own directory (idempotent under
    * foreachBatch's at-least-once contract, asserted in
    * StreamingSinkSpec). "Heavy keys over the whole stream so far" is
    * then [[graft.operators.HeavyHitters.merge]] over the artifact
    * log + one CMS-pruned exact pass over the target table — never a
    * full re-aggregation of the stream, and the streaming state is
    * ~1 MB per batch regardless of key cardinality (a
    * mapGroupsWithState per-key counter would hold every key ever
    * seen). */
  def cmsArtifactSink(updates: DataFrame, artifactDir: String,
      keys: Seq[String], eps: Double = graft.operators.HeavyHitters.DefaultEps,
      confidence: Double = graft.operators.HeavyHitters.DefaultConfidence)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.HeavyHitters
          .sketchAndCount(batch, keys, eps, confidence)
          .where(col("sketch").isNotNull) // empty batch → no artifact row
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$artifactDir/batch_id=$batchId")
        ()
      }

  /** Profile-artifact sink — the streaming producer of
    * [[graft.operators.Validate.profileByKey]] artifacts: each
    * micro-batch writes its per-key (count, null, mean, stddev)
    * profile under `artifactDir/batch_id=<id>`, key-cardinality-sized
    * regardless of batch volume. Replayed batches overwrite their own
    * directory (idempotent under foreachBatch's at-least-once
    * contract). Drift monitoring over the stream is then
    * [[graft.operators.Validate.driftFromProfiles]] between any two
    * batches' artifacts — no event rescan, the same
    * artifact-not-rescan discipline as the HLL and CMS sinks. */
  def profileArtifactSink(updates: DataFrame, artifactDir: String,
      keyCol: String, valCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Validate.profileByKey(batch, keyCol, valCol)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$artifactDir/batch_id=$batchId")
        ()
      }

  /** Attach a foreachBatch upsert sink to `updates`. `targetDir` is
    * created on first batch; subsequent batches merge on `keyCols`
    * keep-last by `seqCol`. Rewrites the WHOLE target per batch — the
    * simplest stand-in; [[upsertSinkPartitioned]] is the scale-shaped
    * variant that rewrites only touched key-buckets. */
  def upsertSink(spark: SparkSession, updates: DataFrame,
      targetDir: String, keyCols: Seq[String], seqCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(targetDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(targetDir)
        // keep-last WITHIN the batch first (a batch can carry several
        // versions of one key), then merge against the target.
        val batchWinners =
          Dedup.keepLast(batch, keyCols, Seq(col(seqCol)))
        val merged =
          if (fs.exists(dst)) {
            val target = spark.read.parquet(targetDir)
            // seq-aware upsert: existing target rows win over STALE
            // update rows (replayed batches), new seqs win over old.
            Dedup.keepLast(
              target.unionByName(batchWinners), keyCols, Seq(col(seqCol)))
          } else batchWinners
        // parquet has no transactional MERGE — stage, move the old
        // copy aside, publish, delete last (ParquetSink.atomicReplace):
        // no crash point leaves the target missing; the residual
        // non-atomic window is the aside+publish rename pair, the best
        // a plain FS offers (a lakehouse table format would make this
        // a metadata commit instead).
        graft.sources.ParquetSink.atomicReplace(spark, targetDir)(
          staging => merged.write.parquet(staging))
        ()
      }

  /** Scale-shaped upsert sink: the target is laid out in `nBuckets`
    * key-hash partition directories (`__kb=<pmod(xxhash64(keys))>`),
    * and each micro-batch rewrites ONLY the buckets its keys touch —
    * dynamic partition overwrite replaces exactly the partitions
    * present in the written frame, so untouched buckets stay
    * byte-identical on disk (asserted in StreamingSinkSpec). Per-batch
    * cost is O(touched-buckets / nBuckets of the target), not
    * O(target): the partition-pruned read of touched buckets + the
    * same seq-aware keep-last merge. The merged frame is
    * localCheckpoint-ed to break lineage before overwriting the
    * directories it was read from. Reads of the target see an extra
    * `__kb` int column (drop it, or read through [[readPartitioned]]). */
  def upsertSinkPartitioned(spark: SparkSession, updates: DataFrame,
      targetDir: String, keyCols: Seq[String], seqCol: String,
      nBuckets: Int = 32): DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(targetDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bucketOf = pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong))
          .cast("int")
        val batchWinners = Dedup.keepLast(batch, keyCols, Seq(col(seqCol)))
          .withColumn("__kb", bucketOf)
        val exists = fs.exists(new org.apache.hadoop.fs.Path(targetDir))
        val merged =
          if (exists) {
            val touched = batchWinners.select("__kb").distinct()
              .collect().map(_.getInt(0)).toSeq // bounded by nBuckets
            val existing = spark.read.parquet(targetDir)
              .where(col("__kb").isin(touched: _*)) // partition-pruned
            Dedup.keepLast(existing.unionByName(batchWinners),
              keyCols, Seq(col(seqCol)))
          } else batchWinners
        // checkpoint breaks lineage from the directories being
        // overwritten; its RDD-level blocks are freed after the write
        // (a stream of N batches must not accumulate N checkpoints)
        val ck = merged.localCheckpoint(true)
        try {
          ck.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__kb")
            .parquet(targetDir)
        } finally graft.operators.CacheRegistry.freeLocalCheckpoint(ck)
        ()
      }

  /** Read a [[upsertSinkPartitioned]] target without its layout
    * column. */
  def readPartitioned(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop("__kb")

  /** Stream enriched with a static dimension via broadcast hash join —
    * no state, no shuffle of the stream side; the static side ships to
    * every executor once per (re)plan, exactly how a 100 TB stream
    * joins a dim table. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")
}
