package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Amplified-corpus scaling bench for the heavy dedup/corpus family.
  *
  * The full suite is fixed-overhead dominated at sf0.1 (100× the data
  * costs ~1.5× the time), so per-round BENCH numbers say little about
  * how the SHUFFLE-heavy operators scale. This main builds
  * deterministic 10×/30× expansions of `documents` (the r7
  * 10×-embeddings precedent) and measures just the dedup-family
  * headliners at each factor, pooling per-query minima over reps.
  *
  * Amplification contract (copy k of factor F, k = 0..F−1):
  *   - `doc_id` += k · 10^len(max doc_id) — disjoint id ranges, and
  *     the q54/q61 synthetic-fragment offset (10^len of the NEW max)
  *     still clears every amplified id;
  *   - every token of copy k > 0 gets a `▲k` suffix, so each copy
  *     reproduces the base corpus' near-dup structure EXACTLY (same
  *     shingle relationships, disjoint hash universe per copy): dup
  *     mass scales linearly with F, the way a bigger crawl actually
  *     behaves — naive row duplication would instead square every
  *     duplicate group;
  *   - the q67/q84 boilerplate banner is injected by the queries
  *     themselves from a literal, so it stays IDENTICAL across copies
  *     — the hot-hash boilerplate path is stressed at F× occurrency,
  *     also like a real crawl.
  *
  * Output: one JSON line {"metric":"scale", "factors":{"1":{...}}}
  * with per-query min-of-reps seconds, per-factor corpus build and
  * artifact first-run times, and the Bench probe drift per factor.
  */
object ScaleBench {

  /** The families whose cost is dominated by real shuffle/join work
    * over documents, not per-job floor. */
  val heavy: Seq[String] = Seq(
    "q18_minhash_pairs", "q20_ngram_jaccard", "q54_dup_clusters",
    "q61_corpus_pipeline", "q67_chunk_dedup", "q84_substring_dedup")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,30")
      .split(",").map(_.trim.toInt).toSeq
    val work = args.lift(2).getOrElse("/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries.filter(q => heavy.contains(q._1))

    def probeSec(): Double = {
      val t0 = System.nanoTime()
      spark.range(40000000L).selectExpr("bit_xor(xxhash64(id))").head()
      (System.nanoTime() - t0) / 1e9
    }

    // codegen/JIT warm on the tiny SF (the Bench discipline)
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    probeSec()

    val factorJson = factors.map { f =>
      val (dir, buildSec) = prepare(spark, base, f, work)
      val pf = probeSec()
      val rows = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        // first run pays per-dir artifact builds (stop lists, the
        // verified-pair table) — the once-per-corpus cost, reported
        // separately from the steady-state min
        graft.operators.CacheRegistry.releaseAll()
        val t0 = System.nanoTime()
        // noop sink, not count() — the Bench materialization fix
        // (count lets Catalyst eliminate the operator under test)
        val first =
          try { fn(spark, dir).write.mode("overwrite").format("noop").save()
            (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[scale] x$f $name failed: $e"); -1.0 }
        val best =
          if (first < 0) -1.0
          else (1 to reps).map { _ =>
            graft.operators.CacheRegistry.releaseAll()
            val s0 = System.nanoTime()
            fn(spark, dir).write.mode("overwrite").format("noop").save()
            (System.nanoTime() - s0) / 1e9
          }.min
        (name, first, best)
      }
      val drift = probeSec() / pf
      val qs = rows.map { case (n, first, best) =>
        "\"" + n + "\":{\"first_sec\":" + first + ",\"min_sec\":" + best + "}"
      }.mkString(",")
      val total = rows.collect { case (_, _, b) if b >= 0 => b }.sum
      s""""$f":{"corpus_build_sec":$buildSec,"total_min_sec":$total,"probe_drift":$drift,$qs}"""
    }.mkString(",")
    println(s"""{"metric":"scale","base":"$base","reps":$reps,"factors":{$factorJson}}""")
    spark.stop()
  }

  /** Materialize the factor-f corpus dir (idempotent): amplified
    * documents + symlinks to every other base table. Returns
    * (dir, buildSeconds — 0.0 when reused). */
  private def prepare(spark: SparkSession, base: String, f: Int,
      work: String): (String, Double) = {
    require(f >= 1, s"factor must be >= 1, got $f")
    if (f == 1) return (base, 0.0)
    val dir = s"$work/x$f"
    val docs = new java.io.File(s"$dir/documents.parquet")
    if (docs.exists) return (dir, 0.0)
    val t0 = System.nanoTime()
    new java.io.File(dir).mkdirs()
    val d = spark.read.parquet(s"$base/documents.parquet")
    val stride = math.pow(10,
      d.agg(max(col("doc_id"))).head().getLong(0).toString.length).toLong
    val copies = broadcast(spark.range(f).select(col("id").as("__k")))
    d.crossJoin(copies)
      .select(
        (col("doc_id") + col("__k") * stride).as("doc_id"),
        when(col("__k") === 0, col("text")).otherwise(concat_ws(" ",
          transform(split(col("text"), " "),
            t => concat(t, lit("▲"), col("__k"))))).as("text"),
        col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .repartition(math.min(f * 4, 32))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the other tables are the base's own files
    val baseDir = new java.io.File(base)
    baseDir.listFiles.filter(_.getName.endsWith(".parquet"))
      .filterNot(_.getName == "documents.parquet").foreach { src =>
        val link = java.nio.file.Paths.get(dir, src.getName)
        if (!java.nio.file.Files.exists(link))
          java.nio.file.Files.createSymbolicLink(link, src.toPath)
      }
    (dir, (System.nanoTime() - t0) / 1e9)
  }
}
