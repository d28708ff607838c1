package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 measurement scratchpad (dev tool): the VERDICT r16 asks,
  * arg-dispatched so each experiment is reproducible verbatim.
  *
  *   sbt "runMain graft.tools.ScratchR17 <mode>"   with
  *   SPARK_GRAFT_SF_DIR pointing at the tier dir (x30/x100 corpora
  *   from ScaleBench.prepare).
  *
  * Modes:
  *   - `config`  — guide §5/§6 runtime-knob A-B-A over the shuffle-heavy
  *     families: spark.sql.files.maxPartitionBytes and AQE
  *     advisoryPartitionSizeInBytes grids (SQL confs, set per variant
  *     inside one session so the window is shared; variant A re-runs
  *     last as the drift sentinel).
  *   - `codec`   — runs the same family once under the io codec the
  *     builder got from SPARK_GRAFT_IO_CODEC (spark.io.compression.codec
  *     is a core conf, frozen at SparkEnv creation — so the lz4/zstd
  *     A-B-A interleaves whole JVM runs, one line each).
  *   - `skew`    — q65 partialSaltedJoin vs plain vs salt-factor grid at
  *     the tier (the r11 x100 salting evidence, re-validated on the
  *     r16 engine), plus the LSH stop-shingle (hot-shingle) filter
  *     on/off at tier populations.
  *   - `cc`      — q54 connectedComponents round count + per-step wall
  *     time at the tier (GRAFT_CC_DEBUG prints per-step signatures;
  *     here the steps are timed from the outside via listener jobs).
  *   - `profile` — q85 Validate.profile split-pass (committed) vs fused
  *     single-scan form at the tier (VERDICT item 5: the sf0.1
  *     adjudication said floor; re-test where scan dominates).
  */
object ScratchR17 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("config")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale/x30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val codec = sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", codec)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rebuild amplified corpora on demand (idempotent per table)
    sys.env.get("SPARK_GRAFT_BUILD_X").foreach { fs =>
      fs.split(",").map(_.trim.toInt).foreach { f =>
        graft.ScaleBench.prepare(spark, "/root/testdata/sf0.1", f,
          "/tmp/graft_scale", withJoins = true)
      }
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def probeSec(): Double = {
      def one(): Double = {
        val t0 = System.nanoTime()
        spark.range(40000000L).selectExpr("bit_xor(xxhash64(id))").head()
        (System.nanoTime() - t0) / 1e9
      }
      Seq(one(), one(), one()).min
    }
    def best(f: => Unit): Double =
      (1 to reps).map { _ =>
        graft.operators.CacheRegistry.releaseAll()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0

    /** The measured family for config/codec: every ScaleBench heavy +
      * joinHeavy query — the paths where shuffled bytes exist at all. */
    val family: Seq[String] = graft.ScaleBench.heavy ++ graft.ScaleBench.joinHeavy
    def familyQueries: Seq[(String, () => Unit)] =
      graft.SparkEntry.queries.filter(q => family.contains(q._1))
        .toSeq.sortBy(_._1)
        .map { case (n, fn) => (n, () => noop(fn(spark, dir))) }

    def runFamily(label: String): (Double, Seq[(String, Double)]) = {
      val rows = familyQueries.map { case (n, f) => n -> best(f()) }
      val total = rows.map(_._2).sum
      println(f"RESULT $label%-40s total=${r3(total)}%8.3f  " +
        rows.map { case (n, s) => s"$n=${r3(s)}" }.mkString(" "))
      (total, rows)
    }

    mode match {
      case "codec" =>
        // one full family pass under the builder codec; caller
        // interleaves lz4/zstd/lz4 JVMs for the A-B-A
        familyQueries.foreach { case (_, f) => f() } // plan/JIT warm
        probeSec()
        val p0 = probeSec()
        runFamily(s"codec=$codec dir=$dir")
        val p1 = probeSec()
        println(f"RESULT codec=$codec probe0=${r3(p0)} probe1=${r3(p1)} drift=${r3(p1 / p0)}")

      case "config" =>
        familyQueries.foreach { case (_, f) => f() } // warm
        probeSec()
        def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
          val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
          kvs.foreach { case (k, v) => spark.conf.set(k, v) }
          try body finally olds.foreach {
            case (k, Some(v)) => spark.conf.set(k, v)
            case (k, None) => spark.conf.unset(k)
          }
        }
        val p0 = probeSec()
        runFamily("base(A1) defaults")
        withConf("spark.sql.files.maxPartitionBytes" -> "32m") {
          runFamily("maxPartitionBytes=32m") }
        withConf("spark.sql.files.maxPartitionBytes" -> "512m") {
          runFamily("maxPartitionBytes=512m") }
        withConf("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m") {
          runFamily("advisory=8m") }
        withConf("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256m") {
          runFamily("advisory=256m") }
        withConf("spark.sql.join.preferSortMergeJoin" -> "false") {
          runFamily("preferSortMergeJoin=false") }
        runFamily("base(A2) defaults")
        val p1 = probeSec()
        println(f"RESULT config probe0=${r3(p0)} probe1=${r3(p1)} drift=${r3(p1 / p0)}")

      case "advisory" =>
        // focused replication of the x100 config-grid advisory=256m win:
        // base/128m/256m/512m/base, so the candidate sits BETWEEN two
        // same-window baselines instead of riding a drifting window
        familyQueries.foreach { case (_, f) => f() } // warm
        probeSec()
        def withAdvisory(v: Option[String])(label: String): Unit = {
          val k = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
          val old = spark.conf.getOption(k)
          v.foreach(spark.conf.set(k, _)); if (v.isEmpty) spark.conf.unset(k)
          try runFamily(label) finally old match {
            case Some(o) => spark.conf.set(k, o)
            case None => spark.conf.unset(k)
          }
        }
        val p0 = probeSec()
        withAdvisory(None)("advisory base(A1) 64m-default")
        withAdvisory(Some("128m"))("advisory=128m")
        withAdvisory(Some("256m"))("advisory=256m")
        withAdvisory(Some("512m"))("advisory=512m")
        withAdvisory(None)("advisory base(A2) 64m-default")
        val p1 = probeSec()
        println(f"RESULT advisory probe0=${r3(p0)} probe1=${r3(p1)} drift=${r3(p1 / p0)}")

      case "skew" =>
        import graft.Tables
        // q65's exact fact/dim construction (EcommerceQueries.q65Fact):
        // every 3rd lineitem lands on pk=1 — the seeded hot key whose
        // mass scales with the tier (x100: ~20 M rows on one key)
        def fact = Tables.load(spark, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
          .withColumn("pk",
            when(col("l_orderkey") % 3 === 0, lit(1L))
              .otherwise(col("l_partkey").cast("long")))
        def dim = Tables.load(spark, dir, "part")
          .select(col("p_partkey").cast("long").as("pk"), col("p_brand"))
          .hint("shuffle_hash")
        def agg(j: DataFrame): DataFrame = j.groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("total_qty"))
          .sortWithinPartitions("p_brand")
        val hot = graft.operators.Skew.hotKeys(fact, "pk",
            rowIdCols = Seq("l_orderkey", "l_linenumber"),
            minShare = 0.05, sampleMod = 10)
          .collect().map(_.get(0)).toSeq
        println(s"RESULT skew hot_keys=${hot.mkString(",")}")
        def salted(f: Int) = agg(graft.operators.Skew.partialSaltedJoin(
          fact, dim, "pk", factor = f,
          saltSource = Seq("l_orderkey", "l_linenumber"), hot = hot))
        def plain = agg(fact.join(dim, Seq("pk")))
        noop(plain); noop(salted(8)) // warm
        val p0 = probeSec()
        val tp = best(noop(plain))
        val grid = Seq(4, 8, 16, 32).map(f => f -> best(noop(salted(f))))
        val tp2 = best(noop(plain))
        println(f"RESULT skew q65 plain=${r3(tp)} plain2=${r3(tp2)} " +
          grid.map { case (f, s) => s"salted_f$f=${r3(s)}" }.mkString(" "))
        // LSH hot-shingle robustness at tier populations, on a
        // banner-SEEDED crawl (the q67 injection: every 4th doc gets
        // the same 20-token boilerplate prefix — at x100 that is
        // ~125 k docs sharing the same shingles). Pair expansion is
        // Σ C(bucket,2), so the unprotected variants are measured as
        // BUCKET-SIZE DISTRIBUTIONS only (expanding a 125 k-doc bucket
        // is the quadratic cliff the mitigations exist to prevent);
        // the protected paths run end-to-end.
        import graft.operators.{MinHashLSH, TextDedup}
        val banner =
          "this site uses cookies accept terms of service privacy policy " +
          "all rights reserved copyright twenty twenty four navigation home about"
        def crawl = Tables.load(spark, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 4 === 0, concat(lit(banner + " "), col("text")))
              .otherwise(col("text")).as("text"))
        def bucketStats(name: String, sizes: DataFrame): Unit = {
          // sizes: one column `b` = bucket size (>1 only)
          val r = sizes.agg(count(lit(1)), max(col("b")),
            expr("percentile(b, 0.99)"), sum(col("b") * (col("b") - 1) / 2))
            .head()
          println(s"RESULT skew lsh $name n_buckets=${r.getLong(0)} " +
            s"max_bucket=${r.get(1)} p99=${r.get(2)} pairs_implied=${r.get(3)}")
        }
        // (a) MinHash band buckets, stop-shingle filter OFF vs ON
        def mhBuckets(stopOn: Boolean): DataFrame = {
          val raw = crawl.select(col("doc_id").as("doc"),
            MinHashLSH.shingleHashes(col("text"), 3).as("sh"))
          val filtered = if (!stopOn) raw else {
            val hot = MinHashLSH.stopShingles(raw, maxDf = 0.05)
            raw.select(col("doc"),
              filter(col("sh"), h => !array_contains(lit(hot), h)).as("sh"))
          }
          MinHashLSH.bandBucketsFromHashes(filtered, 64, 16, 42L,
              portableBandKey = false)
            .groupBy("band", "band_hash").agg(count(lit(1)).as("b"))
            .where(col("b") > 1)
        }
        bucketStats("minhash_stop_off", mhBuckets(stopOn = false))
        bucketStats("minhash_stop_on", mhBuckets(stopOn = true))
        // (b) the prefix-filter postings index (q20/PostingsArtifact
        // path): committed dfreq-ranked prefix vs NO prefix selection
        def tdBase = crawl.select(col("doc_id").as("doc"), lit(1).as("block"),
            TextDedup.shingleHashes64(col("text"), 3).as("shs"))
          .withColumn("sz", size(col("shs")).cast("long"))
        def prefixBuckets = TextDedup.prefixIndex(tdBase, 0.7)
          .groupBy("block", "sh").agg(count(lit(1)).as("b")).where(col("b") > 1)
        def rawBuckets = tdBase
          .select(col("doc"), explode(col("shs")).as("sh"))
          .groupBy("sh").agg(count(lit(1)).as("b")).where(col("b") > 1)
        bucketStats("prefix_on", prefixBuckets)
        bucketStats("prefix_off_allpostings", rawBuckets)
        // (c) protected end-to-end paths at the tier, for wall time
        val tMh = best(noop(MinHashLSH.nearDupPairs(crawl, "doc_id", "text",
          threshold = 0.7, maxDf = 0.05)))
        val tTd = best(noop(TextDedup.blockedJaccardPairs(
          crawl.withColumn("block", lit(1)), "doc_id", "text", "block",
          n = 3, minJaccard = 0.7)))
        val p1 = probeSec()
        println(f"RESULT skew lsh protected minhash_stop_on=${r3(tMh)} " +
          f"prefix_blocked_jaccard=${r3(tTd)} " +
          f"probe0=${r3(p0)} probe1=${r3(p1)} drift=${r3(p1 / p0)}")

      case "cc" =>
        // q54's pair input at the tier, through the registered query's
        // own operator path; step timing via GRAFT_CC_DEBUG stderr plus
        // outer wall time here
        val q54 = graft.SparkEntry.queries("q54_dup_clusters")
        noop(q54(spark, dir)) // warm + artifact build
        val p0 = probeSec()
        val t = best(noop(q54(spark, dir)))
        val p1 = probeSec()
        println(f"RESULT cc q54 best=${r3(t)} probe0=${r3(p0)} probe1=${r3(p1)} drift=${r3(p1 / p0)}")

      case "q45" =>
        // r12 adjudicated range-partition-first (one exchange serves
        // grouping + GLOBAL sort) against hash-agg + range-of-groups +
        // sort. r16's local-sort license changes the menu: hash agg +
        // sortWithinPartitions was never measured — and it skips the
        // range sampler, which RE-EXECUTES the bloom-pruned union (the
        // r16 codec-query lesson, here on a 64 M-row child).
        import graft.Tables
        import graft.operators.BloomPrune
        def li = Tables.load(spark, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        def delta = li.where(col("l_orderkey") % 13 === 0)
          .withColumn("l_quantity", lit(0.0))
        val expected = math.max(li.count() / 13L, 1000L)
        def pruned = BloomPrune.prunedDeleteInsert(li, delta,
          Seq("l_orderkey", "l_linenumber"),
          expectedItems = expected, fpp = 0.01)
        def agg(df: DataFrame) = df.groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("total_qty"))
        def a = agg(pruned.repartitionByRange(col("l_orderkey")))
          .orderBy("l_orderkey") // committed form
        def b = agg(pruned).sortWithinPartitions("l_orderkey")
        def c = agg(pruned.repartitionByRange(col("l_orderkey")))
          .sortWithinPartitions("l_orderkey")
        def sig(df: DataFrame): (Long, Long) = {
          val r = df.agg(count(lit(1)),
            expr("bit_xor(xxhash64(l_orderkey, n_items, total_qty))")).head()
          (r.getLong(0), r.getLong(1))
        }
        println(s"RESULT q45 rowset a=${sig(a)} b=${sig(b)} equal=${sig(a) == sig(b)}")
        noop(a); noop(b); noop(c) // warm
        val p0 = probeSec()
        val tA = best(noop(a))
        val tB = best(noop(b))
        val tC = best(noop(c))
        val tA2 = best(noop(a))
        val p1 = probeSec()
        println(f"RESULT q45 committed=${r3(tA)} hashAggLocalSort=${r3(tB)} " +
          f"rangeAggLocalSort=${r3(tC)} committed2=${r3(tA2)} " +
          f"probe0=${r3(p0)} probe1=${r3(p1)} drift=${r3(p1 / p0)}")

      case "profile" =>
        import graft.Tables
        def ev = Tables.loadEvents(spark, dir)
        val cols = Seq("event_id", "user_id", "event_type", "value", "ts", "props")
        def split = graft.operators.Validate.profile(ev, cols)
        // fused single-scan alternative: ALL aggregates (plain +
        // string extremes + exact distincts) in ONE df.agg — the form
        // r12 rejected; n distinct aggs plan as one Expand dragging
        // every buffer through it
        def fused = {
          import org.apache.spark.sql.types._
          val fields = ev.schema.fields.map(f => f.name -> f.dataType).toMap
          def isNum(c: String) = fields(c) match {
            case _: NumericType => true; case _ => false }
          def isTs(c: String) = fields(c) match {
            case TimestampType | TimestampNTZType => true; case _ => false }
          val aggs = cols.flatMap { c =>
            Seq(coalesce(sum(when(col(c).isNull, 1L)), lit(0L)).as(s"__${c}_nulls"),
              count_distinct(col(c)).as(s"__${c}_distinct")) ++
            (if (isNum(c)) Seq(
              min(col(c)).cast("double").as(s"__${c}_nmin"),
              max(col(c)).cast("double").as(s"__${c}_nmax"),
              round(sum(col(c).cast("decimal(18,2)")).cast("double") /
                count(col(c)), 6).as(s"__${c}_navg"))
            else if (isTs(c)) Seq(
              min(unix_micros(col(c).cast("timestamp"))).as(s"__${c}_tmin"),
              max(unix_micros(col(c).cast("timestamp"))).as(s"__${c}_tmax"))
            else Seq(
              min(col(c)).cast("string").as(s"__${c}_smin"),
              max(col(c)).cast("string").as(s"__${c}_smax")))
          }
          ev.agg(count(lit(1)).as("__n"), aggs: _*)
        }
        noop(split); noop(fused) // warm
        val p0 = probeSec()
        val tS = best(noop(split))
        val tF = best(noop(fused))
        val tS2 = best(noop(split))
        val p1 = probeSec()
        println(f"RESULT profile q85 split=${r3(tS)} fused=${r3(tF)} split2=${r3(tS2)} " +
          f"probe0=${r3(p0)} probe1=${r3(p1)} drift=${r3(p1 / p0)}")

      case other =>
        println(s"unknown mode: $other")
    }
    spark.stop()
  }
}
