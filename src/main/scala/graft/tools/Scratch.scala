package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc measurement scratchpad (dev tool, not library surface):
  * compares a query against a floor twin or a candidate rewrite under
  * min-of-N timing with the noop sink (never count() — the Bench
  * materialization rule). Edit the closures, `sbt "runMain
  * graft.tools.Scratch"`, read the RESULT line. Findings worth keeping
  * move into scaladocs/BASELINE.md (e.g. the r10 q60 floor-twin
  * decomposition, the r11 q45/q10/q53 floor twins and the q65
  * salted-vs-plain overhead split). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rebuild amplified corpora on demand (/tmp is cleared between
    // sessions; prepare is idempotent per table)
    sys.env.get("SPARK_GRAFT_BUILD_X").foreach { fs =>
      fs.split(",").map(_.trim.toInt).foreach { f =>
        graft.ScaleBench.prepare(spark, "/root/testdata/sf0.1", f,
          "/tmp/graft_scale", withJoins = true)
      }
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.Tables

    // ---- r11 floor twins: same scans + exchanges + trailing agg/sort,
    // ZERO operator logic (no anti join / SMJ merge / interval join) —
    // the q60 method for adjudicating whether a >2x-vs-DuckDB ratio is
    // job/scan floor or the operator itself.

    val q45real = () => noop(
      graft.queries.EcommerceQueries.queries("q45_bloom_delete_insert")(spark, dir))
    // twin: base scan + delta scan + union + agg + sort, plus the
    // third (delta-keys) scan as its own action — no anti join
    val q45twin = () => {
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val delta = li.where(col("l_orderkey") % 13 === 0)
        .withColumn("l_quantity", lit(0.0))
      noop(li.unionByName(delta).groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
        .orderBy("l_orderkey"))
      noop(li.where(col("l_orderkey") % 13 === 0)
        .select("l_orderkey", "l_linenumber"))
    }

    val q10real = () => noop(
      graft.queries.EcommerceQueries.queries("q10_star_join")(spark, dir))
    // twin: the fact partial-agg (scan + both agg exchanges) and the
    // orders scan + its shuffle, final small agg + sort — no SMJ, no
    // broadcast dims
    val q10twin = () => {
      val li = Tables.load(spark, dir, "lineitem")
      val liAgg = li.groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      noop(liAgg.groupBy("l_returnflag")
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("l_returnflag"))
      noop(Tables.load(spark, dir, "orders")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n")))
    }

    val q53real = () => noop(
      graft.queries.AnalyticsQueries.queries("q53_range_join")(spark, dir))
    // twin: points scan binned + shuffled into the count_distinct
    // (Expand) agg + sort, incidents scan + bin explode — no join
    val q53twin = () => {
      val winUs = 600000000L
      val ev = Tables.loadEvents(spark, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val pts = ev.select(col("event_id"), col("user_id"), col("value"),
          col("ts_us"))
        .withColumn("__bin", floor(col("ts_us") / winUs))
      noop(pts.groupBy("__bin")
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy("__bin"))
      noop(ev.where(col("event_type") === "error")
        .select(col("event_id").as("incident_id"),
          col("ts_us").as("s_us"), (col("ts_us") + 600000000L).as("e_us"))
        .withColumn("__bin", explode(sequence(
          floor(col("s_us") / winUs), floor((col("e_us") - 1) / winUs)))))
    }

    // ---- q65 decomposition: salted machinery vs the PLAIN join on the
    // same data in the same window (overhead = salted − plain)
    val q65real = () => noop(
      graft.queries.EcommerceQueries.queries("q65_salted_join")(spark, dir))
    val q65plain = () => {
      val fact = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .withColumn("pk",
          when(col("l_orderkey") % 3 === 0, lit(1L))
            .otherwise(col("l_partkey").cast("long")))
      val dim = Tables.load(spark, dir, "part")
        .select(col("p_partkey").cast("long").as("pk"), col("p_brand"))
        .hint("shuffle_hash")
      noop(fact.join(dim, "pk")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
        .orderBy("p_brand"))
    }

    // q53 optimization candidates: broadcast the (small) interval side
    // so the points never shuffle into the bin join; with/without the
    // count_distinct replaced by a pre-join distinct
    def q53Parts = {
      val winUs = 600000000L
      val ev = Tables.loadEvents(spark, dir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val incidents = ev.where(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("ts_us").as("s_us"),
          (col("ts_us") + winUs).as("e_us"))
      val pts = ev.select(col("event_id"), col("user_id"), col("value"),
        col("ts_us"))
      (pts, incidents, winUs)
    }
    val q53bc = () => {
      val (pts, incidents, winUs) = q53Parts
      noop(graft.operators.RangeJoin.binnedIntervalJoin(pts, "ts_us",
          broadcast(incidents), "s_us", "e_us", binUs = winUs)
        .groupBy("incident_id")
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy("incident_id"))
    }
    val q53shj = () => {
      val (pts, incidents, winUs) = q53Parts
      noop(graft.operators.RangeJoin.binnedIntervalJoin(pts, "ts_us",
          incidents.hint("shuffle_hash"), "s_us", "e_us", binUs = winUs)
        .groupBy("incident_id")
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy("incident_id"))
    }

    val q53nc = () => { // no count_distinct → no Expand: isolates its cost
      val (pts, incidents, winUs) = q53Parts
      noop(graft.operators.RangeJoin.binnedIntervalJoin(pts, "ts_us",
          incidents.hint("shuffle_hash"), "s_us", "e_us", binUs = winUs)
        .groupBy("incident_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy("incident_id"))
    }
    val q53two = () => { // two-phase: plain agg + distinct-pair agg, joined
      val (pts, incidents, winUs) = q53Parts
      val joined = graft.operators.RangeJoin.binnedIntervalJoin(pts, "ts_us",
        incidents.hint("shuffle_hash"), "s_us", "e_us", binUs = winUs)
      val baseAgg = joined.groupBy("incident_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
      val users = joined.select("incident_id", "user_id").distinct()
        .groupBy("incident_id").agg(count(lit(1)).as("n_users"))
      noop(baseAgg.join(users, Seq("incident_id"))
        .select(col("incident_id"), col("n_events"), col("n_users"),
          col("total_value"))
        .orderBy("incident_id"))
    }

    // ---- q10 candidates at the amplified tier: the sf0.1 floor twin
    // says 94 % of q10 is scans+exchanges, but the x10 ratio (7.8×)
    // is the one >1 s survivor — re-derive the join/exchange choices
    // at the tier where they matter.
    def q10parts = {
      val li = Tables.load(spark, dir, "lineitem")
      val o = Tables.load(spark, dir, "orders")
      val c = broadcast(Tables.load(spark, dir, "customer"))
      val n = broadcast(Tables.load(spark, dir, "nation"))
      val r = broadcast(Tables.load(spark, dir, "region"))
      (li, o, c, n, r)
    }
    def q10finish(liAgg: org.apache.spark.sql.DataFrame,
        o: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame,
        n: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("l_returnflag"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "l_returnflag")
    // single-key exchange: repartition raw fact on l_orderkey; the agg's
    // ClusteredDistribution(orderkey, flag) is satisfied by the subset
    // partitioning, and the SMJ reuses it → ONE fact exchange total
    val q10repart = () => {
      val (li, o, c, n, r) = q10parts
      val liAgg = li.repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      noop(q10finish(liAgg, o, c, n, r))
    }
    val q10shj = () => { // r10-rejected at sf0.1; re-measure at x10
      val (li, o, c, n, r) = q10parts
      val liAgg = li.groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      noop(q10finish(liAgg, o.hint("shuffle_hash"), c, n, r))
    }
    val q10repartShj = () => {
      val (li, o, c, n, r) = q10parts
      val liAgg = li.repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      noop(q10finish(liAgg, o.hint("shuffle_hash"), c, n, r))
    }

    // broadcast a 2-col projection of orders (orderkey→custkey map):
    // the whole dim chain becomes broadcast-side, so lineitem never
    // shuffles raw — the only fact-granular exchange is the post-join
    // partial agg at (r_name, flag, orderkey), already partial-agged
    // map-side. revenue = plain sum (each lineitem contributes once to
    // its (orderkey, flag) group's rev); only n_orders needs the
    // orderkey granularity.
    def q10bcParts = {
      val (li, _, c, n, r) = q10parts
      val o2 = broadcast(Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey"))
      val joined = li.join(o2, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
      joined
    }
    val q10bc2 = () => { // two-phase manual: no Expand
      val joined = q10bcParts
      val byOrder = joined
        .groupBy(col("r_name"), col("l_returnflag"), col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      noop(byOrder.groupBy(col("r_name"), col("l_returnflag"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "l_returnflag"))
    }
    val q10bcd = () => { // single-shot: count_distinct (Expand x2)
      val joined = q10bcParts
      noop(joined.groupBy(col("r_name"), col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count_distinct(col("l_orderkey")).as("n_orders"))
        .orderBy("r_name", "l_returnflag"))
    }

    // ---- q32 exact percentile: Spark's `percentile` agg accumulates a
    // value→count OpenHashMap per group (the whole column in memory for
    // mostly-distinct doubles — 31× vs DuckDB at x10). Candidate: sort-
    // based rank interpolation — one exchange + per-group sort, keep
    // only the bracketing rows per percentile, interpolate in a tiny agg.
    val q32real = () => noop(
      graft.queries.AnalyticsQueries.queries("q32_percentile")(spark, dir))
    val q32rank = () => {
      import org.apache.spark.sql.expressions.Window
      val ps = Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99")
      val ev = Tables.loadEvents(spark, dir)
        .select(col("event_type"), col("value").cast("double").as("v"))
      val wOrd = Window.partitionBy("event_type").orderBy("v")
      val wAll = Window.partitionBy("event_type")
      val ranked = ev
        .withColumn("rn0", row_number().over(wOrd) - lit(1L))
        .withColumn("n", count(lit(1)).over(wAll))
      val keep = ps.map { case (p, _) =>
        val lo = floor((col("n") - 1) * p)
        col("rn0") === lo || col("rn0") === lo + 1
      }.reduce(_ || _)
      val aggs = ps.flatMap { case (p, nm) =>
        val lo = floor((col("n") - 1) * p)
        Seq(
          max(when(col("rn0") === lo, col("v"))).as(s"${nm}_lo"),
          max(when(col("rn0") === lo + 1, col("v"))).as(s"${nm}_hi"),
          max(col("n")).as(s"${nm}_n"))
      }
      val g = ranked.where(keep).groupBy("event_type")
        .agg(aggs.head, aggs.tail: _*)
      val out = ps.foldLeft(g) { case (df, (p, nm)) =>
        val t = (col(s"${nm}_n") - 1) * p
        val frac = t - floor(t)
        df.withColumn(nm, round(col(s"${nm}_lo") +
          frac * (coalesce(col(s"${nm}_hi"), col(s"${nm}_lo"))
            - col(s"${nm}_lo")), 6))
      }.select(col("event_type"), col("p50"), col("p95"), col("p99"))
        .orderBy("event_type")
      noop(out)
    }
    val q32aprx = () => { // accuracy-losing reference point, timing only
      noop(Tables.loadEvents(spark, dir)
        .groupBy("event_type")
        .agg(
          round(expr("approx_percentile(value, 0.5, 10000)"), 6).as("p50"),
          round(expr("approx_percentile(value, 0.95, 10000)"), 6).as("p95"),
          round(expr("approx_percentile(value, 0.99, 10000)"), 6).as("p99"))
        .orderBy("event_type"))
    }

    // value-count pre-agg: the corpus's value domain is small (17.8k
    // distinct in 1M rows at x10) — shrink in a codegen'd HashAggregate
    // first, then run the weighted percentile over (group × distinct
    // value) rows only. The object agg (boxed OpenHashMap per row) sees
    // 89k rows instead of 1M.
    val q32vc = () => {
      val vc = Tables.loadEvents(spark, dir)
        .groupBy(col("event_type"), col("value").cast("double").as("v"))
        .agg(count(lit(1)).as("freq"))
      noop(vc.groupBy("event_type")
        .agg(
          round(expr("percentile(v, 0.5, freq)"), 6).as("p50"),
          round(expr("percentile(v, 0.95, freq)"), 6).as("p95"),
          round(expr("percentile(v, 0.99, freq)"), 6).as("p99"))
        .orderBy("event_type"))
    }

    val q32direct = () => { // the pre-r11 single-agg form
      noop(Tables.loadEvents(spark, dir)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy("event_type"))
    }

    val q85real = () => noop(
      graft.queries.QualityQueries.queries("q85_profile")(spark, dir))
    val q85explain = () => {
      graft.queries.QualityQueries.queries("q85_profile")(spark, dir)
        .explain("formatted")
    }

    // ---- q85 decomposition: where do 2.5 s at x10 go? The profile is
    // pass1 (counts + 6 exact distincts via Expand + numeric/ts extremes)
    // crossJoined with pass2 (string extremes, second scan).
    def q85ev = Tables.loadEvents(spark, dir)
      .select("event_id", "user_id", "event_type", "value", "ts", "props")
    val q85cols = Seq("event_id", "user_id", "event_type", "value", "ts", "props")
    val q85distonly = () => noop(q85ev.agg(count(lit(1)).as("__n"),
      q85cols.map(c => count_distinct(col(c)).as(s"__${c}_d")): _*))
    val q85hashdist = () => noop(q85ev.agg(count(lit(1)).as("__n"),
      q85cols.map(c => count_distinct(xxhash64(col(c))).as(s"__${c}_d")): _*))
    val q85nodist = () => noop(q85ev.agg(count(lit(1)).as("__n"),
      (q85cols.flatMap(c => Seq(
        coalesce(sum(when(col(c).isNull, 1L)), lit(0L)).as(s"__${c}_nulls"))) ++
       Seq(min(col("event_id")).cast("double"), max(col("event_id")).cast("double"),
         min(col("user_id")).cast("double"), max(col("user_id")).cast("double"),
         min(col("value")).cast("double"), max(col("value")).cast("double"),
         min(unix_micros(col("ts").cast("timestamp"))),
         max(unix_micros(col("ts").cast("timestamp"))))): _*))
    val q85p2only = () => noop(q85ev.agg(
      min(col("event_type")).cast("string"), max(col("event_type")).cast("string"),
      min(col("props")).cast("string"), max(col("props")).cast("string")))

    // candidate A: 3 independent one-row frames crossJoined — the
    // multi-distinct agg no longer drags the non-distinct buffers
    // through its Expand pipeline
    val q85sep3 = () => {
      val d = q85ev.agg(count(lit(1)).as("__n"),
        q85cols.map(c => count_distinct(col(c)).as(s"__${c}_d")): _*)
      val nd = q85ev.agg(count(lit(1)).as("__n2"),
        (q85cols.map(c =>
          coalesce(sum(when(col(c).isNull, 1L)), lit(0L)).as(s"__${c}_nulls")) ++
         Seq(min(col("event_id")).cast("double").as("eid_min"),
           max(col("event_id")).cast("double").as("eid_max"),
           min(col("user_id")).cast("double").as("uid_min"),
           max(col("user_id")).cast("double").as("uid_max"),
           min(col("value")).cast("double").as("v_min"),
           max(col("value")).cast("double").as("v_max"),
           min(unix_micros(col("ts").cast("timestamp"))).as("ts_min"),
           max(unix_micros(col("ts").cast("timestamp"))).as("ts_max"))): _*)
      val p2 = q85ev.agg(
        min(col("event_type")).cast("string").as("et_min"),
        max(col("event_type")).cast("string").as("et_max"),
        min(col("props")).cast("string").as("p_min"),
        max(col("props")).cast("string").as("p_max"))
      noop(d.crossJoin(nd).crossJoin(p2))
    }
    // candidate B: additionally split the 6 distincts into per-column
    // single-distinct aggs (no Expand at all; 6 independent stage chains
    // run concurrently inside one job)
    val q85sep8 = () => {
      val ds = q85cols.map(c => q85ev.select(col(c))
        .agg(count_distinct(col(c)).as(s"__${c}_d")))
      val nd = q85ev.agg(count(lit(1)).as("__n2"),
        q85cols.map(c =>
          coalesce(sum(when(col(c).isNull, 1L)), lit(0L)).as(s"__${c}_nulls")): _*)
      val p2 = q85ev.agg(
        min(col("event_type")).cast("string").as("et_min"),
        max(col("event_type")).cast("string").as("et_max"),
        min(col("props")).cast("string").as("p_min"),
        max(col("props")).cast("string").as("p_max"))
      noop((ds :+ nd :+ p2).reduce(_ crossJoin _))
    }

    // ---- q51 decomposition: CMS sketch pass + probe pass vs the plain
    // groupBy-HAVING (map-side combine makes the naive form cheap at
    // LOW key cardinality; the sketch pays only when keys don't
    // combine). Where does 1.03 s at x10 go?
    val q51real = () => noop(
      graft.queries.AnalyticsQueries.queries("q51_heavy_hitters")(spark, dir))
    val q51plain = () => noop(Tables.loadEvents(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .where(col("n_events") >= 80)
      .orderBy("user_id"))
    val q51sketch = () => {
      graft.operators.HeavyHitters.keySketch(
        Tables.loadEvents(spark, dir), Seq("user_id"))
      ()
    }

    // ---- r11 q41 at the amplified tier: the committed layout uses 8
    // buckets, which caps the bucketed read/SMJ parallelism at 8 of 32
    // cores once the fact side is 18 M rows (x30: 2.56 s vs DuckDB's
    // 0.38 s plain hash join). Measure bucket-count scaling against
    // the plain exchange join on identical projections.
    def q41li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def q41o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    def q41agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    val bktCache = scala.collection.mutable.Map[Int, (String, String)]()
    def mkBkt(n: Int): (String, String) = bktCache.getOrElseUpdate(n, {
      val (oT, lT) = (s"graft_scr_o_$n", s"graft_scr_l_$n")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(oT, lT).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
      }
      graft.sources.ParquetSink.writeBucketedTable(q41o, oT, "o_orderkey", n)
      graft.sources.ParquetSink.writeBucketedTable(q41li, lT, "l_orderkey", n)
      (oT, lT)
    })
    def q41bkt(n: Int) = () => {
      val (oT, lT) = mkBkt(n)
      noop(q41agg(spark.table(lT).hint("merge")
        .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))))
    }
    val q41plainSmj = () => noop(q41agg(q41li.hint("merge")
      .join(q41o, col("l_orderkey") === col("o_orderkey"))))
    val q41plainShj = () => noop(q41agg(q41li
      .join(q41o.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))))
    val q41bcast = () => noop(q41agg(q41li
      .join(broadcast(q41o), col("l_orderkey") === col("o_orderkey"))))

    // writeBucketedTable now pre-repartitions on the key internally
    // (one file per bucket), so the historical one-file variant is the
    // same layout as mkBkt — kept as an alias for the measurement code
    // below that still references it.
    def mkBktOne(n: Int): (String, String) = mkBkt(n)
    // true MULTI-file-per-bucket layout (oneFilePerBucket = false):
    // keeps the historical one-file-vs-multi-file comparison (the
    // 2.87 → 1.19 s table in ParquetSink's doc) reproducible
    val bktMultiCache = scala.collection.mutable.Map[Int, (String, String)]()
    def mkBktMulti(n: Int): (String, String) =
      bktMultiCache.getOrElseUpdate(n, {
        val (oT, lT) = (s"graft_scr_om_$n", s"graft_scr_lm_$n")
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
        val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        Seq(oT, lT).foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $t")
          fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
        }
        graft.sources.ParquetSink.writeBucketedTable(
          q41o, oT, "o_orderkey", n, oneFilePerBucket = false)
        graft.sources.ParquetSink.writeBucketedTable(
          q41li, lT, "l_orderkey", n, oneFilePerBucket = false)
        (oT, lT)
      })
    def q41bktMulti(n: Int) = () => {
      val (oT, lT) = mkBktMulti(n)
      noop(q41agg(spark.table(lT).hint("merge")
        .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))))
    }
    def q41bktOne(n: Int) = () => {
      val (oT, lT) = mkBktOne(n)
      noop(q41agg(spark.table(lT).hint("merge")
        .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))))
    }
    def q41bktOneShj(n: Int) = () => {
      val (oT, lT) = mkBktOne(n)
      noop(q41agg(spark.table(lT)
        .join(spark.table(oT).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))))
    }

    val q41real = () => noop(
      graft.queries.EcommerceQueries.queries("q41_colocated_join")(spark, dir))

    // ---- q19 at the amplified tier: 6.8 s at x30 is the slowest
    // Spark query in the sweep (rows-only — not in the shared ratio,
    // but it IS bench wall time). Decompose: fingerprint scan →
    // bucket explode+cache → self-join candidates → verify+distinct.
    import graft.operators.SimHash
    def q19docs = Tables.load(spark, dir, "documents")
    lazy val q19stop = SimHash.stopFeatureHashes(
      q19docs, "text", maxDf = 0.5, shingleN = 3, portable = false)
    def q19fps = SimHash.fingerprints128(
      q19docs, "doc_id", "text", portable = false, shingleN = 3,
      stop = q19stop)
    val q19real = () => noop(
      graft.queries.LlmQueries.queries("q19_simhash")(spark, dir))
    val q19fp = () => noop(q19fps)
    val q19cand = () => noop(
      SimHash.chunkCandidates(q19fps, maxHamming = 8, comboSize = 2))
    val q19ver = () => noop(
      SimHash.chunkCandidates(q19fps, maxHamming = 8, comboSize = 2)
        .where(col("hamming") <= 8))

    // grouped-bucket candidate generation: ONE exchange of the
    // 45-keys/doc explode (no cache, no self-join double pass) —
    // pairs + Hamming verify generated in-bucket via HOFs
    val q19grp = () => {
      val nChunks = 10
      val spans = SimHash.chunkSpans(nChunks, 128)
      val combos = spans.indices.combinations(2).toSeq
      val tables = combos.zipWithIndex.map { case (cs, ti) =>
        val key = cs.foldLeft(lit(0L)) { (acc, j) =>
          val (off, w) = spans(j)
          shiftleft(acc, w).bitwiseOR(
            SimHash.extract128(col("fp_hi"), col("fp_lo"), off, w))
        }
        struct(lit(ti).as("tbl"), key.as("tkey"))
      }
      val buckets = q19fps
        .select(col("doc"), col("fp_hi"), col("fp_lo"),
          explode(array(tables: _*)).as("tk"))
        .groupBy(col("tk.tbl").as("tbl"), col("tk.tkey").as("tkey"))
        .agg(array_sort(collect_list(
          struct(col("doc"), col("fp_hi"), col("fp_lo")))).as("ds"))
        .where(size(col("ds")) > 1)
      def ham(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        (bit_count(a.getField("fp_hi").bitwiseXOR(b.getField("fp_hi"))) +
          bit_count(a.getField("fp_lo").bitwiseXOR(b.getField("fp_lo"))))
          .cast("int")
      val n = size(col("ds"))
      val pairs = filter(
        flatten(transform(sequence(lit(2), n), i =>
          transform(sequence(lit(1), i - 1), j =>
            struct(element_at(col("ds"), j).as("a"),
              element_at(col("ds"), i).as("b"))))),
        p => ham(p.getField("a"), p.getField("b")) <= 8)
      noop(buckets.select(explode(pairs).as("p"))
        .select(col("p.a.doc").as("doc_a"), col("p.b.doc").as("doc_b"),
          ham(col("p.a"), col("p.b")).as("hamming"))
        .distinct()
        .withColumn("hamming", col("hamming").cast("bigint"))
        .orderBy("doc_a", "doc_b"))
    }

    // narrow-shuffle candidates: explode only (doc, tbl, tkey) into
    // the self-join (24 B/row vs 40 B with the fingerprints), dedup
    // candidate pairs, then join the 5 M-row fingerprint frame back
    // twice for the Hamming verify
    val q19narrow = () => {
      val nChunks = 10
      val spans = SimHash.chunkSpans(nChunks, 128)
      val combos = spans.indices.combinations(2).toSeq
      val tables = combos.zipWithIndex.map { case (cs, ti) =>
        val key = cs.foldLeft(lit(0L)) { (acc, j) =>
          val (off, w) = spans(j)
          shiftleft(acc, w).bitwiseOR(
            SimHash.extract128(col("fp_hi"), col("fp_lo"), off, w))
        }
        struct(lit(ti).as("tbl"), key.as("tkey"))
      }
      val fps = graft.operators.CacheRegistry.persist(q19fps)
      val keys = fps.select(col("doc"),
        explode(array(tables: _*)).as("tk"))
        .select(col("doc"), col("tk.tbl"), col("tk.tkey"))
      val cand = keys.as("a")
        .join(keys.as("b"),
          col("a.tbl") === col("b.tbl") &&
            col("a.tkey") === col("b.tkey") &&
            col("a.doc") < col("b.doc"))
        .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        .distinct()
      val fa = fps.select(col("doc").as("doc_a"),
        col("fp_hi").as("ah"), col("fp_lo").as("al"))
      val fb = fps.select(col("doc").as("doc_b"),
        col("fp_hi").as("bh"), col("fp_lo").as("bl"))
      noop(cand.join(fa, "doc_a").join(fb, "doc_b")
        .withColumn("hamming",
          (bit_count(col("ah").bitwiseXOR(col("bh"))) +
            bit_count(col("al").bitwiseXOR(col("bl")))).cast("int"))
        .where(col("hamming") <= 8)
        .select(col("doc_a"), col("doc_b"),
          col("hamming").cast("bigint").as("hamming"))
        .orderBy("doc_a", "doc_b"))
    }

    // ---- r15 q42 decomposition at x100 (r14 verdict #2): 13.3 s is
    // the suite's largest rows-only absolute. Split: shingle hashes
    // alone (floor) → + idf-weight map projection (isolates the
    // element_at-on-literal-map lookup) → + weighted simhash kernel
    // (q42fp) → + combo candidate join (q42cand) → + Hamming verify +
    // distinct (q42ver ≈ real minus sort).
    lazy val q42hot = SimHash.idfFeatureWeights(
      q19docs, "text", shingleN = 3, portable = false)
    def q42fps = SimHash.fingerprints128Weighted(
      q19docs, "doc_id", "text", hot = q42hot, portable = false,
      shingleN = 3)
    val q42real = () => noop(
      graft.queries.LlmQueries.queries("q42_simhash_idf")(spark, dir))
    val q42fp = () => noop(q42fps)
    val q42shingle = () => noop(q19docs.select(col("doc_id"),
      aggregate(
        graft.operators.TextDedup.shingleHashes64(col("text"), 3),
        lit(0L), (a, v) => a.bitwiseXOR(v)).as("hsum")))
    val q42wproj = () => {
      val wmap = typedLit(q42hot.toMap)
      noop(q19docs.select(col("doc_id"),
        aggregate(
          transform(
            graft.operators.TextDedup.shingleHashes64(col("text"), 3),
            h => coalesce(element_at(wmap, h),
              lit(SimHash.DefaultWeight)).cast("long")),
          lit(0L), (a, v) => a + v).as("wsum")))
    }
    val q42cand = () => noop(
      SimHash.chunkCandidates(q42fps, maxHamming = 8, comboSize = 2))
    val q42ver = () => noop(
      SimHash.chunkCandidates(q42fps, maxHamming = 8, comboSize = 2)
        .where(col("hamming") <= 8).distinct())
    val q42hotsize = () => println(s"Q42HOT $dir n=${q42hot.length} " +
      s"weights=${q42hot.map(_._2).groupBy(identity)
        .map { case (w, a) => s"$w:${a.length}" }.toSeq.sorted.mkString(",")}")

    val q23real = () => noop(
      graft.queries.LlmQueries.queries("q23_text_stats")(spark, dir))

    // ---- r12 q45 decomposition at x100 (verdict #2): 19.4 s / 2.40×
    // is the engine's largest absolute query; split bloom build /
    // kept-branch probe scan / maybe-branch anti join so the dominant
    // term is known before acting.
    import graft.operators.BloomPrune
    def q45parts = {
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val delta = li.where(col("l_orderkey") % 13 === 0)
        .withColumn("l_quantity", lit(0.0))
      (li, delta)
    }
    // bloom built once per JVM so the probe slots time probing only
    lazy val q45bloom: Array[Byte] = {
      val (_, delta) = q45parts
      BloomPrune.keyBloom(delta, Seq("l_orderkey", "l_linenumber"),
        expectedItems = math.max(Tables.load(spark, dir, "lineitem")
          .count() / 13L, 1000L), fpp = 0.01)
    }
    val q45bloomBuild = () => {
      val (_, delta) = q45parts
      BloomPrune.keyBloom(delta, Seq("l_orderkey", "l_linenumber"),
        expectedItems = 4600000L, fpp = 0.01)
      ()
    }
    val q45keptScan = () => { // bloom-negative branch alone
      val (li, _) = q45parts
      noop(li.where(!BloomPrune.mightContainKeys(q45bloom,
        Seq(col("l_orderkey"), col("l_linenumber")))))
    }
    val q45maybeAnti = () => { // bloom-positive branch + anti join
      val (li, delta) = q45parts
      noop(li.where(BloomPrune.mightContainKeys(q45bloom,
          Seq(col("l_orderkey"), col("l_linenumber"))))
        .join(delta.select("l_orderkey", "l_linenumber"),
          Seq("l_orderkey", "l_linenumber"), "left_anti"))
    }
    val q45aggSort = () => { // trailing agg+sort over a raw union
      val (li, delta) = q45parts
      noop(li.unionByName(delta).groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
        .orderBy("l_orderkey"))
    }

    // ---- r12 q10 on the bucketed layout (verdict #3): the q41
    // machinery should eliminate both fact-scale exchanges — the agg's
    // ClusteredDistribution(orderkey, flag) and the SMJ/SHJ are both
    // satisfied by the bucket partitioning.
    def mkQ10Bkt(n: Int): (String, String) = bktCache.getOrElseUpdate(1000 + n, {
      val (oT, lT) = (s"graft_scr10_o_$n", s"graft_scr10_l_$n")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(oT, lT).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
      }
      graft.sources.ParquetSink.writeBucketedTable(
        Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        oT, "o_orderkey", n)
      graft.sources.ParquetSink.writeBucketedTable(
        Tables.load(spark, dir, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"),
        lT, "l_orderkey", n)
      (oT, lT)
    })
    def q10bktAgg(lT: String) = spark.table(lT)
      .groupBy(col("l_orderkey"), col("l_returnflag"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev"))
    def q10bkt(n: Int) = () => {
      val (oT, lT) = mkQ10Bkt(n)
      noop(q10finish(q10bktAgg(lT).hint("merge"),
        spark.table(oT),
        broadcast(Tables.load(spark, dir, "customer")),
        broadcast(Tables.load(spark, dir, "nation")),
        broadcast(Tables.load(spark, dir, "region"))))
    }
    def q10bktShj(n: Int) = () => {
      val (oT, lT) = mkQ10Bkt(n)
      noop(q10finish(q10bktAgg(lT),
        spark.table(oT).hint("shuffle_hash"),
        broadcast(Tables.load(spark, dir, "customer")),
        broadcast(Tables.load(spark, dir, "nation")),
        broadcast(Tables.load(spark, dir, "region"))))
    }

    // r12 second window: act on the first window's decomposition.
    // q45: the trailing agg+sort is 10.9 s of 19.0 — collapse its two
    // fact-scale exchanges (hash agg + range sort) into ONE range
    // exchange that satisfies both the grouping and the global order
    // (the q44 upsertOrdered trick).
    val q45rangeAgg = () => {
      val (li, delta) = q45parts
      val merged = graft.operators.BloomPrune.prunedDeleteInsert(
        li, delta, Seq("l_orderkey", "l_linenumber"),
        expectedItems = 4600000L, fpp = 0.01)
      noop(merged.repartitionByRange(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
        .orderBy("l_orderkey"))
    }
    val q45rangeAggOnly = () => { // the agg+sort alone, range form
      val (li, delta) = q45parts
      noop(li.unionByName(delta).repartitionByRange(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
        .orderBy("l_orderkey"))
    }
    // q10: join-first on the bucketed layout — both sides read
    // bucket-sorted so the SMJ needs NO sort at all (the agg-first
    // form re-sorts the 16 M-group agg output), and the post-join agg
    // at (r_name, flag, orderkey) is still exchange-free (orderkey
    // partitioning satisfies the clustering), so only the tiny final
    // agg shuffles.
    def q10bktJoinFirst(n: Int) = () => {
      val (oT, lT) = mkQ10Bkt(n)
      val joined = spark.table(lT).hint("merge")
        .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(spark, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(spark, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(spark, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
      val byOrder = joined
        .groupBy(col("r_name"), col("l_returnflag"), col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      noop(byOrder.groupBy(col("r_name"), col("l_returnflag"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "l_returnflag"))
    }

    // ---- r12 rollup/report family at x100 (verdict #6) + q85 exact-
    // distinct alternative (verdict #7) + machinery pricing (verdict #5)
    val q15real = () => noop(
      graft.queries.EcommerceQueries.queries("q15_batch_stats")(spark, dir))
    // two-phase distinct: partial-dedup (date, user) BEFORE the
    // exchange replaces the count_distinct Expand (the q53/q85 trick)
    val q15two = () => {
      val ev = Tables.loadEvents(spark, dir)
      val byUser = ev.groupBy(to_date(col("ts")).as("batch_date"),
          col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("v"))
      noop(byUser.groupBy("batch_date")
        .agg(sum(col("n")).as("n_events"),
          count(lit(1)).as("n_users"),
          sum(col("v")).cast("double").as("total_value"))
        .withColumn("batch_date", date_format(col("batch_date"), "yyyy-MM-dd"))
        .orderBy("batch_date"))
    }
    val q29real = () => noop(
      graft.queries.AnalyticsQueries.queries("q29_topn_per_group")(spark, dir))
    val q30real = () => noop(
      graft.queries.AnalyticsQueries.queries("q30_rollup")(spark, dir))
    // leaf re-agg: ONE plain (priority, status) aggregate (map-side
    // combined, no Expand), then the rollup runs over the ~15-row leaf
    val q30leaf = () => {
      val leaf = Tables.load(spark, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      noop(leaf.rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(sum(col("n")).as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first))
    }
    val q31real = () => noop(
      graft.queries.AnalyticsQueries.queries("q31_pivot")(spark, dir))
    // group on the DATE (int math), render the string after the agg —
    // date_format runs per OUTPUT row instead of per input row
    val q31date = () => {
      noop(Tables.loadEvents(spark, dir)
        .groupBy(to_date(col("ts")).as("d0"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
        .withColumn("d", date_format(col("d0"), "yyyy-MM-dd"))
        .drop("d0")
        .select(col("d"), col("click"), col("error"), col("purchase"),
          col("signup"), col("view"))
        .orderBy("d"))
    }
    val q35real = () => noop(
      graft.queries.AnalyticsQueries.queries("q35_tumbling")(spark, dir))
    // arithmetic bucketing: floor-divide epoch micros instead of the
    // window() struct machinery
    val q35arith = () => {
      val w = 21600000000L // 6h in micros
      noop(Tables.loadEvents(spark, dir)
        .groupBy((floor(unix_micros(col("ts")) / w) * w).as("wus"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .select(date_format(timestamp_micros(col("wus")),
            "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type"))
    }
    // q85 PASS-3 alternative: manual explode + two-phase dedup instead
    // of the planner's multi-distinct Expand (2 agg exchanges, but the
    // first one ships PRE-DEDUPED (col, value) pairs)
    val q85explode = () => {
      val ev = Tables.loadEvents(spark, dir)
      val cols = Seq("event_id", "user_id", "event_type", "value",
        "ts", "props")
      val pairs = ev.select(posexplode(array(
        cols.map(c => xxhash64(col(c))): _*)).as(Seq("cid", "vh")))
      noop(pairs.where(col("vh").isNotNull)
        .groupBy("cid", "vh").agg(count(lit(1)))
        .groupBy("cid").agg(count(lit(1)).as("n_distinct"))
        .orderBy("cid"))
    }
    // the committed PASS-3 shape alone, for the same columns
    val q85pass3 = () => {
      val ev = Tables.loadEvents(spark, dir)
      val cols = Seq("event_id", "user_id", "event_type", "value",
        "ts", "props")
      noop(ev.agg(count_distinct(col(cols.head)).as("d0"),
        cols.tail.zipWithIndex.map { case (c, i) =>
          count_distinct(col(c)).as(s"d${i + 1}") }: _*))
    }

    // r12 residual decompositions: q10's bucketed-tier remaining cost
    // (is it the 16 M-group hash agg?) and q15's floor (scan + plain
    // agg with NO distinct machinery)
    val q10bktAggOnly = () => {
      val (_, lT) = mkQ10Bkt(64)
      noop(q10bktAgg(lT))
    }
    val q15floor = () => {
      noop(Tables.loadEvents(spark, dir)
        .groupBy(to_date(col("ts")).as("batch_date"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy("batch_date"))
    }

    // q29 pieces: the 15 M-row orders scan+combine alone, then +joins
    val q29agg = () => {
      noop(Tables.load(spark, dir, "orders").groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_d")))
    }
    val q29aggDouble = () => { // is the decimal cast the cost?
      noop(Tables.load(spark, dir, "orders").groupBy("o_custkey")
        .agg(sum(col("o_totalprice")).as("rev_d")))
    }

    // q65 salt-factor sweep at x100: factor 8 was tuned at sf0.1; the
    // hot key carries ~20 M rows at x100, so 8 salts still leave
    // 2.5 M rows per reducer — size the factor from the hot mass
    def q65factor(f: Int) = () => {
      val fact = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .withColumn("pk",
          when(col("l_orderkey") % 3 === 0, lit(1L))
            .otherwise(col("l_partkey").cast("long")))
      val dim = Tables.load(spark, dir, "part")
        .select(col("p_partkey").cast("long").as("pk"), col("p_brand"))
        .hint("shuffle_hash")
      val hot = graft.operators.Skew.hotKeys(fact, "pk",
          rowIdCols = Seq("l_orderkey", "l_linenumber"),
          minShare = 0.05, sampleMod = 10)
        .collect().map(_.get(0)).toSeq
      noop(graft.operators.Skew.partialSaltedJoin(fact, dim, "pk",
          factor = f, saltSource = Seq("l_orderkey", "l_linenumber"),
          hot = hot)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
        .orderBy("p_brand"))
    }

    // ---- r13 q58 decomposition at x100 (verdict #1): 2.64 s / 3.5×,
    // flat 3.5–4.3× at every tier, never decomposed. Suspects: the
    // window partitions by `split` ALONE (3 values — one task sorts
    // the 4 M-row train group), plus the md5-order projection.
    import graft.operators.Sampling
    import graft.functions.TextFunctions
    def q58base = Sampling.hashSplit(
        Tables.load(spark, dir, "documents").select("doc_id", "text"), "doc_id")
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col("text")).cast("long"))
      .select("doc_id", "split", "n_tokens")
    val q58real = () => noop(
      graft.queries.LlmQueries.queries("q58_token_pack")(spark, dir))
    // floor: scan + split + tokenize + trailing agg/sort, NO window
    val q58floor = () => noop(q58base
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("split"))
    // + the per-split exchange and md5 sort the window pays, no window fn
    val q58sort = () => noop(q58base
      .repartition(col("split"))
      .sortWithinPartitions(md5(col("doc_id").cast("string")), col("doc_id")))
    // floor with n_tokens = length (no normalize/split): isolates the
    // tokenize expression's share of the scan pass
    val q58floorLen = () => noop(Sampling.hashSplit(
        Tables.load(spark, dir, "documents").select("doc_id", "text"), "doc_id")
      .withColumn("n_tokens", length(col("text")).cast("long"))
      .select("doc_id", "split", "n_tokens")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("split"))
    // candidate: distributed prefix sum (16^2 bucket-parallel sort+scan)
    val q58bucketed = () => noop(
      Sampling.packByBudgetBucketed(q58base, Seq("split"), "doc_id",
          "n_tokens", 2000L)
        .groupBy("split", "shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy("split", "shard"))
    // r15 tier-switch check: the single-window pack on the SAME native
    // token_count base the real query uses — is the windowed form
    // cheaper below the q61-style footer-count threshold?
    def q58nat = Sampling.hashSplit(
        Tables.load(spark, dir, "documents").select("doc_id", "text"),
        "doc_id")
      .withColumn("n_tokens", call_function("token_count", col("text")))
      .select("doc_id", "split", "n_tokens")
    val q58win = () => noop(
      Sampling.packByBudgetWindowed(q58nat, Seq("split"), "doc_id",
          "n_tokens", 2000L)
        .groupBy("split", "shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy("split", "shard"))

    // ---- r13 q39 decomposition at x100 (verdict #2): 1.73 s / 2.7×.
    // The check SHOULD be one scan, but count_distinct (Unique) makes
    // Catalyst plan an Expand that doubles every row ahead of the
    // partial aggregate. Split: seeded scan / no-Unique agg / Expand
    // form / grouped rewrite.
    import graft.operators.Validate
    import graft.operators.Validate._
    def q39seed = graft.queries.QualityQueries.seededOrders(spark, dir)
    def q39exp(withUnique: Boolean): Seq[Validate.Expectation] = Seq(
      NotNull("o_custkey", maxNullRate = 0.005),
      NotNull("o_orderkey"),
      InSet("o_orderstatus", Seq("O", "F", "P"), maxBadRate = 0.02),
      InRange("o_totalprice", min = Some(0.0), max = None, maxBadRate = 0.005),
      TypeConforms("ship_code", "bigint", maxBadRate = 0.02),
      RowCountBetween(1000L, 100000000L)) ++
      (if (withUnique) Seq(Unique("o_orderkey")) else Nil)
    val q39real = () => noop(
      graft.queries.QualityQueries.queries("q39_quality_gate")(spark, dir))
    val q39scan = () => noop(q39seed.agg(count(lit(1)).as("n")))
    val q39noUnique = () => noop(
      Validate.check(q39seed, q39exp(withUnique = false))
        .withColumn("passed", col("passed").cast("string")))
    // the pre-r13 Expand form: two Uniques defeats the grouped rewrite
    // only for the plan — time the SAME 7 expectations via the old path
    // by asking for the o_orderkey distinct twice (identical aggregates)
    val q39expand = () => noop(
      Validate.check(q39seed, q39exp(withUnique = true) :+
          Unique("o_orderkey", maxDupRate = 1.0))
        .withColumn("passed", col("passed").cast("string")))
    // split form: row-local expectations in one exchange-free agg; the
    // distinct count as its own branch over the BARE key column (the
    // one-distinct plan otherwise drags every partial sum through the
    // 15 M-key exchange)
    val q39split = () => {
      val seed = q39seed
      val a = seed.agg(count(lit(1)).as("__n"),
        coalesce(sum(when(col("o_custkey").isNull, 1L)), lit(0L)).as("b0"),
        coalesce(sum(when(col("o_orderkey").isNull, 1L)), lit(0L)).as("b1"),
        coalesce(sum(when(col("o_orderstatus").isNotNull &&
          !col("o_orderstatus").isin("O", "F", "P"), 1L)), lit(0L)).as("b2"),
        coalesce(sum(when(col("o_totalprice").isNotNull &&
          col("o_totalprice") < 0.0, 1L)), lit(0L)).as("b3"),
        coalesce(sum(when(col("ship_code").isNotNull &&
          col("ship_code").try_cast("bigint").isNull, 1L)), lit(0L)).as("b4"))
      val b = seed.select(col("o_orderkey")).agg(
        coalesce(count(col("o_orderkey")) -
          count_distinct(col("o_orderkey")), lit(0L)).as("b5"))
      noop(a.crossJoin(broadcast(b)))
    }

    // ---- r13 q71 decomposition at x100 (verdict #3): 5.44 s / 2.2×;
    // the oracle replays closed-form frames, Spark pays a real codec.
    // Split encode / +demux / +decode so the codec-vs-floor share is
    // known (the q83 precedent found 40 M stray native allocs).
    import graft.operators.Multimodal
    def q71ids = Tables.load(spark, dir, "documents").select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
    val q71real = () => noop(
      graft.queries.LlmQueries.queries("q71_video_frames")(spark, dir))
    val q71enc = () => noop(
      Multimodal.encodeVideo(spark, q71ids.toDF(), "doc_id").toDF()
        .select(col("id"), length(col("payload")).as("n_bytes")))
    val q71demux = () => {
      val vid = Multimodal.encodeVideo(spark, q71ids.toDF(), "doc_id").toDF()
      noop(Multimodal.frameSample(spark, vid, "id", "payload", stride = 2)
        .toDF().select(col("id"), col("frameIdx"),
          length(col("frame")).as("n_bytes")))
    }
    val q71dec = () => {
      val vid = Multimodal.encodeVideo(spark, q71ids.toDF(), "doc_id").toDF()
      val fr = Multimodal.frameSample(spark, vid, "id", "payload", stride = 2)
      noop(Multimodal.decodeFrames(spark, fr).toDF())
    }
    // the global-sort child has NO shuffle below it, so the range
    // exchange's boundary-sampling job re-runs the whole codec chain
    // (real 5.38 ≈ 2× the dec 2.66 floor). Two candidate barriers:
    def q71stats = {
      val vid = Multimodal.encodeVideo(spark, q71ids.toDF(), "doc_id").toDF()
      val fr = Multimodal.frameSample(spark, vid, "id", "payload", stride = 2)
      Multimodal.decodeFrames(spark, fr).toDF()
        .select(col("id").as("doc_id"), col("frameIdx").as("frame_idx"),
          col("width"), col("height"), col("nChannels").as("n_channels"),
          round(element_at(col("channelMeans"), 1), 6).as("r_mean"),
          round(element_at(col("channelMeans"), 2), 6).as("g_mean"),
          round(element_at(col("channelMeans"), 3), 6).as("b_mean"),
          col("pixelSum").as("pixel_sum"))
    }
    // (a) one round-robin exchange of the SMALL stat rows: the sample
    // job re-reads its shuffle files instead of re-running the codecs
    val q71barrier = () => noop(q71stats
      .repartition(spark.sparkContext.defaultParallelism)
      .orderBy("doc_id", "frame_idx"))
    // (b) the q59 shape: partition-local sort, no global exchange
    val q71swp = () => noop(q71stats.sortWithinPartitions("doc_id", "frame_idx"))

    // ---- r13 stretch: q05 flatten on a co-bucketed layout (verdict
    // #8). The join+window share one key; bucketed scan should elide
    // BOTH exchanges and the SMJ/window sorts.
    def q05cols = (
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderstatus"),
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity"))
    val q05bktCache = scala.collection.mutable.Map[Int, (String, String)]()
    def mkBkt05(n: Int): (String, String) = q05bktCache.getOrElseUpdate(n, {
      val (oT, lT) = (s"graft_scr5_o_$n", s"graft_scr5_l_$n")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(oT, lT).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
      }
      val (o5, l5) = q05cols
      graft.sources.ParquetSink.writeBucketedTable(o5, oT, "o_orderkey", n)
      graft.sources.ParquetSink.writeBucketedTable(l5, lT, "l_orderkey", n)
      (oT, lT)
    })
    def q05flat(o: org.apache.spark.sql.DataFrame,
        l: org.apache.spark.sql.DataFrame) = {
      val flat = graft.operators.Flatten.prefixFlatten(
        o, l, "o_orderkey", "l_orderkey")
      flat.select(
          col("order_o_orderkey").as("order_key"),
          col("order_o_orderstatus").as("order_status"),
          col("item_l_linenumber").as("item_linenumber"),
          col("item_l_quantity").as("item_quantity"),
          col("total_items_in_order"), col("has_multiple_items"))
        .orderBy("order_key", "item_linenumber")
    }
    val q05real = () => noop(
      graft.queries.EcommerceQueries.queries("q05_flatten_prefix")(spark, dir))
    def q05bkt(n: Int) = () => {
      val (oT, lT) = mkBkt05(n)
      noop(q05flat(spark.table(oT).hint("merge"), spark.table(lT)))
    }

    val allSlots: Map[String, () => Unit] = Map(
      "q05real" -> q05real,
      "q05bkt32" -> q05bkt(32), "q05bkt64" -> q05bkt(64),
      "q61real" -> (() => noop(graft.queries.LlmQueries
        .queries("q61_corpus_pipeline")(spark, dir))),
      "q61win" -> (() => noop(
        graft.queries.LlmQueries.q61PackVariant(spark, dir, "windowed"))),
      "q61nocache" -> (() => noop(
        graft.queries.LlmQueries.q61PackVariant(spark, dir, "nocache"))),
      "q58real" -> q58real, "q58floor" -> q58floor,
      "q58floorLen" -> q58floorLen,
      "q58sort" -> q58sort, "q58bucketed" -> q58bucketed,
      "q58win" -> q58win,
      "q66real" -> (() => noop(graft.queries.LlmQueries
        .queries("q66_lsh_artifact")(spark, dir))),
      "q39real" -> q39real, "q39scan" -> q39scan,
      "q39noUnique" -> q39noUnique, "q39expand" -> q39expand,
      "q39split" -> q39split,
      "q39distOnly" -> (() => noop(q39seed.select(col("o_orderkey")).agg(
        coalesce(count(col("o_orderkey")) -
          count_distinct(col("o_orderkey")), lit(0L)).as("b5")))),
      "q71real" -> q71real, "q71enc" -> q71enc,
      "q71demux" -> q71demux, "q71dec" -> q71dec,
      "q71barrier" -> q71barrier, "q71swp" -> q71swp,
      "q64real" -> (() => noop(graft.queries.LlmQueries
        .queries("q64_image_decode")(spark, dir))),
      "q41bktMulti32" -> q41bktMulti(32),
      "q65f8" -> q65factor(8),
      "q65f16" -> q65factor(16),
      "q65f32" -> q65factor(32),
      "q65f64" -> q65factor(64),
      "q29agg" -> q29agg,
      "q29aggDouble" -> q29aggDouble,
      "q10bktAggOnly" -> q10bktAggOnly,
      "q15floor" -> q15floor,
      "q15real" -> q15real, "q15two" -> q15two,
      "q29real" -> q29real,
      "q30real" -> q30real, "q30leaf" -> q30leaf,
      "q31real" -> q31real, "q31date" -> q31date,
      "q35real" -> q35real, "q35arith" -> q35arith,
      "q85real" -> q85real, "q85explode" -> q85explode,
      "q85pass3" -> q85pass3,
      "q65real" -> q65real, "q65plain" -> q65plain,
      "q51real" -> q51real, "q51plain" -> q51plain,
      "q53two" -> (() => noop(
        graft.queries.AnalyticsQueries.q53Variant(spark, dir, "two"))),
      "q53sweep" -> (() => noop(
        graft.queries.AnalyticsQueries.q53Variant(spark, dir, "sweep"))),
      "q53firstocc" -> (() => noop(
        graft.queries.AnalyticsQueries.q53Variant(spark, dir, "firstocc"))),
      "q53eqf" -> (() => {
        val a = graft.queries.AnalyticsQueries.q53Variant(spark, dir, "two").collect()
        val b = graft.queries.AnalyticsQueries.q53Variant(spark, dir, "firstocc").collect()
        val ok = a.length == b.length && a.zip(b).forall { case (x, y) => x == y }
        println(s"EQMATCHF $dir rows=${a.length} match=$ok")
        if (!ok) a.zip(b).filter { case (x, y) => x != y }.take(5)
          .foreach { case (x, y) => println(s"  two=$x firstocc=$y") }
      }),
      // row-for-row equality of the sweep form vs the join form at the
      // ambient SF (prints EQMATCH true/false; not a timing slot)
      "q53eq" -> (() => {
        val a = graft.queries.AnalyticsQueries.q53Variant(spark, dir, "two").collect()
        val b = graft.queries.AnalyticsQueries.q53Variant(spark, dir, "sweep").collect()
        val ok = a.length == b.length && a.zip(b).forall { case (x, y) => x == y }
        println(s"EQMATCH $dir rows=${a.length} match=$ok")
        if (!ok) a.zip(b).filter { case (x, y) => x != y }.take(5)
          .foreach { case (x, y) => println(s"  two=$x sweep=$y") }
      }),
      // branch decomposition: A = count+sum branch alone (join once),
      // B = distinct-users branch alone (join once), floor = both
      // scans + bin compute + the bin exchanges + a no-join agg+sort
      "q53branchA" -> (() => {
        val winUs = 600000000L
        val ev = Tables.load(spark, dir, "events")
          .withColumn("ts_us", expr("ts_ns div 1000"))
        val inc = ev.where(col("event_type") === "error")
          .select(col("event_id").as("incident_id"),
            col("ts_us").as("s_us"), (col("ts_us") + winUs).as("e_us"))
          .hint("shuffle_hash")
        val joined = graft.operators.RangeJoin.binnedIntervalJoin(
          ev.select(col("value"), col("ts_us")), "ts_us", inc,
          "s_us", "e_us", winUs)
        noop(joined.groupBy("incident_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("total_value"))
          .orderBy("incident_id"))
      }),
      "q53branchB" -> (() => {
        val winUs = 600000000L
        val ev = Tables.load(spark, dir, "events")
          .withColumn("ts_us", expr("ts_ns div 1000"))
        val inc = ev.where(col("event_type") === "error")
          .select(col("event_id").as("incident_id"),
            col("ts_us").as("s_us"), (col("ts_us") + winUs).as("e_us"))
          .hint("shuffle_hash")
        val joined = graft.operators.RangeJoin.binnedIntervalJoin(
          ev.select(col("user_id"), col("ts_us")), "ts_us", inc,
          "s_us", "e_us", winUs)
        noop(joined.select("incident_id", "user_id")
          .where(col("user_id").isNotNull).distinct()
          .groupBy("incident_id").agg(count(lit(1)).as("n_users"))
          .orderBy("incident_id"))
      }),
      "q53floor" -> (() => {
        val winUs = 600000000L
        val ev = Tables.load(spark, dir, "events")
          .withColumn("ts_us", expr("ts_ns div 1000"))
        val inc = ev.where(col("event_type") === "error")
          .select(col("event_id").as("incident_id"),
            col("ts_us").as("s_us"), (col("ts_us") + winUs).as("e_us"))
          .withColumn("__bin", explode(sequence(
            floor(col("s_us") / winUs), floor((col("e_us") - 1) / winUs))))
          .repartition(col("__bin"))
        val pts = ev.select(col("user_id"), col("value"), col("ts_us"))
          .withColumn("__bin", floor(col("ts_us") / winUs))
          .repartition(col("__bin"))
        noop(inc.groupBy("incident_id")
          .agg(count(lit(1)).as("n")).orderBy("incident_id"))
        noop(pts.groupBy("__bin")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
          .orderBy("__bin"))
      }),
      "q53single" -> (() => noop(
        graft.queries.AnalyticsQueries.q53Variant(spark, dir, "single"))),
      "q53bcast" -> (() => noop(
        graft.queries.AnalyticsQueries.q53Variant(spark, dir, "bcast"))),
      "q42real" -> q42real, "q42fp" -> q42fp,
      "q42shingle" -> q42shingle, "q42wproj" -> q42wproj,
      "q42cand" -> q42cand, "q42ver" -> q42ver,
      "q42hotsize" -> q42hotsize,
      "q19real" -> q19real, "q19fp" -> q19fp,
      "q19cand" -> q19cand, "q19ver" -> q19ver,
      "q45real" -> q45real,
      "q45twin" -> q45twin,
      "q45bloomBuild" -> q45bloomBuild,
      "q45keptScan" -> q45keptScan,
      "q45maybeAnti" -> q45maybeAnti,
      "q45aggSort" -> q45aggSort,
      "q45rangeAgg" -> q45rangeAgg,
      "q45rangeAggOnly" -> q45rangeAggOnly,
      "q10real" -> q10real,
      "q10bkt32" -> q10bkt(32),
      "q10bkt64" -> q10bkt(64),
      "q10bktJoinFirst64" -> q10bktJoinFirst(64),
      "q23real" -> q23real,
      "q83real" -> (() => noop(graft.queries.LlmQueries
        .queries("q83_inter_video")(spark, dir))),
      "q70real" -> (() => noop(graft.queries.LlmQueries
        .queries("q70_audio_decode")(spark, dir))))
    // pick slots by env (comma-separated), so one compile serves
    // several measurement windows
    val picked = sys.env.getOrElse("SPARK_GRAFT_SLOTS", "q45real")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val slots: Seq[(String, () => Unit)] =
      picked.map(n => n -> allSlots(n))
    val best = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    for (_ <- 1 to 8; (name, f) <- slots) {
      // every rep pays the query's full cost (the Bench discipline);
      // per-corpus artifacts (stop lists) live outside the registry
      graft.operators.CacheRegistry.releaseAll()
      best(name) = math.min(best(name), time(f()))
    }
    println("RESULT " + slots.map { case (n, _) =>
      f"$n=${best(n)}%.3f" }.mkString(" "))
    spark.stop()
  }
}
