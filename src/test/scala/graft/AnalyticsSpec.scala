package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Sampling, Sessionize, Stats, TextDedup}
import graft.queries.AnalyticsQueries

/** As-of join, sessionization, top-n per group — semantics on
  * hand-built frames plus plan-shape assertions (one shuffle for the
  * merge/window forms; WindowGroupLimit for top-n). */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  test("asOf picks latest right row ≤ left ts; inclusive ties; null when none") {
    val left = Seq(
      (1L, 100L, 10L), // k=1: right rows at 50, 100 → 100 (inclusive)
      (1L, 99L, 11L),  // k=1 at 99 → 50
      (2L, 10L, 12L),  // k=2: right only at 20 → null
      (3L, 10L, 13L)   // k=3: no right rows → null
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 50L, 20L), (1L, 100L, 21L), (1L, 100L, 22L), // tie at 100: max rid wins
      (2L, 20L, 23L)
    ).toDF("k", "ts", "rid")
    val out = AsOfJoin.asOf(left, col("ts"), col("lid"),
        right, col("ts"), col("rid"), "k")
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(10L) === Some(22L)) // inclusive + max-seq tie-break
    assert(out(11L) === Some(20L))
    assert(out(12L) === None)
    assert(out(13L) === None)
  }

  test("asOf plan: one hash exchange, no join operator") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 50L, 20L)).toDF("k", "ts", "rid")
    val plan = AsOfJoin.asOf(left, col("ts"), col("lid"),
      right, col("ts"), col("rid"), "k")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }

  test("sessionize: gap boundary is inclusive; ordinal per key") {
    val ev = Seq(
      (1L, 0L, 1L), (1L, 1800L, 2L),  // diff = gap → same session
      (1L, 3601L, 3L),                // diff = gap+1 → new session
      (2L, 5L, 4L)
    ).toDF("user_id", "ts_us", "event_id")
    val out = Sessionize.withSessionId(ev, "user_id", col("ts_us"),
        col("event_id"), gap = 1800L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 1, "≤gap must stay in session")
    assert(out(3L) == 2, ">gap must open a new session")
    assert(out(4L) == 1, "sessions are per-key ordinals")
  }

  test("sessionize plan: lag + running sum share one exchange+sort") {
    val ev = Seq((1L, 0L, 1L)).toDF("user_id", "ts_us", "event_id")
    val plan = Sessionize.withSessionId(ev, "user_id", col("ts_us"),
      col("event_id"), 1800L).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("topNPerGroup keeps n rows per group and plans WindowGroupLimit") {
    val df = (1 to 100).map(i => (i % 4, i)).toDF("g", "v")
    val top = Stats.topNPerGroup(df, Seq("g"), Seq(desc("v")), 3)
    assert(top.groupBy("g").count().where(col("count") =!= 3).count() == 0)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter should push as WindowGroupLimit:\n$plan")
  }

  test("q30 rollup emits leaf + subtotal + grand-total levels") {
    val out = AnalyticsQueries.q30Rollup(spark, sf0001)
    val rows = out.collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val sub = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaf = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1 && sub.nonEmpty && leaf.nonEmpty)
    assert(grand.head.getLong(2) == leaf.map(_.getLong(2)).sum,
      "grand total must equal the sum of leaf counts")
  }

  test("q31 pivot: fixed columns, row sums match unpivoted totals") {
    val out = AnalyticsQueries.q31Pivot(spark, sf0001)
    assert(out.columns.toSeq ==
      Seq("d", "click", "error", "purchase", "signup", "view"))
    val pivotTotal = out.select(
      (coalesce(col("click"), lit(0.0)) + coalesce(col("error"), lit(0.0)) +
        coalesce(col("purchase"), lit(0.0)) + coalesce(col("signup"), lit(0.0)) +
        coalesce(col("view"), lit(0.0))).as("s"))
      .agg(sum("s")).head().getDouble(0)
    val direct = Tables.load(spark, sf0001, "events")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6)
  }

  test("exact percentile vs approx_percentile sketch stays within bound") {
    val ev = Tables.load(spark, sf0001, "events")
    val both = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.95)").as("exact"),
      expr("approx_percentile(value, 0.95, 1000)").as("approx"))
    val maxRelErr = both
      .select(max(abs(col("exact") - col("approx")) / col("exact")))
      .head().getDouble(0)
    assert(maxRelErr < 0.05,
      s"approx_percentile drifted $maxRelErr from exact — sketch misconfigured")
  }

  test("q32 value-count pre-agg is bit-identical to the direct percentile") {
    // the weighted percentile over (group, value, freq) must build the
    // SAME counts map the direct form builds row-by-row — any drift
    // here means the pre-agg rewrite changed semantics. Both shapes
    // forced explicitly (the public entry tier-switches on row count).
    val pre = AnalyticsQueries.q32PercentilePreAgg(spark, sf001).collect()
    val direct = AnalyticsQueries.q32PercentileDirect(spark, sf001).collect()
    assert(pre.toSeq == direct.toSeq)
  }

  test("approxBatchStats: HLL sketch within rsd bound of exact distinct") {
    val ev = Tables.load(spark, sf001, "events")
    val approx = graft.operators.Stats.approxBatchStats(ev)
      .select("batch_date", "approx_users")
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val exact = graft.operators.Stats.batchStats(ev)
      .select("batch_date", "n_users")
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    exact.foreach { case (d, n) =>
      val a = approx(d)
      assert(math.abs(a - n).toDouble / n < 0.10,
        s"$d: approx $a vs exact $n exceeds 10% (rsd 2.3%, ~4σ)")
    }
  }

  test("parseJsonWithQuarantine flags malformed rows, parses the rest") {
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, """{"k": 5}"""),
      (2L, """<"k": 5}"""), // malformed
      (3L, """{"k": "not-a-long"}""") // schema-corrupt
    ).toDF("id", "js")
    val out = graft.operators.Normalize.parseJsonWithQuarantine(
        df, "js", StructType(Seq(StructField("k", LongType))))
      .select(col("id"), col("parsed.k"), col("is_quarantined"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), r.getBoolean(2))).toMap
    assert(out(1L) == (Some(5L), false))
    assert(out(2L) == (None, true))
    assert(out(3L) == (None, true))
  }

  test("hashSplit: deterministic, complete, ~80/10/10") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf001, "documents")
    val a = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "split must be deterministic")
    val n = a.values.sum
    assert(n == docs.count(), "every row lands in exactly one split")
    assert(math.abs(a("train").toDouble / n - 0.8) < 0.05, s"train share ${a("train")}/$n")
    assert(math.abs(a("val").toDouble / n - 0.1) < 0.04)
    assert(math.abs(a("test").toDouble / n - 0.1) < 0.04)
    // percentages hold under a non-default bucket count (cut points
    // scale with buckets; they are NOT raw bucket indices)
    val c = Sampling.hashSplit(docs, "doc_id", buckets = 200)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(c("train").toDouble / n - 0.8) < 0.05,
      s"train share with buckets=200: ${c("train")}/$n")
  }

  test("capPerGroup: exact quota per group, deterministic, WindowGroupLimit") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val capped = Sampling.capPerGroup(docs, Seq("source"), "doc_id", 7)
    val perGroup = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(perGroup(src) === math.min(n, 7L), s"source $src")
    }
    // re-run keeps the SAME rows (md5 discipline, not rand)
    val a = capped.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.capPerGroup(docs, Seq("source"), "doc_id", 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"quota must pre-prune per partition:\n$plan")
  }

  test("packByBudget: every doc in one shard, shards fill to ~budget, stable") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("n_tokens",
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
    val packed = Sampling.packByBudget(docs, Seq("source"), "doc_id",
      "n_tokens", budget = 500L)
    assert(packed.count() === docs.count()) // nothing dropped
    val shards = packed.groupBy("source", "shard")
      .agg(sum("n_tokens").as("tok")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // packing invariant: the cumulative token total through every
    // NON-final shard has crossed that shard's budget boundary —
    // shard sh only closes once a doc starts at/past (sh+1)·budget
    shards.groupBy(_._1).foreach { case (src, rs) =>
      val totals = rs.sortBy(_._2).map(_._3)
      val last = rs.map(_._2).max
      // shard ids contiguous from 0
      assert(rs.map(_._2).toSet === (0L to last).toSet, s"gaps in $src shards")
      totals.scanLeft(0L)(_ + _).tail.zipWithIndex.dropRight(1)
        .foreach { case (cum, sh) =>
          assert(cum >= (sh + 1) * 500L,
            s"shard $src/$sh closed before its boundary: cumulative $cum")
        }
    }
    // deterministic under repartition
    val repacked = Sampling.packByBudget(docs.repartition(13), Seq("source"),
        "doc_id", "n_tokens", 500L)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    packed.select("doc_id", "shard").collect()
      .foreach(r => assert(repacked(r.getLong(0)) === r.getLong(1)))
    // the distributed prefix-sum form (the public packByBudget path)
    // assigns the IDENTICAL shard to every doc as the one-window form
    // (bucket-major md5 order == plain md5 order), at every prefix
    // width including one that splits this corpus finely
    val windowed = Sampling.packByBudgetWindowed(docs, Seq("source"),
        "doc_id", "n_tokens", 500L)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 2, 3).foreach { pl =>
      val bucketed = Sampling.packByBudgetBucketed(docs, Seq("source"),
          "doc_id", "n_tokens", 500L, prefixLen = pl)
      assert(bucketed.columns.sorted === packed.columns.sorted,
        s"prefixLen=$pl leaked helper columns")
      bucketed.select("doc_id", "shard").collect()
        .foreach(r => assert(windowed(r.getLong(0)) === r.getLong(1),
          s"prefixLen=$pl shard mismatch for doc ${r.getLong(0)}"))
    }
  }

  test("decontaminate: planted leaks flagged, clean docs zero, bench broadcasts") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // = bench doc
      (2L, "alpha beta gamma delta iota kappa lambda mu"),   // 2 shared shingles
      (3L, "nu xi omicron pi rho sigma tau upsilon"),        // clean
      (4L, "unrelated words entirely different from others here now")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("bid", "btext")
    val out = TextDedup.decontaminate(corpus, "doc_id", "text",
        bench, "btext", n = 3, minOverlap = 2)
      .select("doc_id", "n_overlap", "is_contaminated")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) === ((6L, true)))  // all 6 shingles shared
    assert(out(2L) === ((2L, true)))  // prefix shingles shared
    assert(out(3L) === ((0L, false)))
    assert(out(4L) === ((0L, false)))
    val plan = TextDedup.decontaminate(corpus, "doc_id", "text",
      bench, "btext", 3, 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench shingles must broadcast:\n$plan")
  }

  test("stratifiedSample: per-stratum rates honor fractions, seeded-deterministic") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf001, "documents")
    val fractions = Map("web" -> 0.5, "wiki" -> 1.0, "books" -> 0.0)
    val present = docs.select("source").distinct().collect().map(_.getString(0)).toSet
    val s1 = Sampling.stratifiedSample(docs, "source", "doc_id", fractions)
    val s2 = Sampling.stratifiedSample(docs, "source", "doc_id", fractions)
    assert(s1.collect().map(_.getLong(0)).toSet == s2.collect().map(_.getLong(0)).toSet)
    val counts = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.filter(f => present(f._1)).foreach { case (src, f) =>
      val kept = counts.getOrElse(src, 0L).toDouble / totals(src)
      assert(math.abs(kept - f) < 0.12, s"$src kept $kept, wanted $f")
    }
  }

  test("sketch artifacts: merged per-batch HLL == direct global sketch, drift bounded") {
    import graft.operators.Stats
    val ev = Tables.load(spark, sf001, "events")
    // merge-invariance: union of per-day sketches gives IDENTICAL
    // estimates to one sketch over all data — pre-batching loses nothing
    val merged = Stats.mergeSketches(
        Stats.sketchArtifacts(ev, "event_type", "user_id"), Seq("event_type"))
      .select("event_type", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("approx_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    // drift vs exact distinct counts stays within HLL's lgK=12 bounds
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(merged(k) - ex).toDouble / ex < 0.05,
        s"$k: sketch ${merged(k)} vs exact $ex")
    }
    // the q88 portable twin (oracled gate) computes the same rollup
    // from per-batch distinct-set artifacts: its n_distinct_users IS
    // the exact value above, and its n_events matches q46's — the
    // sketch gate's numbers are transitively oracled through it
    val twin = graft.queries.AnalyticsQueries
      .q88SketchMergePortable(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val q46 = graft.queries.AnalyticsQueries.q46SketchMerge(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twin.view.mapValues(_._2).toMap === exact)
    assert(twin.view.mapValues(_._1).toMap === q46)
  }

  test("theta retention: estimates equal exact counts in exact mode") {
    import graft.operators.Stats
    val ev = Tables.load(spark, sf001, "events")
      .select(to_date(col("ts")).as("d"), col("event_type"), col("user_id"))
    val est = graft.queries.AnalyticsQueries.q49Retention(spark, sf001)
      .collect()
      .map(r => (r.getString(1), r.getString(0)) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
         if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    // exact truth: distinct users per (type, day) and day-over-day sets
    val days = ev.select("event_type", "d", "user_id").distinct()
      .collect().groupBy(r => (r.getString(0), r.getDate(1).toString))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    days.foreach { case ((typ, day), users) =>
      val (active, retained, fresh) = est((typ, day))
      assert(active === users.size.toLong, s"$typ $day active")
      val prevDay = java.time.LocalDate.parse(day).minusDays(1).toString
      days.get((typ, prevDay)).foreach { prev =>
        assert(retained === users.intersect(prev).size.toLong, s"$typ $day retained")
        assert(fresh === users.diff(prev).size.toLong, s"$typ $day new")
      }
    }
  }

  test("q87 portable twin ≡ q49 theta retention row-for-row (exact mode)") {
    // theta sketches below 2^lgK are exact, so the set-algebra twin
    // must reproduce the sketch path bit-for-bit — this is what lets
    // the oracled q87 gate stand in for the engine-specific q49
    val sk = graft.queries.AnalyticsQueries.q49Retention(spark, sf001)
      .collect().toSeq
    val tw = graft.queries.AnalyticsQueries
      .q87RetentionPortable(spark, sf001).collect().toSeq
    assert(sk.map(_.toSeq) == tw.map(_.toSeq),
      s"sketch vs twin drift: ${sk.take(2)} vs ${tw.take(2)}")
  }

  test("chunkDedup: first occurrence of a repeated span survives, later copies drop, unique text intact") {
    val banner = "b01 b02 b03 b04 b05 b06 b07 b08 b09 b10" // exactly one 10-token chunk
    val docs = Seq(
      (1L, s"$banner u11 u12 u13 u14 u15 u16 u17 u18 u19 u20"),
      (2L, s"$banner v11 v12 v13 v14"),   // banner repeats; own tail unique
      (3L, "w01 w02 w03"),                 // untouched
      (4L, banner)                         // ONLY the banner → empties out
    ).toDF("doc_id", "text")
    val out = TextDedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 is the banner's first occurrence — fully intact
    assert(out(1L) === ((s"$banner u11 u12 u13 u14 u15 u16 u17 u18 u19 u20", 2L, 2L)))
    // doc 2 loses the banner chunk, keeps its own tail, order preserved
    assert(out(2L) === (("v11 v12 v13 v14", 1L, 2L)))
    // untouched doc round-trips
    assert(out(3L) === (("w01 w02 w03", 1L, 1L)))
    // fully-duplicated doc comes back empty but present (audit row)
    assert(out(4L) === (("", 0L, 1L)))
    // global invariant: kept chunks = distinct chunks in the corpus
    // (banner, doc-1 tail, doc-2 tail, doc-3 text)
    val keptTotal = TextDedup.chunkDedup(docs, "doc_id", "text", 10)
      .agg(sum("n_chunks_kept")).head().getLong(0)
    assert(keptTotal === 4L)
  }

  test("substringDedup removes the shifted banner chunkDedup structurally misses") {
    val banner = "b01 b02 b03 b04 b05 b06 b07 b08 b09 b10"
    // the SAME 10-token banner at alignments 0, 3, 7 — fixed 10-token
    // chunk boundaries slice it differently in every doc, so chunk
    // dedup sees three distinct chunk sets and removes NOTHING shared
    val docs = Seq(
      (1L, s"$banner a11 a12 a13 a14 a15 a16 a17"),
      (2L, s"c01 c02 c03 $banner c14 c15 c16 c17"),
      (3L, s"d01 d02 d03 d04 d05 d06 d07 $banner")
    ).toDF("doc_id", "text")
    val chunked = TextDedup.chunkDedup(docs, "doc_id", "text", 10)
      .agg(sum("n_chunks_kept"), sum("n_chunks_total")).head()
    assert(chunked.getLong(0) == chunked.getLong(1),
      "fixed boundaries must miss every shifted copy (nothing removed)")
    val out = TextDedup.substringDedup(docs, "doc_id", "text", spanTokens = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // first occurrence keeps the banner; shifted copies lose EXACTLY
    // its 10 tokens — surrounding text intact, any alignment
    assert(out(1L) === ((s"$banner a11 a12 a13 a14 a15 a16 a17", 17L, 17L)))
    assert(out(2L) === (("c01 c02 c03 c14 c15 c16 c17", 7L, 17L)))
    assert(out(3L) === (("d01 d02 d03 d04 d05 d06 d07", 7L, 17L)))
    // intra-document self-repetition: the second copy inside ONE doc
    // is covered too (windows spanning both copies are unique, so
    // exactly the second copy's run goes)
    val selfRep = Seq((9L, s"$banner x01 $banner")).toDF("doc_id", "text")
    val sr = TextDedup.substringDedup(selfRep, "doc_id", "text", 10)
      .head()
    assert(sr.getString(1) == s"$banner x01" && sr.getLong(2) == 11L)
    // short docs (< span) carry no windows and pass through whole
    val short = TextDedup.substringDedup(
      Seq((5L, "s01 s02 s03")).toDF("doc_id", "text"), "doc_id", "text", 10)
      .head()
    assert(short.getString(1) == "s01 s02 s03" && short.getLong(3) == 3L)
  }

  test("temperatureMix: per-stratum targets follow n^alpha, capped, deterministic") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val mixed = Sampling.temperatureMix(docs, "lang", "doc_id",
      alpha = 0.5, totalTarget = 200L)
    val got = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = n.values.map(v => math.sqrt(v.toDouble)).sum
    n.foreach { case (lang, cnt) =>
      val k = math.min(cnt, math.round(200 * math.sqrt(cnt.toDouble) / z))
      assert(got(lang) === k, s"lang $lang")
    }
    // alpha damps the head: en's share shrinks vs its natural share
    val natural = n("en").toDouble / n.values.sum
    assert(got("en").toDouble / got.values.sum < natural)
    // alpha = 1 reproduces the natural mix (rounded)
    val nat = Sampling.temperatureMix(docs, "lang", "doc_id", 1.0, 200L)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (lang, cnt) =>
      assert(nat(lang) === math.min(cnt, math.round(200.0 * cnt / n.values.sum)), s"alpha=1 $lang")
    }
    // re-run keeps the SAME rows (md5 discipline)
    val a = mixed.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.temperatureMix(docs, "lang", "doc_id", 0.5, 200L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
    // the literal max-target cap pre-prunes via WindowGroupLimit
    val plan = mixed.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"mixture rank must pre-prune per partition:\n$plan")
  }

  test("temperatureMix edges: null strata are dropped explicitly, empty input returns empty") {
    import spark.implicits._
    val withNull = Seq((1L, "en"), (2L, "en"), (3L, null), (4L, "vi"))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureMix(withNull, "lang", "doc_id", 0.5, 10L)
    // no NPE on the driver, and the null-stratum row is excluded (it
    // could never survive the decision-table equi-join anyway)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    val empty = Sampling.temperatureMix(
      withNull.where($"doc_id" < 0), "lang", "doc_id", 0.5, 10L)
    assert(empty.isEmpty && empty.columns.toSeq == withNull.columns.toSeq)
  }

  test("q27/q28/q29 run green at sf0.001") {
    assert(AnalyticsQueries.q27Sessionize(spark, sf0001).count() > 0)
    val asof = AnalyticsQueries.q28AsofJoin(spark, sf0001)
    assert(asof.count() > 0)
    // attribution sanity: every matched view precedes-or-equals its purchase
    assert(asof.where(col("gap_sec") < 0).count() == 0)
    val topn = AnalyticsQueries.q29TopnPerGroup(spark, sf0001)
    assert(topn.count() > 0 && topn.where(col("rnk") > 3).count() == 0)
  }
}
