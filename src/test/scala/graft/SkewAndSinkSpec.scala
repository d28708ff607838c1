package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.ParquetSink

class SkewAndSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin matches plain join results on a skewed key") {
    // 90% of fact rows share one key — the classic hot-key shape
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = fact.join(dim, "k").agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(fact, dim, "k", factor = 8,
      saltSource = Seq("v")).agg(count(lit(1)), sum("v")).head()
    assert(plain == salted)
  }

  test("saltedSumCount equals direct aggregation") {
    val df = (1 to 500).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, "k", "v", factor = 4, saltSource = Seq("v"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    assert(direct == salted)
  }

  test("hotKeys finds the planted hot key; partialSaltedJoin replicates only it") {
    // 10k rows: key 999 owns ~50%, the rest spread over 100 keys
    val skewed = spark.range(10000).select(
      when(col("id") % 2 === 0, lit(999L)).otherwise(col("id") % 100)
        .as("k"), col("id"))
    val small = spark.range(100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("payload"))
      .unionByName(Seq((999L, "dim_hot")).toDF("k", "payload"))
    val hot = Skew.hotKeys(skewed, "k", rowIdCols = Seq("id"),
        minShare = 0.2, sampleMod = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(hot === Seq(999L), s"expected only 999, got $hot")
    val joined = Skew.partialSaltedJoin(skewed, small, "k",
      factor = 8, saltSource = Seq("id"), hot = hot)
    val plain = skewed.join(small, "k")
    assert(joined.count() === plain.count())
    assert(joined.agg(sum("id")).head().getLong(0) ===
      plain.agg(sum("id")).head().getLong(0))
    // the small side replicates ONLY the hot key: |small| + (factor-1)
    val rep = small.withColumn("__salt",
      explode(when(col("k").isin(hot: _*),
        array((0 until 8).map(lit): _*)).otherwise(array(lit(0)))))
    assert(rep.count() === small.count() + 7)
    // adaptive bypass: an empty hot list degrades to the PLAIN join —
    // same results, and no salt machinery in the plan at all
    val bypass = Skew.partialSaltedJoin(skewed, small, "k",
      factor = 8, saltSource = Seq("id"), hot = Seq.empty)
    assert(bypass.count() === plain.count())
    val bypassPlan = bypass.queryExecution.executedPlan.toString
    assert(!bypassPlan.contains("__salt"),
      s"empty hot list must not salt:\n$bypassPlan")
  }

  test("date-partitioned layout prunes partitions for window filters") {
    val dir = Files.createTempDirectory("graft-sink").toFile.getAbsolutePath
    val events = Tables.load(spark, sf0001, "events")
    ParquetSink.writeDatePartitioned(events.drop("ts_ns"), dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("event_date=")))

    val pruned = spark.read.parquet(dir)
      .where(col("event_date") >= "2024-01-25")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"partition pruning missing:\n$plan")
    val expected = events.where(to_date(col("ts")) >= "2024-01-25").count()
    assert(pruned.count() == expected)
  }

  test("IVF-partitioned layout: a probe reads only its cells (partition pruning)") {
    import graft.operators.Ann
    val dir = Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath
    val emb = Tables.load(spark, sf0001, "embeddings")
    val cents = Ann.trainCentroids(emb, "vec_id", "embedding", k = 4, iters = 1)
    // assign each vector its quantizer cell and lay the corpus out as
    // one directory per cell — the ANN scale path's write side
    val celled = emb.withColumn("__c", Ann.clusterOf(col("embedding"), cents))
    ParquetSink.writeIvfPartitioned(celled, dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("__c=")))
    val probes = Seq(0, 2)
    val pruned = spark.read.parquet(dir).where(col("__c").isin(probes: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__c"),
      s"probe did not prune cells:\n$plan")
    val expected = celled.where(col("__c").isin(probes: _*)).count()
    assert(pruned.count() == expected && expected > 0)
    // the probe touches only the probed cell directories
    val files = pruned.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f => probes.exists(p => f.contains(s"__c=$p"))),
      s"probe read non-probed cells: ${files.mkString(",")}")
  }

  test("key-clustered layout round-trips and keeps files key-ranged") {
    val dir = Files.createTempDirectory("graft-clustered").toFile.getAbsolutePath
    val orders = Tables.load(spark, sf0001, "orders")
    ParquetSink.writeKeyClustered(orders, dir, "o_orderkey", numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // each file's key range should be narrow vs global (sorted within files)
    val withFile = back.select(col("o_orderkey"),
      input_file_name().as("f"))
    val ranges = withFile.groupBy("f")
      .agg((max("o_orderkey") - min("o_orderkey")).as("spread"), count(lit(1)).as("n"))
      .collect()
    assert(ranges.length == 4)
  }

  test("range-clustered layout: disjoint file ranges, band filter touches one file") {
    val rangeDir = Files.createTempDirectory("graft-range").toFile.getAbsolutePath
    val hashDir = Files.createTempDirectory("graft-hash").toFile.getAbsolutePath
    val orders = Tables.load(spark, sf0001, "orders")
    ParquetSink.writeRangeClustered(orders, rangeDir, "o_orderkey", numFiles = 4)
    ParquetSink.writeKeyClustered(orders, hashDir, "o_orderkey", numFiles = 4)
    def fileRanges(dir: String): Array[(Long, Long)] =
      spark.read.parquet(dir)
        .select(col("o_orderkey"), input_file_name().as("f"))
        .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    val ranged = fileRanges(rangeDir)
    assert(ranged.length === 4)
    ranged.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: ${ranged.toSeq}")
      case _ => ()
    }
    // a narrow key band overlaps ONE range file but EVERY hash file
    val (bandLo, bandHi) = (ranged(1)._1, ranged(1)._1 + 10)
    def touched(dir: String): Int =
      fileRanges(dir).count { case (lo, hi) => lo <= bandHi && hi >= bandLo }
    assert(touched(rangeDir) === 1, "range layout must isolate the band")
    assert(touched(hashDir) === 4, "hash layout spreads every band")
    // same rows either way
    assert(spark.read.parquet(rangeDir).count() === orders.count())
  }

  test("compactSmallFiles: file count collapses, data identical, clustering restorable") {
    val dir = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    val orders = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // simulate a month of tiny micro-batch appends: 24 small files
    orders.repartition(24).write.mode("overwrite").parquet(dir)
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (nBefore, nAfter) =
      ParquetSink.compactSmallFiles(spark, dir, targetBytes = bytes / 2)
    assert(nBefore === 24)
    assert(nAfter <= 3, s"expected <=3 files after compaction, got $nAfter")
    val back = spark.read.parquet(dir)
    assert(back.count() === orders.count())
    assert(back.agg(count(lit(1)), sum("o_custkey")).head ===
      orders.agg(count(lit(1)), sum("o_custkey")).head)
    // sorted variant restores per-file key ranges for min/max skipping
    // (target re-derived from the compacted size so >=2 files remain)
    val bytesNow = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (_, nSorted) = ParquetSink.compactSmallFiles(spark, dir,
      targetBytes = math.max(1L, bytesNow / 3), sortCols = Seq("o_orderkey"))
    val ranges = spark.read.parquet(dir)
      .select(col("o_orderkey"), input_file_name().as("f"))
      .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(nSorted >= 2, "need >=2 files to prove disjoint ranges")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping file key ranges: $ranges")
    case _ => ()
    }
  }

  test("z-ordered layout: files skippable on BOTH columns; linear sort on one only") {
    // single deterministic input partition: repartitionByRange samples
    // its boundaries per input partition, so a suite-order-dependent
    // input layout would wobble the file split points (and this spec's
    // skip counts) run to run
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity").coalesce(1)
    val zDir = Files.createTempDirectory("graft-z").toFile.getAbsolutePath
    val linDir = Files.createTempDirectory("graft-lin").toFile.getAbsolutePath
    ParquetSink.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), numFiles = 8)
    // the single-column comparison layout: RANGE-clustered on l_partkey
    // (perfect one-column skipping — the strongest linear baseline)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    // per-file [min,max] of a column — what parquet row-group/file stats
    // expose to the scan; a file is SKIPPABLE for a predicate when its
    // range misses the predicate's interval
    def skippable(dir: String, c: String, lo: Long, hi: Long): Long = {
      val ranges = spark.read.parquet(dir)
        .select(col(c), input_file_name().as("f"))
        .groupBy("f").agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      ranges.where(col("mx") < lo || col("mn") > hi).count()
    }
    val (pLo, pHi) = (1L, 25L)   // narrow l_partkey band (~1/8 of domain)
    val (sLo, sHi) = (1L, 2L)    // narrow l_suppkey band
    // z-order: correctness first — nothing lost
    assert(spark.read.parquet(zDir).count() === li.count())
    // linear-by-partkey: perfect on partkey, useless on suppkey
    assert(skippable(linDir, "l_partkey", pLo, pHi) >= 6)
    assert(skippable(linDir, "l_suppkey", sLo, sHi) === 0)
    // z-order: most files skip on EITHER column
    val zP = skippable(zDir, "l_partkey", pLo, pHi)
    val zS = skippable(zDir, "l_suppkey", sLo, sHi)
    // the curve trades a little single-column locality for locality on
    // BOTH columns: each column alone skips fewer files than a layout
    // sorted on it exclusively, but the one-column layout skips NOTHING
    // on the other column
    assert(zP >= 3, s"z-order skipped only $zP/8 files on l_partkey")
    assert(zS >= 3, s"z-order skipped only $zS/8 files on l_suppkey")
    assert(zP + zS >= 7, s"z-order skipped $zP+$zS of 16 file-predicate pairs")
  }

  test("co-bucketed tables join with zero exchanges") {
    val orders = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    ParquetSink.writeBucketedTable(orders, "bkt_orders", "o_orderkey", 4)
    ParquetSink.writeBucketedTable(li, "bkt_lineitem", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle-join path: at sf0.001 a broadcast would mask
    // the thing under test (bucket-aligned SortMergeJoin)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      // the join key IS the bucket key on both sides: SortMergeJoin with
      // no shuffle at all (the write paid it once)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select("o_orderkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
