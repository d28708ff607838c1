package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, Incremental}

class BloomPruneSpec extends SparkTestBase {

  private def customer: DataFrame =
    Tables.load(spark, sf0001, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")

  private def delta: DataFrame =
    customer.where(col("c_custkey") % 10 === 0)
      .withColumn("c_mktsegment", lit("REFRESH"))
      .withColumn("c_acctbal", lit(0.0))

  test("bloom has no false negatives over the delta key set") {
    val bloom = BloomPrune.keyBloom(delta, Seq("c_custkey"), 1000L, 0.01)
    val misses = delta
      .where(!BloomPrune.mightContainKeys(bloom, Seq(col("c_custkey"))))
      .count()
    assert(misses === 0)
  }

  test("bloom pruning leaves ~fpp of non-matching base rows") {
    val bloom = BloomPrune.keyBloom(delta, Seq("c_custkey"), 1000L, 0.01)
    val base = customer
    val passing = base
      .where(BloomPrune.mightContainKeys(bloom, Seq(col("c_custkey"))))
      .count()
    val trueMatches = delta.count()
    val n = base.count()
    assert(passing >= trueMatches)
    // 1% fpp with slack: pruned-in rows ≤ matches + 5% of the rest
    assert(passing <= trueMatches + math.ceil(0.05 * (n - trueMatches)).toLong,
      s"bloom passed $passing of $n rows for $trueMatches true matches")
  }

  test("prunedDeleteInsert equals the broadcast deleteInsert exactly (both regimes)") {
    val plain = Incremental.deleteInsert(customer, delta, Seq("c_custkey"))
      .orderBy("c_custkey").collect().toSeq
    // broadcast regime (small expectedItems → exact anti join)
    val viaBroadcast = BloomPrune
      .prunedDeleteInsert(customer, delta, Seq("c_custkey"), 1000L, 0.01)
      .orderBy("c_custkey").collect().toSeq
    assert(viaBroadcast === plain)
    // split regime, reached both directly and through the adaptive
    // entry with an expectedItems estimate past the threshold
    val viaSplit = BloomPrune
      .splitDeleteInsert(customer, delta, Seq("c_custkey"), 1000L, 0.01)
      .orderBy("c_custkey").collect().toSeq
    assert(viaSplit === plain)
    // 10⁶ expected keys × 24 B/key estimate ≈ 24 MB > the 10 MB
    // broadcast threshold → the adaptive entry must route to the
    // split (the bloom itself is still only ~1.2 MB)
    val viaAdaptiveSplit = BloomPrune
      .prunedDeleteInsert(customer, delta, Seq("c_custkey"),
        expectedItems = 1000000L, fpp = 0.01)
      .orderBy("c_custkey").collect().toSeq
    assert(viaAdaptiveSplit === plain)
  }

  test("prunedSemiJoin equals the plain left_semi join exactly") {
    val orders = Tables.load(spark, sf0001, "orders")
    val small = orders.where(col("o_orderkey") % 7 === 0)
    val li = Tables.load(spark, sf0001, "lineitem")
    val plain = li
      .join(small.select("o_orderkey").distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val pruned = BloomPrune
      .prunedSemiJoin(li.withColumnRenamed("l_orderkey", "o_orderkey"), small,
        Seq("o_orderkey"), 2000L, 0.01)
      .orderBy("o_orderkey", "l_linenumber").collect().toSeq
    assert(pruned.size === plain.size)
  }

  test("composite keys combine through one xxhash64 probe") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val d = li.where(col("l_orderkey") % 13 === 0)
      .withColumn("l_quantity", lit(0.0))
    val keys = Seq("l_orderkey", "l_linenumber")
    val plain = Incremental.deleteInsert(li, d, keys)
      .groupBy().agg(count(lit(1)), sum("l_quantity")).collect().toSeq
    val pruned = BloomPrune.prunedDeleteInsert(li, d, keys, 10000L, 0.01)
      .groupBy().agg(count(lit(1)), sum("l_quantity")).collect().toSeq
    assert(pruned === plain)
  }
}
