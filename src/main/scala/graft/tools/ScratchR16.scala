package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SafeCasts
import graft.operators.Incremental

/** Round-16 measurement scratchpad (dev tool): quantifies the
  * trailing-global-sort cost — guide §2.4's "orderBy used only to make
  * output deterministic" — for the floor-class queries, on three plan
  * shapes: map-only mid-size (q07/q14), map-only small (q06), and
  * tiny-aggregate (q09/q32). Variants: global orderBy (registered
  * form) vs sortWithinPartitions vs no sort. Result SET is identical
  * in all three (the driver's gate sorts rows before hashing;
  * q34/q44/q79 already pass with partition-local order). min-of-N
  * with the noop sink; per-variant Spark job counts from a listener. */
object ScratchR16 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    def best(f: => Unit): (Double, Double) = {
      jobs = 0
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      (t, jobs / reps.toDouble)
    }

    def t(name: String): DataFrame = graft.Tables.load(spark, dir, name)

    // q07 core (map-only, 15 000 rows at sf0.1)
    def q07core: DataFrame = {
      val o = t("orders")
      val sec = when(col("o_orderkey") % 10 === 0, lit(0L))
        .otherwise(col("o_orderkey") * 7919L)
      o.select(col("o_orderkey"),
        date_format(SafeCasts.unixSecondsToTs(sec), "yyyy-MM-dd HH:mm:ss")
          .as("ts_from_sec"),
        date_format(SafeCasts.unixMillisToTs(sec * 1000L),
          "yyyy-MM-dd HH:mm:ss").as("ts_from_ms"))
    }
    // q14 core (map-only with literal null column, 15 000 rows)
    def q14core: DataFrame =
      Incremental.schemaProject(t("orders"),
          targetCols = Seq("o_orderkey", "o_orderdate", "o_totalprice",
            "column_only_in_target"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"))
    // q09 core (scan-filter + groupBy, 5 rows out)
    def q09core: DataFrame =
      Incremental.windowFilter(t("events"), "ts", "2024-01-20 00:00:00")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
    // q32 direct core (percentile agg, 6 rows out)
    def q32core: DataFrame =
      t("events").groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))

    val cases: Seq[(String, () => DataFrame, Seq[String])] = Seq(
      ("q07_unix_ts", () => q07core, Seq("o_orderkey")),
      ("q14_schema_project", () => q14core, Seq("o_orderkey")),
      ("q09_incremental_agg", () => q09core, Seq("event_type")),
      ("q32_percentile", () => q32core, Seq("event_type")))

    // q05: multiplicity window BEFORE the join (shuffle 3 narrow item
    // cols) vs the current form (shuffle the 6-col joined rows).
    {
      import org.apache.spark.sql.expressions.Window
      def q05now = graft.queries.EcommerceQueries
        .queries("q05_flatten_prefix")(spark, dir)
      def q05pre = {
        val o = t("orders").select(col("o_orderkey").as("order_o_orderkey"),
          col("o_orderstatus").as("order_o_orderstatus"))
        val i0 = t("lineitem").select(col("l_orderkey").as("item_l_orderkey"),
          col("l_linenumber").as("item_l_linenumber"),
          col("l_quantity").as("item_l_quantity"))
        val w = Window.partitionBy(col("item_l_orderkey"))
        val i = i0.withColumn("total_items_in_order",
          count(col("item_l_orderkey")).over(w).cast("bigint"))
        o.join(i, col("order_o_orderkey") === col("item_l_orderkey"), "left")
          .withColumn("total_items_in_order",
            coalesce(col("total_items_in_order"), lit(0L)))
          .withColumn("has_multiple_items", col("total_items_in_order") > 1)
          .select(col("order_o_orderkey").as("order_key"),
            col("order_o_orderstatus").as("order_status"),
            col("item_l_linenumber").as("item_linenumber"),
            col("item_l_quantity").as("item_quantity"),
            col("total_items_in_order"), col("has_multiple_items"))
          .sortWithinPartitions("order_key", "item_linenumber")
      }
      noop(q05now); noop(q05pre)
      val (tN, jN) = best(noop(q05now))
      val (tP, jP) = best(noop(q05pre))
      println(f"RESULT q05 now=$tN%6.3f (j=$jN%.1f)  preWindow=$tP%6.3f (j=$jP%.1f)")
      // row-set equality check
      val a = q05now.collect().map(_.toString).sorted
      val b = q05pre.collect().map(_.toString).sorted
      println(s"RESULT q05 rowset_equal=${a.sameElements(b)} n=${a.length}")
    }

    cases.foreach { case (name, core, keys) =>
      val ordered = () => core().orderBy(keys.map(col): _*)
      val local = () => core().sortWithinPartitions(keys.map(col): _*)
      val none = () => core()
      // warm all three plans
      noop(ordered()); noop(local()); noop(none())
      val (tO, jO) = best(noop(ordered()))
      val (tL, jL) = best(noop(local()))
      val (tN, jN) = best(noop(none()))
      println(f"RESULT $name%-20s orderBy=$tO%6.3f (j=$jO%.1f)  " +
        f"localSort=$tL%6.3f (j=$jL%.1f)  none=$tN%6.3f (j=$jN%.1f)  " +
        f"sortTax=${tO - tL}%+6.3f")
    }
    spark.stop()
  }
}
