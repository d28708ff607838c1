package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc measurement scratchpad (dev tool, not library surface):
  * compares a query against a floor twin or a candidate rewrite under
  * min-of-N timing with the noop sink (never count() — the Bench
  * materialization rule). Edit the closures, `sbt "runMain
  * graft.tools.Scratch"`, read the RESULT line. Findings worth keeping
  * move into scaladocs/BASELINE.md (e.g. the r10 q60 floor-twin
  * decomposition, the q45 local-delta rejection, the javax.sound
  * registry-contention measurement). */
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // current experiment slots — swap in the queries under study
    def q10variant(hint: String): Unit = noop {
      val li = graft.Tables.load(spark, dir, "lineitem")
      val o0 = graft.Tables.load(spark, dir, "orders")
      val o = if (hint.isEmpty) o0 else o0.hint(hint)
      val c = broadcast(graft.Tables.load(spark, dir, "customer"))
      val n = broadcast(graft.Tables.load(spark, dir, "nation"))
      val r = broadcast(graft.Tables.load(spark, dir, "region"))
      val liAgg = li.groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("l_returnflag"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "l_returnflag")
    }
    var bA = Double.MaxValue
    var bB = Double.MaxValue
    for (_ <- 1 to 8) {
      bA = math.min(bA, time(q10variant("")))
      bB = math.min(bB, time(q10variant("shuffle_hash")))
    }
    println(f"RESULT smj=$bA%.3f shj=$bB%.3f")
    spark.stop()
  }
}
