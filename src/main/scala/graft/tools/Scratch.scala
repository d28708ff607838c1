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
    import graft.operators.Scd2
    val q44cur = () => noop(
      graft.queries.EcommerceQueries.queries("q44_scd2_history")(spark, dir))
    val q44rng = () => noop {
      val ev = graft.Tables.loadEvents(spark, dir)
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("ts_us"))
        .repartitionByRange(col("user_id"))
      Scd2.fromChangeLog(ev, Seq("user_id"), Seq("event_type"), "ts_us")
        .select(col("user_id"), col("event_type"),
          col("valid_from").as("valid_from_us"),
          col("valid_to").as("valid_to_us"),
          col("version"), col("is_current").cast("string").as("is_current"))
        .sortWithinPartitions("user_id", "valid_from_us")
    }
    var bA = Double.MaxValue
    var bB = Double.MaxValue
    for (_ <- 1 to 8) {
      bA = math.min(bA, time(q44cur()))
      bB = math.min(bB, time(q44rng()))
    }
    println(f"RESULT q44cur=$bA%.3f q44rng=$bB%.3f")
    spark.stop()
  }
}
