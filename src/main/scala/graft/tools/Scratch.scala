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
    val a = () => noop(
      graft.queries.EcommerceQueries.q06SafeCasts(spark, dir))
    val b = () => noop {
      val p = graft.Tables.load(spark, dir, "part")
      val boolStr = when(col("p_size") % 4 === 0, lit("TRUE"))
        .when(col("p_size") % 4 === 1, lit("yes"))
        .when(col("p_size") % 4 === 2, lit("off"))
        .otherwise(lit("1"))
      p.select(
          col("p_partkey"),
          graft.functions.SafeCasts.safeInt(
            regexp_extract(col("p_brand"), "([0-9]+)", 1)).as("brand_num"),
          graft.functions.SafeCasts.safeBool(boolStr).as("flag"),
          graft.functions.SafeCasts.safeString(col("p_name"), 12).as("name_trunc"))
        .orderBy("p_partkey")
    }
    var bA = Double.MaxValue
    var bB = Double.MaxValue
    for (_ <- 1 to 8) {
      bA = math.min(bA, time(a()))
      bB = math.min(bB, time(b()))
    }
    println(f"RESULT a=$bA%.3f b=$bB%.3f")
    spark.stop()
  }
}
