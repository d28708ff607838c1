package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: print formatted physical plans for the headline queries
  * (the SURVEY appendix source). Run:
  *   sbt "runMain graft.ExplainDump"  (tools/ copy; move under src to run)
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq(
      "q10_star_join" -> graft.queries.EcommerceQueries.q10StarJoin(spark, "/root/testdata/sf0.001"),
      "q09_incremental_agg" -> graft.queries.EcommerceQueries.q09IncrementalAgg(spark, "/root/testdata/sf0.001")
    ).foreach { case (name, df) =>
      println(s"==== $name")
      df.explain("formatted")
    }
    spark.stop()
  }
}
