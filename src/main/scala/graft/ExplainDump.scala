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
    val dir = "/root/testdata/sf0.001"
    val named = args.toSet
    Seq(
      "q10_star_join" -> (() => graft.queries.EcommerceQueries.q10StarJoin(spark, dir)),
      "q09_incremental_agg" -> (() => graft.queries.EcommerceQueries.q09IncrementalAgg(spark, dir)),
      "q28_asof_join" -> (() => graft.queries.AnalyticsQueries.q28AsofJoin(spark, dir)),
      "q27_sessionize" -> (() => graft.queries.AnalyticsQueries.q27Sessionize(spark, dir)),
      "q29_topn_per_group" -> (() => graft.queries.AnalyticsQueries.q29TopnPerGroup(spark, dir)),
      "q26_embed_neardup" -> (() => graft.queries.LlmQueries.q26EmbedNearDup(spark, dir))
    ).filter { case (name, _) => named.isEmpty || named(name) }
      .foreach { case (name, mk) =>
        println(s"==== $name")
        mk().explain("formatted")
      }
    spark.stop()
  }
}
