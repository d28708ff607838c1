package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenCount: empty → 0, whitespace collapsed") {
    val df = Seq("", "  ", "one", "a  b\t c").toDF("t")
      .select(TextFunctions.tokenCount(col("t")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 1, 3))
  }

  test("punctRatio counts ASCII punctuation only") {
    val df = Seq(("a,b!c", 2.0 / 5.0), ("abc", 0.0), ("!!", 1.0))
      .toDF("t", "expected")
    val bad = df.select(TextFunctions.punctRatio(col("t")).as("r"), col("expected"))
      .where(abs(col("r") - col("expected")) > 1e-12).count()
    assert(bad == 0)
  }

  test("stopwordRatio and langId heuristic") {
    val en = Seq("the cat sat on the mat and it was good").toDF("t")
    assert(en.select(TextFunctions.langId(col("t"))).head().getString(0) == "en")
    val de = Seq("zwölf größere Häuser über straße").toDF("t")
    assert(de.select(TextFunctions.langId(col("t"))).head().getString(0) == "de")
  }

  test("qualityScore stays in [0,1] on the corpus") {
    val docs = Tables.load(spark, sf001, "documents")
    val outOfRange = docs
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .where(col("q") < 0 || col("q") > 1).count()
    assert(outOfRange == 0)
  }

  test("fingerprint: deterministic, order-sensitive, single-token = token hash") {
    val df = Seq("alpha beta gamma", "beta alpha gamma", "alpha beta gamma", "solo")
      .toDF("t").select(TextFunctions.fingerprint(col("t")).as("f"))
    val f = df.collect().map(_.getLong(0))
    assert(f(0) == f(2), "same text must hash equal")
    assert(f(0) != f(1), "token order must matter")
    val solo = Seq("solo").toDF("t")
      .select(TextFunctions.tokenHashMd5(col("t")).as("h")).head().getLong(0)
    assert(f(3) == solo, "single-token fingerprint is the token hash")
  }
}
