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

  test("repetition metrics: looped text scores high, varied text low") {
    val df = Seq(
      "spam spam spam spam spam spam",            // pure loop
      "buy now click here buy now click here",    // looped 4-gram
      "each word appears exactly once here today", // no repetition
      ""                                          // empty
    ).toDF("t").select(
      TextFunctions.dupTokenFraction(col("t")).as("dup"),
      TextFunctions.topNgramFraction(col("t"), 2).as("t2"))
    val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows(0)._1 > 0.8 && rows(0)._2 === 1.0) // "spam spam" is every 2-gram
    assert(rows(1)._1 === 0.5 && rows(1)._2 > 0.2) // each 2-gram ~twice
    assert(rows(2)._1 === 0.0 && rows(2)._2 < 0.2)
    assert(rows(3) === ((0.0, 0.0)))
  }

  test("classifierScoreMilli: deterministic linear score over hashed uni+bigrams") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha", "solo")
      .toDF("t").select(TextFunctions.classifierScoreMilli(col("t")).as("s"))
    val s = df.collect().map(_.getLong(0))
    assert(s(0) == s(1), "same text must score equal")
    assert(s(0) != s(2), "bigram features make word order matter")
    // manual replay for "solo": one unigram, no bigrams
    def w(g: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bkt = java.lang.Long.parseLong(md5.take(8), 16) % 65536L
      bkt * 2654435761L % 2147483648L % 2001L - 1000L
    }
    assert(s(3) == w("solo"))
    // manual replay for the 3-token doc: 3 unigrams + 2 bigrams
    val expect = Seq("alpha", "beta", "gamma", "alpha_beta", "beta_gamma")
      .map(w).sum
    assert(s(0) == expect)
    // score range sanity: |score| <= 1000 * n_grams
    assert(math.abs(s(0)) <= 5000)
  }

  test("redactPii scrubs emails and IPv4s, leaves clean text alone") {
    val df = Seq(
      "reach me at jo.doe+x@sub.example.org or 10.0.200.25 thanks",
      "no pii in this sentence at all",
      "not an ip 1234.5.6.7890 and not an email a@b"
    ).toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
    val r = df.collect().map(_.getString(0))
    assert(r(0) === "reach me at <EMAIL> or <IP> thanks")
    assert(r(1) === "no pii in this sentence at all")
    // word-boundary + TLD guards: neither pattern fires
    assert(r(2) === "not an ip 1234.5.6.7890 and not an email a@b")
  }
}
