package graft

import org.apache.spark.sql.functions._
import graft.functions.SafeCasts

class SafeCastsSpec extends SparkTestBase {
  import spark.implicits._

  test("safeInt: null on unparseable, value on parseable") {
    val df = Seq("12", "Brand#13", "", "-5", "12.7", null)
      .toDF("s").select(SafeCasts.safeInt(col("s")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(12L), None, None, Some(-5L), None, None))
  }

  test("safeFloat: null on unparseable") {
    val df = Seq("1.5", "x", "-2e3").toDF("s")
      .select(SafeCasts.safeFloat(col("s")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.5), None, Some(-2000.0)))
  }

  test("safeBool: python-style string truthiness, null stays null") {
    val df = Seq("true", "1", "YES", "on", "false", "0", "banana", null)
      .toDF("s").select(SafeCasts.safeBool(col("s")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(true), Some(true), Some(true), Some(true),
        Some(false), Some(false), Some(false), None))
  }

  test("safeString truncates to max length") {
    val df = Seq("abcdefghij").toDF("s")
      .select(SafeCasts.safeString(col("s"), 4).as("v"))
    assert(df.head().getString(0) == "abcd")
  }

  test("unix ts: 0 and null → null; seconds and millis agree") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (0L, 0L), (null, null), (86400L, 86400000L))
      .toDF("s", "ms")
      .select(
        date_format(SafeCasts.unixSecondsToTs(col("s")), "yyyy-MM-dd HH:mm:ss").as("a"),
        date_format(SafeCasts.unixMillisToTs(col("ms")), "yyyy-MM-dd HH:mm:ss").as("b"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getString(0) == "1970-01-02 00:00:00")
    assert(rows(2).getString(0) == rows(2).getString(1))
  }
}
