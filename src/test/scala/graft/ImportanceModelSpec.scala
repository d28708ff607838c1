package graft

import org.apache.spark.sql.functions._

import graft.operators.ImportanceModel

class ImportanceModelSpec extends SparkTestBase {
  import spark.implicits._

  test("trained weights separate target from raw: en docs outscore non-en on the corpus") {
    val docs = Tables.load(spark, sf0001, "documents")
    val wts = ImportanceModel.train(docs, "text", col("lang") === "en")
    val scored = ImportanceModel.score(docs, "doc_id", "text", wts)
    val means = scored.groupBy(col("lang") === "en")
      .agg(avg(col("score_milli").cast("double")))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target class must outscore raw: $means")
    // weights are centered probabilities: bounded in [-500, 500]
    val (lo, hi) = wts.agg(min("w_milli"), max("w_milli")).as[(Long, Long)].head()
    assert(lo >= -500 && hi <= 500)
  }

  test("unseen grams score zero; scoring is deterministic across runs") {
    val train = Seq((1L, "en", "the cat sat"), (2L, "vi", "con meo ngoi"))
      .toDF("doc_id", "lang", "text")
    val wts = ImportanceModel.train(train, "text", col("lang") === "en")
    // a doc of entirely unseen grams gets exactly 0 (left join + coalesce)
    val unseen = Seq((9L, "zz", "qqqq wwww eeee")).toDF("doc_id", "lang", "text")
    val s9 = ImportanceModel.score(unseen, "doc_id", "text", wts)
      .select("score_milli").head().getLong(0)
    assert(s9 == 0L)
    val a = ImportanceModel.score(train, "doc_id", "text", wts)
      .select("doc_id", "score_milli").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = ImportanceModel.score(train, "doc_id", "text", wts)
      .select("doc_id", "score_milli").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
    // the en doc's own grams are all-target (ct=1, cr=0 → w = 666-500 > 0)
    assert(a.toMap.apply(1L) > 0)
  }

  test("q81 trained gate separates HELD-OUT seeded spam from real docs") {
    val out = graft.queries.LlmQueries.q81TrainedGate(spark, sf0001)
      .select(col("doc_id"), col("is_spam"), col("keep"),
        // held-out = odd ids (the model trained only on even ids)
        (col("doc_id") % 2 =!= 0).as("held_out"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    val spam = out.filter(_._2)
    val good = out.filterNot(_._2)
    assert(spam.nonEmpty && spam.exists(_._4),
      "seed must produce held-out spam twins")
    // every spam twin — including held-out ones the model never saw —
    // is dropped on learned gram weights alone
    assert(spam.forall(!_._3), s"kept spam: ${spam.filter(_._3).take(5).toSeq}")
    // real docs overwhelmingly survive the gate (some tiny/degenerate
    // docs may score 0 — the gate is strict-positive)
    val keptFrac = good.count(_._3).toDouble / good.length
    assert(keptFrac >= 0.9, s"good kept fraction $keptFrac")
  }
}
