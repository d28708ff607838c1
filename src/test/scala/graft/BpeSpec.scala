package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent in-memory reference BPE (Sennrich et al. 2016):
    * word-freq dict → iterate (count pairs, merge argmax). Written
    * against plain Scala collections — shares no code with the
    * distributed operator. */
  private def referenceTrain(texts: Seq[String], k: Int): Seq[Bpe.Merge] = {
    def toWords(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val dict = scala.collection.mutable.Map.empty[List[String], Long]
    texts.flatMap(toWords).foreach { w =>
      val syms = w.toList.map(_.toString) match {
        case init :+ last => init :+ (last + "</w>")
        case Nil => Nil
      }
      dict(syms) = dict.getOrElse(syms, 0L) + 1
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val eligible = counts.filter(_._2 > 1)
      if (eligible.isEmpty) done = true
      else {
        val ((a, b), f) = eligible.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        merges += Bpe.Merge(rank, a, b, a + b, f)
        val merged = dict.toSeq.map { case (syms, fr) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          syms.foreach { s =>
            if (out.nonEmpty && out.last == a && s == b) {
              out.remove(out.length - 1); out += (a + b)
            } else out += s
          }
          (out.toList, fr)
        }
        dict.clear()
        merged.foreach { case (s, fr) =>
          dict(s) = dict.getOrElse(s, 0L) + fr
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  test("charSymbols and applyMerge: greedy leftmost non-overlapping semantics") {
    val df = Seq("aaa", "abab", "the").toDF("word")
      .select(Bpe.charSymbols(col("word")).as("syms"))
    val syms = df.collect().map(_.getSeq[String](0))
    assert(syms(0) == Seq("a", "a", "a</w>"))
    assert(syms(2) == Seq("t", "h", "e</w>"))
    // (a,a) on "aaaa": leftmost pairs merge, no overlap chaining
    val m = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a"))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(m(0) == Seq("aa", "aa"))
    assert(m(1) == Seq("aa", "a"))
  }

  test("train matches the independent in-memory reference bit-for-bit") {
    val texts = Seq(
      "the cat sat on the mat", "the hat and the rat", "a cat and a bat",
      "then there is the thin thing", "in an inner inn", "banana bandana",
      "the the the", "ratatat at the mat")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 10)
    val want = referenceTrain(texts, 10)
    assert(got == want,
      s"merge tables differ:\n  spark: $got\n  ref:   $want")
    assert(got.nonEmpty && got.map(_.rank) == got.indices)
  }

  test("adaptive local trainer ≡ distributed loop bit-for-bit (corpus + forced fallback)") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val local = Bpe.train(docs, "text", 6) // vocab ≪ bound → local path
    val dist = Bpe.trainDistributed(docs, "text", 6)
    assert(local == dist, s"local/distributed merge tables differ:\n  $local\n  $dist")
    // forcing the bound to 0 exercises the fallback dispatch
    assert(Bpe.train(docs, "text", 6, maxLocalVocab = 0L) == dist)
  }

  test("subwordCount: merges in rank order, counts match a hand replay") {
    val docs = Seq((1L, "the then aaa"), (2L, ""), (3L, "in rather"))
      .toDF("doc_id", "text")
    val merges = Seq(
      Bpe.Merge(0, "t", "h", "th", 0),
      Bpe.Merge(1, "th", "e</w>", "the</w>", 0),
      Bpe.Merge(2, "a", "a", "aa", 0))
    val out = Bpe.subwordCount(docs, "text", merges)
      .select("doc_id", "n_subwords").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the → [the</w>] = 1; then → [th,e,n</w>] = 3; aaa → [aa,a</w>] = 2
    assert(out(1L) == 1 + 3 + 2)
    assert(out(2L) == 0)
    // in → [i,n</w>] = 2; rather → [r,a,th,e,r</w>] = 5
    assert(out(3L) == 2 + 5)
  }

  test("q74 trains 8 merges at sf0.001; training leaves no persisted blocks") {
    // start from a released state: earlier suites' registered caches
    // can re-materialize into this window via Catalyst cache
    // substitution and would pollute the delta below
    graft.operators.CacheRegistry.releaseAll(blocking = true)
    spark.catalog.clearCache()
    val before0 = spark.sparkContext.getPersistentRDDs.keySet
    val df = graft.queries.LlmQueries.q74BpeMerges(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 8))
    // freq at merge time is non-increasing is NOT guaranteed across
    // rounds (a merge can create a new high-freq pair), but every
    // chosen pair had freq > 1
    assert(rows.forall(_.getLong(4) > 1))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before0
    assert(leaked.isEmpty,
      s"train must release its per-round persists, leaked: $leaked")
  }
}
