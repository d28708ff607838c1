package graft

import org.apache.spark.sql.functions._
import graft.operators.{MinHashLSH, SimHash, TextDedup}

class MinHashLSHSpec extends SparkTestBase {

  /** The test corpus plants near-dups as `<original text> + " dup"`. */
  private def plantedPairs = {
    val docs = Tables.load(spark, sf001, "documents")
    val dups = docs.where(col("text").endsWith(" dup"))
      .select(col("doc_id").as("dup_id"),
        expr("substring(text, 1, length(text) - 4)").as("orig_text"))
    docs.join(dups, col("text") === col("orig_text"))
      .select(
        least(col("doc_id"), col("dup_id")).as("doc_a"),
        greatest(col("doc_id"), col("dup_id")).as("doc_b"))
  }

  test("banded LSH finds every planted near-dup pair (recall = 1.0)") {
    val docs = Tables.load(spark, sf001, "documents")
    val found = MinHashLSH.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b")
    val planted = plantedPairs
    val missed = planted.except(found).count()
    val nPlanted = planted.count()
    assert(nPlanted >= 20, s"expected planted dups in corpus, got $nPlanted")
    assert(missed == 0, s"LSH missed $missed of $nPlanted planted pairs")
  }

  test("no cartesian product anywhere in the LSH plan") {
    val docs = Tables.load(spark, sf001, "documents")
    val plan = MinHashLSH.nearDupPairs(docs, "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join leaked into plan:\n$plan")
  }

  test("near-dedup drops duplicates but keeps originals") {
    val docs = Tables.load(spark, sf001, "documents")
    val deduped = MinHashLSH.dedup(docs, "doc_id", "text", threshold = 0.5)
    val n = docs.count()
    val planted = plantedPairs.count()
    val kept = deduped.count()
    assert(kept <= n - planted, s"expected ≤ ${n - planted} rows, got $kept")
    // every duplicate cluster keeps at least one representative
    assert(kept >= n - 2 * planted)
  }

  test("dedupCorpus keeps exactly one survivor per duplicate CLUSTER") {
    import spark.implicits._
    // star 1≈5≈4 with 1≉4: both extensions share the core with 5
    // (J = 14/22 ≈ 0.64) but only J = 14/30 ≈ 0.47 with each other —
    // similarity is not transitive, so the pair list alone cannot say
    // the three are one group; the greedy pair dedup keeps {1, 4},
    // the cluster dedup keeps only the component minimum
    val core = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val docs = Seq(
      (1L, core + " alpha beta gamma delta epsilon zeta eta theta"),
      (4L, core + " red orange yellow green blue indigo violet mauve"),
      (5L, core),
      (9L, "completely unrelated text with none of those words present here")
    ).toDF("doc_id", "text")
    val pairs = MinHashLSH.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 5L), (4L, 5L)), s"star links only: $pairs")
    val greedy = MinHashLSH.dedup(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(greedy === Set(1L, 4L, 9L), "greedy over-keeps on the star")
    val kept = MinHashLSH.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 9L), s"one survivor per cluster: got $kept")
  }

  test("simhash: planted near-dups land within small hamming distance") {
    val docs = Tables.load(spark, sf001, "documents")
    val fps = SimHash.fingerprints(docs, "doc_id", "text")
    val planted = plantedPairs
    val withFp = planted
      .join(fps.withColumnRenamed("doc", "doc_a").withColumnRenamed("fp", "fp_a"), "doc_a")
      .join(fps.withColumnRenamed("doc", "doc_b").withColumnRenamed("fp", "fp_b"), "doc_b")
      .select(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("h"))
    val maxH = withFp.agg(max("h")).head().getInt(0)
    assert(maxH <= 10, s"planted near-dup at hamming $maxH — fingerprint too noisy")
  }

  test("simhash combo candidates have EXACT recall vs all-pairs hamming") {
    val docs = Tables.load(spark, sf0001, "documents")
    val fps = SimHash.fingerprints128(docs, "doc_id", "text")
    val ham = bit_count(col("a.fp_hi").bitwiseXOR(col("b.fp_hi"))) +
      bit_count(col("a.fp_lo").bitwiseXOR(col("b.fp_lo")))
    val brute = fps.as("a").join(fps.as("b"), col("a.doc") < col("b.doc"))
      .where(ham <= 8).count()
    // exact recall must hold for EVERY comboSize, not just the default
    for (g <- Seq(1, 2)) {
      val viaBuckets = SimHash.nearDupPairs(docs, "doc_id", "text",
        maxHamming = 8, comboSize = g).count()
      assert(viaBuckets == brute,
        s"comboSize=$g pigeonhole found $viaBuckets pairs, all-pairs truth is $brute")
    }
    // chunk spans must tile all 128 bits exactly
    val spans = SimHash.chunkSpans(10, SimHash.FpBits)
    assert(spans.map(_._2).sum == 128 && spans.head._1 == 0)
    assert(spans.sliding(2).forall { case Seq((o1, w1), (o2, _)) => o2 == o1 + w1 })
  }

  /** Stopword-heavy corpus: every doc opens with the same 12-token
    * boilerplate (10 hot trigrams shared by ALL docs), then 20 unique
    * md5-derived tokens; every 10th doc gets a near-dup (last token
    * changed). The hot trigrams are what used to produce one
    * corpus-sized bucket per boilerplate shingle. */
  private def stopwordCorpus(n: Int) = {
    val boiler = "the quick brown fox jumps over the lazy dog and then some"
    val base = spark.range(n).select(col("id").as("doc_id"),
      lit("s").as("source"),
      concat(lit(boiler + " "),
        concat_ws(" ", transform(sequence(lit(0), lit(19)),
          i => substring(md5(concat(col("id"), lit("_"), i)), 1, 8)))).as("text"))
    val dups = base.where(col("doc_id") % 10 === 0).select(
      (col("doc_id") + n).as("doc_id"), col("source"),
      concat(substring(col("text"), lit(1), length(col("text")) - 8),
        lit("deadbeef")).as("text"))
    base.unionByName(dups)
  }

  test("prefix filtering kills hot-shingle buckets (>=10x) without losing pairs") {
    val docs = stopwordCorpus(300)
    val base = docs.select(col("doc_id").as("doc"), col("source").as("block"),
        TextDedup.shingleHashes64(col("text"), 3).as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
    def pairVolume(postings: org.apache.spark.sql.DataFrame): Long =
      postings.groupBy("block", "sh").agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
        .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")).head().getLong(0)
    val naive = pairVolume(
      base.select(col("doc"), col("block"), explode(col("shs")).as("sh")))
    val filtered = pairVolume(
      TextDedup.prefixIndex(base, minJaccard = 0.5))
    assert(naive >= 10 * filtered,
      s"prefix filter only cut bucket pair volume $naive -> $filtered (<10x)")
    // and the filtered operator still finds every planted near-dup
    val found = TextDedup.blockedJaccardPairs(docs, "doc_id", "text",
      blockCol = "source", n = 3, minJaccard = 0.5).select("doc_a", "doc_b")
    val planted = docs.where(col("doc_id") >= 300)
      .select((col("doc_id") - 300).as("doc_a"), col("doc_id").as("doc_b"))
    val missed = planted.except(found).count()
    assert(missed == 0, s"prefix-filtered Jaccard missed $missed planted pairs")
  }

  test("stop-shingle filter keeps band buckets small; recall survives") {
    // Same stopword corpus: every doc shares 10 hot trigrams. WITHOUT
    // the filter a lucky-small boilerplate hash wins permutations
    // across most docs (measured: a 62-doc bucket at n=300); WITH
    // maxDf=0.5 the hot shingles leave every set before sketching.
    val docs = stopwordCorpus(300)
    val raw = docs.select(col("doc_id").as("doc"),
      MinHashLSH.shingleHashes(col("text")).as("sh"))
    val hot = MinHashLSH.stopShingles(raw, maxDf = 0.5)
    assert(hot.length >= 5 && hot.length <= 60,
      s"expected a small boilerplate stop-set, got ${hot.length}")
    val filtered = raw.select(col("doc"),
      array_except(col("sh"), lit(hot)).as("sh"))
    val unfilteredMax = MinHashLSH.bandBucketsFromHashes(raw)
      .groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    val filteredMax = MinHashLSH.bandBucketsFromHashes(filtered)
      .groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(filteredMax <= 10,
      s"a band bucket holds $filteredMax docs after stop-shingle filtering " +
        s"(unfiltered max: $unfilteredMax)")
    // planted near-dups still found through the q18 path (maxDf = 0.5)
    val found = MinHashLSH.nearDupPairs(docs, "doc_id", "text",
      threshold = 0.5, maxDf = 0.5).select("doc_a", "doc_b")
    val planted = docs.where(col("doc_id") >= 300)
      .select((col("doc_id") - 300).as("doc_a"), col("doc_id").as("doc_b"))
    val missed = planted.except(found).count()
    assert(missed == 0, s"stop-shingle LSH missed $missed planted pairs")
  }

  test("stop-shingle filter decorrelates simhash on a boilerplate corpus") {
    val docs = stopwordCorpus(300)
    val hot = SimHash.stopFeatureHashes(docs, "text", maxDf = 0.5)
    assert(hot.length >= 5 && hot.length <= 30,
      s"expected the ~10 boilerplate shingles, got ${hot.length}")
    def cands(stop: Array[Long]): Long =
      SimHash.chunkCandidates(
          SimHash.fingerprints128(docs, "doc_id", "text", stop = stop),
          maxHamming = 8, comboSize = 2)
        .select("doc_a", "doc_b").distinct().count()
    val without = cands(Array.empty)
    val withStop = cands(hot)
    assert(withStop <= without,
      s"stop filter must not add candidates: $without -> $withStop")
    // boilerplate votes removed -> non-dup fingerprints decorrelate,
    // so bucket collisions shrink toward the planted-dup count
    assert(withStop <= 120,
      s"stop-filtered candidates should be ~planted-dup volume, got $withStop " +
        s"(unfiltered: $without)")
    // docs whose EVERY shingle is stop-filtered are dropped, not
    // emitted as fingerprint (0,0) Hamming-0 pairs of each other
    val boilerOnly = docs.limit(60).select(col("doc_id"),
      lit("the quick brown fox jumps over the lazy dog and then some").as("text"))
    val allHot = SimHash.stopFeatureHashes(boilerOnly, "text", maxDf = 0.5)
    val fps = SimHash.fingerprints128(boilerOnly, "doc_id", "text", stop = allHot)
    assert(fps.count() == 0,
      "all-boilerplate docs must vanish, not collide at hamming 0")
  }

  test("idf-weighted simhash: uniform weights reduce to unweighted; bands decorrelate boilerplate") {
    // weight bands are pure integer comparisons (oracle-replayable)
    assert(SimHash.bandWeight(251, 500) == 1) // df > n/2
    assert(SimHash.bandWeight(250, 500) == 2)
    assert(SimHash.bandWeight(4, 500) == 7)   // df*128 > n, df*64 <= n
    assert(SimHash.bandWeight(3, 500) == 8)   // rare -> DefaultWeight
    // all-default weights == the unweighted fingerprint: positive
    // scaling never flips a vote-sum sign. The hot list is NON-empty
    // uniform here so the WEIGHTED kernel path is what's compared —
    // an empty hot list now short-circuits to the unweighted kernel
    // (r15), which would make this assertion tautological.
    val docs = Tables.load(spark, sf001, "documents")
    val plain = SimHash.fingerprints128(docs, "doc_id", "text")
    val uniform = SimHash.fingerprints128Weighted(docs, "doc_id", "text",
      hot = Array(123456789L -> SimHash.DefaultWeight,
        -42L -> SimHash.DefaultWeight))
    assert(plain.except(uniform).count() == 0 &&
      uniform.except(plain).count() == 0)
    // and the empty-hot short-circuit itself stays bit-identical
    val shortCircuit = SimHash.fingerprints128Weighted(docs, "doc_id",
      "text", hot = Array.empty)
    assert(plain.except(shortCircuit).count() == 0 &&
      shortCircuit.except(plain).count() == 0)

    // boilerplate corpus: the ~10 ubiquitous trigrams drop to weight 1
    // while per-doc content keeps weight 8, so non-dup fingerprints
    // decorrelate and bucket collisions shrink toward planted volume
    val corpus = stopwordCorpus(300)
    val hot = SimHash.idfFeatureWeights(corpus, "text")
    assert(hot.nonEmpty && hot.forall(_._2 < SimHash.DefaultWeight),
      s"expected down-weighted boilerplate, got ${hot.take(5).toSeq}")
    def cands(fps: org.apache.spark.sql.DataFrame): Long =
      SimHash.chunkCandidates(fps, maxHamming = 8, comboSize = 2)
        .select("doc_a", "doc_b").distinct().count()
    val unweighted = cands(SimHash.fingerprints128(corpus, "doc_id", "text"))
    val weighted = cands(
      SimHash.fingerprints128Weighted(corpus, "doc_id", "text", hot))
    assert(weighted <= unweighted,
      s"idf weighting must not add candidates: $unweighted -> $weighted")
    assert(weighted <= 150,
      s"weighted candidates should be ~planted-dup volume, got $weighted " +
        s"(unweighted: $unweighted)")
    // boilerplate-robustness, the semantic the weighting buys: a dup
    // that differs ONLY in the boilerplate (down-weighted features)
    // stays within a tight Hamming budget, while a rare-content edit
    // now moves the fingerprint MORE (by design — similarity is
    // "Hamming over idf-weighted content")
    val boilerEdit = corpus.where(col("doc_id") < 300 && col("doc_id") % 10 === 0)
      .select((col("doc_id") + 600).as("doc_id"), col("source"),
        regexp_replace(col("text"), "quick", "quiet").as("text"))
    val corpus2 = corpus.unionByName(boilerEdit)
    val hot2 = SimHash.idfFeatureWeights(corpus2, "text")
    // measured separation: boiler-edit pairs at weighted Hamming 3–11,
    // random pairs at 51–74 — budget 12 is mid-gap with margin
    val found = SimHash.nearDupPairsWeighted(corpus2, "doc_id", "text",
      maxHamming = 12, comboSize = 2, hot = hot2).select("doc_a", "doc_b")
    val planted = corpus2.where(col("doc_id") >= 600)
      .select((col("doc_id") - 600).as("doc_a"), col("doc_id").as("doc_b"))
    val missed = planted.except(found).count()
    assert(missed == 0, s"weighted simhash missed $missed boiler-edit pairs")
  }

  test("combo-pigeonhole candidate volume grows ~linearly, not quadratically") {
    // Doubling the corpus must not ~quadruple the bucket candidates.
    // Corpus: deterministic docs of 30 md5-derived tokens (distinct
    // across docs, so fingerprints are uniform — the regime the
    // pigeonhole bound targets; see SimHash object doc for the
    // clustered-corpus caveat) + a near-dup planted every 20th doc
    // (one token changed). With comboSize=2 the budget-8 bucket keys
    // are ~25 bits wide, so random birthday collisions stay negligible
    // and candidates track the (linear) planted-dup count.
    def corpus(n: Int) = {
      val base = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(29)),
          i => substring(md5(concat(col("id"), lit("_"), i)), 1, 8))).as("text"))
      val dups = base.where(col("doc_id") % 20 === 0).select(
        (col("doc_id") + n).as("doc_id"),
        concat(substring(col("text"), 1, 30 * 9 - 10), lit("deadbeef")).as("text"))
      base.unionByName(dups)
    }
    def candidates(n: Int): Long =
      SimHash.chunkCandidates(
          SimHash.fingerprints128(corpus(n), "doc_id", "text"),
          maxHamming = 8, comboSize = 2)
        .select("doc_a", "doc_b").distinct().count()
    val c1 = candidates(2000)
    val c2 = candidates(4000)
    assert(c1 >= 50, s"expected planted-dup candidates, got $c1")
    assert(c2 <= 3 * c1 + 50,
      s"candidates grew superlinearly: $c1 -> $c2 when corpus doubled")
  }

  test("simhash edge budgets: maxHamming 0 (exact) and 1 (64-bit chunks)") {
    import spark.implicits._
    val fps = Seq(
      (1L, 0L, 0L),
      (2L, 0L, 0L),              // identical to 1
      (3L, 0L, 1L),              // hamming 1 from 1/2 (lo half)
      (4L, Long.MinValue, 0L),   // hamming 1 from 1/2 (hi sign bit)
      (5L, -1L, -1L)             // far from everything
    ).toDF("doc", "fp_hi", "fp_lo")
    def pairs(mh: Int, g: Int) =
      SimHash.chunkCandidates(fps, mh, g)
        .where(col("hamming") <= mh)
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // budget 0: only the exact-fingerprint pair
    assert(pairs(0, 1) == Set((1L, 2L)))
    // budget 1, comboSize 1 → two 64-bit chunks (the once-rejected
    // width); exact recall over all Hamming-≤1 pairs
    assert(pairs(1, 1) == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
  }
}
