package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** BPE tokenizer induction (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the
  * tokenizer-training step of a training-data pipeline: learn a merge
  * table from corpus statistics, the artifact every downstream token
  * count / shard-packing / budget decision consumes.
  *
  * Scale shape: the CORPUS-sized work is exactly one pass — the word
  * frequency dictionary ([[wordDict]], one shuffle on the word). All
  * training iterations run over that dict, which is VOCABULARY-sized
  * (~10⁷–10⁸ distinct words at 100 TB — executor-resident, never the
  * corpus again). Per round: one map (apply the newest merge to each
  * word's symbol array — a pure Column fold, codegen-eligible) + one
  * partial-aggregated pair count + a 1-row argmax collect (bounded
  * metadata, the stop-list precedent). The symbols frame is persisted
  * per round and the predecessor freed ([[CacheRegistry]] discipline),
  * with a localCheckpoint lineage cut every few rounds so the plan
  * tree stays constant-size (the [[DupGroups]] iteration discipline).
  *
  * Driver-side reference implementations of the same algorithm exist
  * in every tokenizer library; what this gives you is the DISTRIBUTED
  * formulation: nothing corpus-sized ever leaves the executors, and
  * the only driver state is the merge table itself (k rows).
  */
object Bpe {

  /** (word, freq) over the corpus — the form BPE iterates on. The one
    * corpus-sized job: explode tokens, one shuffle on the word. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Split a word into its initial BPE symbols: single characters,
    * with the end-of-word marker "</w>" appended to the last (the
    * paper's formulation — word-final subwords are distinct). The
    * empty-string guard covers split-by-empty-regex edge artifacts
    * across Spark versions. */
  private[graft] def charSymbols(word: Column): Column = {
    val chars = filter(split(word, ""), c => c =!= lit(""))
    transform(chars, (c, i) =>
      when(i === size(chars) - 1, concat(c, lit("</w>"))).otherwise(c))
  }

  /** The dict in symbol form — round-0 training state. */
  def symbolize(dict: DataFrame): DataFrame =
    dict.select(charSymbols(col("word")).as("syms"), col("freq"))

  /** Adjacent symbol pairs of `syms` weighted by nothing (the caller
    * multiplies by word freq): zip the array with its own tail. */
  private def adjacentPairs(syms: Column): Column = {
    val n1 = greatest(size(syms) - 1, lit(0))
    zip_with(slice(syms, lit(1), n1), slice(syms, lit(2), n1),
      (a, b) => struct(a.as("left"), b.as("right")))
  }

  /** Pair-frequency table over a symbolized dict: Σ word-freq per
    * adjacent symbol pair. Partial aggregation (map-side combine)
    * before the one exchange on the pair. */
  def pairCounts(symDict: DataFrame): DataFrame =
    symDict.select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum("freq").as("pair_freq"))

  /** Apply ONE merge (a, b) → a+b to a symbol array, leftmost-first,
    * non-overlapping (the standard greedy semantics: "aaa" under
    * (a,a) → [aa, a]) — a pure Column fold: the accumulator's last
    * element merges with the incoming symbol iff they form the pair
    * and the last element was not itself just produced by this
    * merge... which the fold handles naturally: a merged "ab" no
    * longer equals "a", so overlaps cannot chain. */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** One learned merge: rank (0-based), the pair, the merged symbol,
    * and the pair's frequency when it was chosen. */
  case class Merge(rank: Int, left: String, right: String,
      merged: String, freq: Long)

  /** Learn `k` merges from the corpus: the BPE training loop.
    * ADAPTIVE (r10): the word dict is VOCABULARY-sized — Heaps-law
    * bounded metadata in the centroid/stop-list class, a few million
    * rows even for a 100 TB corpus — so when it fits under
    * `maxLocalVocab` the k rounds run in-memory on the collected dict
    * (identical algorithm, identical (freq desc, left asc, right asc)
    * argmax tiebreak under UTF8String binary order — asserted
    * bit-equal to the distributed loop in BpeSpec), replacing k
    * sequential argmax JOBS with one dict collect. A dict past the
    * bound falls back to [[trainDistributed]], where nothing
    * corpus-sized ever leaves the executors. q74 at sf0.1: 1.29 s →
    * the one wordDict job. */
  def train(docs: DataFrame, textCol: String, k: Int,
      maxLocalVocab: Long = 2000000L): Seq[Merge] = {
    val dict = wordDict(docs, textCol)
    // the count materializes the dict's shuffle; the collect below
    // reuses it (same lineage), so the guard costs no second scan
    if (dict.count() <= maxLocalVocab)
      trainLocal(dict.collect().map(r => (r.getString(0), r.getLong(1))), k)
    else trainDistributed(docs, textCol, k)
  }

  /** In-memory trainer over a collected (word, freq) dict — the SAME
    * algorithm as [[trainDistributed]], symbol for symbol: code-point
    * char split + `</w>`, Σ-freq adjacent pair counts, freq > 1
    * candidate filter, argmax under (freq desc, left asc, right asc)
    * with UTF8String BINARY string order (what the distributed
    * orderBy compares — UTF-16 compareTo diverges on supplementary
    * chars), leftmost non-overlapping merge application. */
  private[graft] def trainLocal(dict: Array[(String, Long)], k: Int): Seq[Merge] = {
    import org.apache.spark.unsafe.types.UTF8String
    var words: Array[(Array[String], Long)] = dict.map { case (w, f) =>
      val cps = w.codePoints().toArray
      val syms = new Array[String](cps.length)
      var i = 0
      while (i < cps.length) {
        syms(i) = new String(Character.toChars(cps(i)))
        i += 1
      }
      if (syms.nonEmpty) syms(syms.length - 1) += "</w>"
      (syms, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < k && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + f)
          i += 1
        }
      }
      def bin(s: String) = UTF8String.fromString(s)
      val top = counts.iterator.filter(_._2 > 1L).reduceOption { (p, q) =>
        val c = java.lang.Long.compare(q._2, p._2) match {
          case 0 => bin(p._1._1).compareTo(bin(q._1._1)) match {
            case 0 => bin(p._1._2).compareTo(bin(q._1._2))
            case x => x
          }
          case x => x // q more frequent → positive → take q
        }
        if (c <= 0) p else q
      }
      top match {
        case None => exhausted = true
        case Some(((a, b), f)) =>
          merges += Merge(rank, a, b, a + b, f)
          words = words.map { case (syms, wf) =>
            (applyMergeLocal(syms, a, b), wf)
          }
          rank += 1
      }
    }
    merges.toSeq
  }

  /** Leftmost non-overlapping single-merge application — the local
    * twin of [[applyMerge]]'s Column fold. */
  private[graft] def applyMergeLocal(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { s =>
      if (out.nonEmpty && out.last == a && s == b)
        out(out.length - 1) = a + b
      else out += s
    }
    out.toArray
  }

  /** The distributed training loop — one argmax job per round; use
    * when the word dict exceeds the local bound. Each
    * round collects exactly ONE row (the argmax pair — deterministic
    * tiebreak on (freq desc, left asc, right asc), so training is
    * re-run stable across partitionings). Returns the merge table —
    * the tokenizer artifact. */
  def trainDistributed(docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    var syms = symbolize(wordDict(docs, textCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE job per round: the round's argmax action is also what
    // materializes the current step's persist (cache fills on first
    // compute), so the PREDECESSOR is freed right after that action
    // instead of paying a dedicated count() job per round.
    var prev: Option[DataFrame] = None
    // localCheckpoint persists live at the RDD level, invisible to
    // Dataset.unpersist (the round-6 leak class) — free the previous
    // step's through the CacheRegistry handle once superseded
    var ckptRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var rank = 0
      var exhausted = false
      while (rank < k && !exhausted) {
        val top = pairCounts(syms)
          .where(col("pair_freq") > 1)
          .orderBy(col("pair_freq").desc, col("left"), col("right"))
          .limit(1).collect()
        // syms is materialized now — its predecessor can go
        prev.foreach(_.unpersist(blocking = false))
        prev = None
        prevCkpt.foreach(_.unpersist(blocking = false))
        prevCkpt = None
        if (top.isEmpty) exhausted = true
        else {
          val r = top(0)
          val (a, b) = (r.getString(0), r.getString(1))
          merges += Merge(rank, a, b, a + b, r.getLong(2))
          val next0 = syms.select(applyMerge(col("syms"), a, b).as("syms"),
            col("freq"))
          // lineage cut every 4 rounds: the fold nests one HOF per
          // round otherwise, and analyzer time grows with the tree
          val cut = (rank + 1) % 4 == 0
          val next = (if (cut) next0.localCheckpoint(eager = false) else next0)
            .persist(StorageLevel.MEMORY_AND_DISK)
          prev = Some(syms)
          if (cut) {
            prevCkpt = ckptRdd
            ckptRdd = CacheRegistry.localCheckpointRdd(next.toDF())
          }
          syms = next
          rank += 1
        }
      }
      merges.toSeq
    } finally {
      prev.foreach(_.unpersist(blocking = false))
      prevCkpt.foreach(_.unpersist(blocking = false))
      syms.unpersist(blocking = false)
      ckptRdd.foreach(_.unpersist(blocking = false))
    }
  }

  /** Tokenize the corpus with a learned merge table: apply the merges
    * in rank order to every word — a corpus-wide MAP-ONLY pass (the
    * merge table is a local constant folded into the expression; no
    * broadcast, no shuffle, no UDF). Returns docs + `n_subwords`, the
    * real token count every budget/packing decision wants. Expression
    * depth is |merges| nested folds — intended for the small
    * high-frequency merge prefixes those decisions need, not a full
    * 50k-merge production vocab (which would compile the merge table
    * into a broadcast map + one mapPartitions, the codec shape). */
  def subwordCount(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    if (graft.plans.GraftExtensions.nativeAvailable)
      docs.withColumn("n_subwords",
        call_function("subword_count", col(textCol),
          lit(merges.map(_.left).toArray),
          lit(merges.map(_.right).toArray)))
    else subwordCountHof(docs, textCol, merges)

  /** Portable Column form (also the native kernel's equivalence oracle
    * in GraftExtensionsSpec). */
  def subwordCountHof(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    docs.withColumn("n_subwords",
      aggregate(
        filter(TextFunctions.tokens(col(textCol)), w => length(w) > 0),
        lit(0L),
        (acc, w) => {
          val merged = merges.foldLeft(charSymbols(w)) {
            (c, m) => applyMerge(c, m.left, m.right)
          }
          acc + size(merged).cast("long")
        }))
}
