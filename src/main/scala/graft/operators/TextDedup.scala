package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact + n-gram-Jaccard document deduplication.
  *
  * Scale design: exact dedup is one hash shuffle on md5(normalized
  * text). Jaccard pairing is BLOCKED (within a blocking key such as
  * `source`) — pairwise comparison only ever happens inside a block,
  * never as a corpus-wide crossJoin; for unblocked corpora use
  * [[MinHashLSH]], whose bands provide the blocks.
  */
object TextDedup {

  /** Group identical (normalized) texts; keep the smallest id.
    * Returns (text_hash, keep_<id>, n_copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        md5(TextFunctions.normalizeText(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as(s"keep_$idCol"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles (distinct), lowercase-normalized. Shorter
    * texts yield their full token run as a single shingle. */
  def shingles(textCol: org.apache.spark.sql.Column, n: Int = 3): org.apache.spark.sql.Column = {
    val toks = TextFunctions.tokens(textCol)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Distinct 64-bit shingle hashes: native one-pass window mix over
    * token hashes when GraftExtensions is registered, else n-gram
    * strings → xxhash64. Either way one value per distinct positional
    * n-gram (cross-path hash VALUES differ; set cardinalities agree
    * modulo ~2⁻⁶⁴ collisions). */
  def shingleHashes64(textCol: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    if (graft.plans.GraftExtensions.nativeAvailable)
      call_function("shingle_hashes",
        transform(TextFunctions.tokens(textCol), t => xxhash64(t)), lit(n))
    else
      transform(shingles(textCol, n), s => xxhash64(s))

  /** Exact n-gram Jaccard for all pairs INSIDE a blocking key: group
    * postings by (block, shingle), expand each bucket's doc list into
    * ordered pairs inline, count pair occurrences = |A∩B|, then
    * |A∪B| = |A|+|B|−∩. Each doc's shingle-set size is row-local
    * (`size` of the distinct shingle array, computed before the
    * explode) and rides along the postings into the pair counts, so
    * the whole operator is ONE scan and TWO hash shuffles (bucket
    * groupBy + pair groupBy) — no persisted postings, no sizes join;
    * a self-join formulation needs three shuffles and materializes
    * the join rows. Cost is Σ_block Σ_shingle C(bucket,2), never
    * |corpus|². Shingles are carried as 64-bit hashes (collision odds
    * ~|S|²/2⁶⁵ — negligible against the exact-string semantics the
    * oracle computes). */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"), col(blockCol).as("block"),
        shingleHashes64(col(textCol), n).as("shs"))
      .select(col("doc"), col("block"),
        size(col("shs")).cast("long").as("sz"), explode(col("shs")).as("sh"))
    val buckets = sh.groupBy("block", "sh")
      .agg(sort_array(collect_list(struct(col("doc"), col("sz")))).as("ds"))
      .where(size(col("ds")) > 1)
    // ordered pairs (ds[i], ds[j]) for i<j — ds is a plain attribute,
    // so referencing it inside the lambdas is allocation-free
    val pairCombos = flatten(transform(
      sequence(lit(0), size(col("ds")) - 2),
      i => transform(
        slice(col("ds"), i + 2, size(col("ds")) - i - 1),
        d => struct(
          element_at(col("ds"), i + 1).getField("doc").as("doc_a"),
          element_at(col("ds"), i + 1).getField("sz").as("sz_a"),
          d.getField("doc").as("doc_b"),
          d.getField("sz").as("sz_b")))))
    buckets.select(explode(pairCombos).as("p"))
      // length filter (prefix-filtering family): J(A,B) ≥ t forces
      // |A| ≥ t·|B|, so size-incompatible pairs are dropped BEFORE the
      // pair-count shuffle — at corpus scale most cross-length pairs
      // die here for free.
      .where(least(col("p.sz_a"), col("p.sz_b")) >=
        lit(minJaccard) * greatest(col("p.sz_a"), col("p.sz_b")))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.sz_a").as("sz_a"), col("p.sz_b").as("sz_b"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }
}
