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

  /** Exact n-gram Jaccard for all pairs INSIDE a blocking key: explode
    * distinct shingles, join on (block, shingle) to count the
    * intersection (one shuffle on the shingle), then |A∪B| = |A|+|B|−∩.
    * Cost ∝ Σ_block (shingle matches), never |corpus|². */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    // Join on the 64-bit hash of each shingle, not the string: the
    // pair-join is the hot path and long keys shuffle/compare ~2× faster
    // than ~20-char strings (collision odds over a corpus's distinct
    // shingles are ~|S|²/2⁶⁵ — negligible against the exact-string
    // semantics the oracle computes).
    val sh = docs.select(col(idCol).as("doc"), col(blockCol).as("block"),
      explode(transform(shingles(col(textCol), n), s => xxhash64(s))).as("sh"))
      .persist() // reused by the sizes aggregate and both join sides
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.block") === col("b.block") && col("a.sh") === col("b.sh") &&
          col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }
}
