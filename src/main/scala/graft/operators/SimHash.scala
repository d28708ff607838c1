package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** SimHash near-duplicate fingerprinting.
  *
  * 64-bit charikar fingerprint per document, computed in ONE pass over
  * the token-hash array: a running 64-counter vector folded with
  * `aggregate` + `zip_with` (row-local, codegen — no UDF, no shuffle).
  * Near-dup candidates come from band buckets over the fingerprint
  * (4 × 16-bit chunks: Hamming distance ≤3 guarantees ≥1 identical
  * chunk by pigeonhole) and are verified with `bit_count(a XOR b)` —
  * never an all-pairs scan.
  */
object SimHash {

  val Bits = 64

  /** 64-bit simhash of the token multiset. Uses the native codegen'd
    * expression when the session has GraftExtensions (bit-equal),
    * else the portable higher-order-function fold. */
  def simhash64(textCol: Column): Column = {
    val hashes = transform(TextFunctions.tokens(textCol), t => xxhash64(t))
    if (graft.plans.GraftExtensions.nativeAvailable)
      call_function("simhash64", hashes)
    else simhash64Hof(hashes)
  }

  /** Portable fold form (also the equivalence oracle for the native
    * expression in GraftExtensionsSpec). */
  def simhash64Hof(hashes: Column): Column = {
    val bitIdx = sequence(lit(0), lit(Bits - 1))
    // counters[b] += tokenHash bit b ? +1 : −1, one fold over tokens
    val counters = aggregate(hashes,
      array_repeat(lit(0L), Bits),
      (acc, h) => zip_with(acc, bitIdx,
        (a, b) => a + call_function("getbit", h, b).cast("long") * lit(2L) - lit(1L)))
    // fingerprint = Σ 2^b over positive counters; 1L<<63 wraps to
    // Long.MinValue, whose bit pattern IS bit 63 (sum stays in range).
    val powers = array((0 until Bits).map(b => lit(1L << b)): _*)
    aggregate(
      zip_with(counters, powers, (cnt, p) => when(cnt > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** (doc, fingerprint) per row. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), simhash64(col(textCol)).as("fp"))

  /** Candidate pairs whose fingerprints agree on ≥1 16-bit chunk,
    * verified to Hamming distance ≤ maxHamming. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol)
    val chunked = fps.select(col("doc"), col("fp"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk"),
          (shiftrightunsigned(col("fp"), j * 16).bitwiseAND(lit(0xFFFFL)))
            .as("chunk_val"))): _*)).as("cc"))
      .select(col("doc"), col("fp"), col("cc.chunk"), col("cc.chunk_val"))
      .persist() // fingerprints are not recomputed per join side
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
