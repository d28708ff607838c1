package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** SimHash near-duplicate fingerprinting.
  *
  * 64-bit charikar fingerprint per document, computed in ONE pass over
  * the token-hash array: a running 64-counter vector folded with
  * `aggregate` + `zip_with` (row-local, codegen — no UDF, no shuffle).
  * Near-dup candidates come from band buckets over the fingerprint —
  * `maxHamming + 1` contiguous bit-chunks, so by pigeonhole every pair
  * within the Hamming budget shares ≥1 identical chunk (EXACT recall,
  * not best-effort) — and are verified with `bit_count(a XOR b)`;
  * never an all-pairs scan.
  */
object SimHash {

  val Bits = 64

  /** Portable signed-64 token hash from md5 (first 16 hex chars) —
    * engine-reproducible (DuckDB computes the identical value), for
    * oracle-checked simhash paths; xxhash64 stays the fast default. */
  def md5TokenHash(t: Column): Column = {
    val dec = conv(substring(md5(t), 1, 16), 16, 10).cast("decimal(20,0)")
    when(dec >= lit(BigDecimal("9223372036854775808")),
      (dec - lit(BigDecimal("18446744073709551616"))).cast("long"))
      .otherwise(dec.cast("long"))
  }

  /** 64-bit simhash of the token multiset. Uses the native codegen'd
    * expression when the session has GraftExtensions (bit-equal),
    * else the portable higher-order-function fold. */
  def simhash64(textCol: Column,
      tokenHash: Column => Column = xxhash64(_)): Column = {
    val hashes = transform(TextFunctions.tokens(textCol), t => tokenHash(t))
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
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column = xxhash64(_)): DataFrame =
    docs.select(col(idCol).as("doc"),
      simhash64(col(textCol), tokenHash).as("fp"))

  /** Contiguous chunk boundaries covering 64 bits as evenly as
    * possible: (offset, width) per chunk. */
  private[graft] def chunkSpans(nChunks: Int): Seq[(Int, Int)] = {
    val base = Bits / nChunks
    val extra = Bits % nChunks
    val widths = Seq.tabulate(nChunks)(i => base + (if (i < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** ALL pairs within Hamming distance ≤ maxHamming: fingerprints are
    * cut into `maxHamming + 1` chunks (pigeonhole: ≤ maxHamming
    * differing bits cannot touch every chunk, so any qualifying pair
    * collides on ≥1 bucket — exact recall), candidates joined within
    * (chunk, chunk_val) buckets only, then verified with bit_count. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(maxHamming < Bits, "maxHamming must be < 64")
    val fps = fingerprints(docs, idCol, textCol, tokenHash)
    val spans = chunkSpans(maxHamming + 1)
    val chunked = fps.select(col("doc"), col("fp"),
      explode(array(spans.zipWithIndex.map { case ((off, w), j) =>
        struct(lit(j).as("chunk"),
          (shiftrightunsigned(col("fp"), off).bitwiseAND(lit((1L << w) - 1L)))
            .as("chunk_val"))
      }: _*)).as("cc"))
      .select(col("doc"), col("fp"), col("cc.chunk"), col("cc.chunk_val"))
      .persist() // fingerprints are not recomputed per join side
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      // verify BEFORE dedup: the Hamming filter kills the vast
      // majority of chunk candidates map-side, so the distinct()
      // shuffle carries only qualifying pairs
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
