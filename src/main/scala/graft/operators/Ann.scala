package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one scan, TakeOrderedAndProject
  * (no global sort materialization); correct, and fine for a single
  * query over any corpus a scan can cover.
  *
  * Scale path: IVF — a coarse quantizer is TRAINED ONCE on a sampled
  * subset ([[trainCentroids]]; never inside a query), persisted as a
  * k×dim matrix, and every query probes only the `nprobe` cells
  * nearest to it. At 100 TB the table is written partitioned/bucketed
  * by cell id (ParquetSink.writeIvfPartitioned), so a probe reads
  * nprobe/k of the corpus via partition pruning; nothing here is a
  * crossJoin. A random-hyperplane LSH variant is included.
  */
object Ann {

  /** Element-wise running (sum, count) over equal-length double arrays —
    * ONE aggregate expression regardless of dimensionality. The
    * alternative (`dim` separate `avg(element_at(vec, i))` aggregates)
    * plans an expression per dimension and overflows the codegen
    * method budget at real embedding widths (768+). Partial buffers
    * merge map-side, so a Lloyd step shuffles k×(dim+1) doubles. */
  private class VecMeanAgg(dim: Int)
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) =
      // ragged (malformed) embeddings are DROPPED, not truncated-to:
      // summing over min-length would let one short row silently shrink
      // a centroid's dimensionality to its own (the buffer's length was
      // fixed by whichever row a partition reduced first)
      if (v == null || v.length != dim) b
      else if (b._2 == 0L) (v.toArray, 1L)
      else {
        val s = b._1
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        (s, b._2 + 1L)
      }
    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
      if (x._2 == 0L) y
      else if (y._2 == 0L) x
      else {
        val s = x._1
        var i = 0
        while (i < dim) { s(i) += y._1(i); i += 1 }
        (s, x._2 + y._2)
      }
    def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0L) Seq.empty[Double]
      else b._1.toSeq.map(_ / b._2.toDouble)
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.product[(Array[Double], Long)]
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Per-row cosine against the single-row `query` frame (broadcast —
    * stays in-plan, no driver collect). */
  def bruteForceTopK(embeddings: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("__qv")))
    embeddings.crossJoin(q)
      .withColumn("cos_sim", VectorFunctions.cosine(col(vecCol), col("__qv")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Batch k-NN join: top-k corpus neighbors for EVERY query row — the
    * realistic retrieval shape (queries arrive as a table, not one
    * vector at a time). Queries broadcast (Q ≪ corpus); each corpus
    * row scores all Q queries MAP-SIDE (native `vec_dot` when
    * registered), so the corpus is scanned exactly once and the
    * |corpus|×Q score matrix is never shuffled: the rank-≤-k filter
    * triggers Spark's WindowGroupLimit rewrite, capping each input
    * partition at Q·k survivor rows before the single query_id
    * exchange. At an IVF layout, pre-filter the corpus to the probed
    * cells per query batch; this is the exact path those candidates
    * feed. */
  def knnJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val rk = row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(desc("cos_sim"), col(idCol)))
    corpus.crossJoin(q)
      .withColumn("cos_sim", VectorFunctions.cosine(col(vecCol), col("__qv")))
      .select(col("query_id"), col(idCol), col("cos_sim"))
      .withColumn("__rk", rk)
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** IVF-pruned batch k-NN join — [[knnJoin]]'s scale path: each query
    * row scores only the corpus cells its own `nprobe` nearest
    * centroids select, not the whole corpus. The (query, probe-cell)
    * pairs — Q·nprobe rows, probe choice computed ROW-LOCALLY from the
    * broadcast centroid matrix — broadcast into an equi join on the
    * cell id, so scan cost is Σ_q (probed cells' rows) ≈
    * (nprobe/k̂)·|corpus| per query wave instead of Q·|corpus|; on an
    * IVF-partitioned layout (ParquetSink.writeIvfPartitioned) the
    * union of probed cells also partition-prunes the read. Same
    * WindowGroupLimit top-k as the exact join.
    *
    * WEAKER CONTRACT than [[knnJoin]]: the probe-cell inner join means
    * a query returns only rows from its probed cells — fewer than k
    * rows (or zero, if every probed cell is empty of corpus vectors)
    * under aggressive pruning, where knnJoin guarantees every query k
    * rows. Per-query recall vs the exact join is measured in AnnSpec;
    * raise `nprobe` (or fall back to knnJoin) when full coverage
    * matters more than scan cost. */
  def ivfKnnJoin(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: Array[Array[Double]],
      nprobe: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    if (cents.isEmpty) return knnJoin(corpus, queries, idCol, vecCol, k)
    val probeArr = slice(sort_array(array(cents.zipWithIndex.map {
      case (c, i) =>
        struct(VectorFunctions.l2sqConst(col(vecCol), c).as("d"),
          lit(i).as("i"))
    }: _*)), 1, math.min(nprobe, cents.length))
    val qProbes = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      explode(transform(probeArr, p => p.getField("i"))).as("__cell")))
    val rk = row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(desc("cos_sim"), col(idCol)))
    corpus.withColumn("__cell", clusterOf(col(vecCol), cents))
      .join(qProbes, "__cell")
      .withColumn("cos_sim", VectorFunctions.cosine(col(vecCol), col("__qv")))
      .select(col("query_id"), col(idCol), col("cos_sim"))
      .withColumn("__rk", rk)
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic hyperplanes from a seed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** nPlanes-bit LSH bucket id for an embedding column (row-local). */
  def bucketId(vecCol: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dotConst(vecCol, p) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Train the IVF coarse quantizer: k centroids, deterministic init
    * (first k sampled vectors by id — a uniform pick under hashed
    * ids), Lloyd refinement over a deterministic hash-sample
    * (`1/sampleMod` of the corpus — quantizer quality needs a sample,
    * never a full scan). Only the k×dim centroid matrix reaches the
    * driver. Train ONCE, persist the matrix, pass it to [[ivfTopK]] /
    * [[cosineNearDupPairs]] — never retrain per query: at 100 TB a
    * per-query Lloyd pass is `iters` extra corpus scans. Returns
    * empty when the (sampled) frame is empty. */
  def trainCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 0, sampleMod: Int = 1): Array[Array[Double]] = {
    val sampled =
      if (sampleMod > 1)
        embeddings.where(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      else embeddings
    val vecs = sampled.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    if (iters <= 0)
      return vecs.orderBy("__id").limit(k)
        .collect().map(_.getSeq[Double](1).toArray)
    val cached = vecs.persist()
    try {
      var cents = cached.orderBy("__id").limit(k)
        .collect().map(_.getSeq[Double](1).toArray)
      if (cents.isEmpty) return Array.empty
      // expected dim = widest init vector (a malformed row is short,
      // not long); Lloyd means then ignore every ragged row
      val vecMean = udaf(new VecMeanAgg(cents.map(_.length).max))
      for (_ <- 0 until iters) {
        val means = cached
          .withColumn("__c", clusterOf(col("__v"), cents))
          .groupBy("__c").agg(vecMean(col("__v")).as("m"))
          .collect()
        val byCluster = means.map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
        cents = cents.indices.map { j =>
          byCluster.get(j).filter(_.nonEmpty) match {
            case Some(m) => m.toArray
            case None => cents(j) // empty cluster keeps its centroid
          }
        }.toArray
      }
      cents
    } finally { cached.unpersist(); () }
  }

  /** Nearest-centroid (distance², index) struct for a vector
    * (row-local argmin over k fold expressions; struct array_min gives
    * lexicographic argmin). */
  def clusterAssign(vecCol: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.l2sqConst(vecCol, c).as("d"), lit(i).as("i"))
    }: _*))

  /** Nearest-centroid index for a vector. */
  def clusterOf(vecCol: Column, cents: Array[Array[Double]]): Column =
    clusterAssign(vecCol, cents).getField("i")

  /** Per-cell statistics of an IVF layout: row count plus mean/max
    * distance²-to-centroid per cell — one aggregate pass, persisted
    * NEXT TO the cell-partitioned table like the centroid matrix.
    * They serve two jobs at scale: [[adaptiveProbes]] sizes each
    * query's probe set from the real cell populations (a fixed nprobe
    * under-probes when the nearest cells are sparse and over-probes
    * when they're huge), and drifting mean-distance/ballooning counts
    * are the retrain signal for the quantizer as the corpus shifts. */
  def cellStats(embeddings: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame =
    embeddings
      .select(clusterAssign(col(vecCol), cents).as("__a"))
      .groupBy(col("__a.i").as("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        avg(col("__a.d")).as("mean_d2"),
        max(col("__a.d")).as("max_d2"))

  /** Probe plan: cells in query-distance order, taking just enough to
    * cover ≥ minCandidates vectors by the persisted counts. Driver-side
    * over k stats rows — metadata scale. Cells absent from `counts`
    * (empty at stats time) count 0 but stay probeable. */
  def adaptiveProbes(queryVec: Array[Double], cents: Array[Array[Double]],
      counts: Map[Int, Long], minCandidates: Long): Seq[Int] = {
    val byDist = cents.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var t = 0
      while (t < math.min(c.length, queryVec.length)) {
        val diff = queryVec(t) - c(t); d += diff * diff; t += 1
      }
      (d, i)
    }.sortBy(identity).map(_._2)
    val cum = byDist.scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    val need = byDist.indices.find(j => cum(j + 1) >= minCandidates)
      .map(_ + 1).getOrElse(byDist.length)
    byDist.take(need).toSeq
  }

  /** IVF top-k over an explicit probe list (from [[adaptiveProbes]]):
    * same one-pass plan as the nprobe overload, cell set fixed by the
    * caller. */
  def ivfTopKProbed(embeddings: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], probes: Seq[Int]): DataFrame = {
    if (centroids.isEmpty || probes.isEmpty)
      return embeddings.select(col(idCol), lit(0.0).as("cos_sim")).limit(0)
    val q = broadcast(query.select(col(vecCol).as("__qv")))
    embeddings
      .withColumn("__c", clusterOf(col(vecCol), centroids))
      .where(col("__c").isin(probes: _*))
      .crossJoin(q)
      .withColumn("cos_sim", VectorFunctions.cosine(col(vecCol), col("__qv")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** IVF ANN over a pretrained quantizer: assign rows to centroids,
    * probe the `nprobe` centroids nearest the query, brute-force
    * cosine only inside those cells — ONE corpus pass, no training
    * jobs in the query path. At 100 TB the table is written bucketed
    * by cluster id, so a probe is a partition-pruned read of
    * nprobe/k of the corpus. */
  def ivfTopK(embeddings: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    if (centroids.isEmpty)
      // degenerate (empty training frame): no cells to probe
      return embeddings.select(col(idCol), lit(0.0).as("cos_sim")).limit(0)
    val probes = slice(array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.l2sqConst(col("__qv"), c).as("d"), lit(i).as("i"))
    }: _*)), 1, nprobe)
    val q = broadcast(query.select(col(vecCol).as("__qv"))
      .withColumn("__probes", transform(probes, s => s.getField("i"))))
    embeddings
      .withColumn("__c", clusterOf(col(vecCol), centroids))
      .crossJoin(q)
      .where(array_contains(col("__probes"), col("__c")))
      .withColumn("cos_sim", VectorFunctions.cosine(col(vecCol), col("__qv")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** IVF top-k over a CELL-PARTITIONED lake layout
    * ([[graft.sources.ParquetSink.writeIvfPartitioned]]): the probe
    * choice for the (driver-held, bounded — one vector) query becomes
    * a LITERAL `isin` on the layout's PARTITION column, so the scan
    * reads ONLY the probed cell directories — PartitionFilters prune
    * at file-listing time, the true nprobe/k read that the in-session
    * [[ivfTopK]] can only approximate with a post-scan filter
    * (plan-audited in PlanAuditSpec). Same probe order (distance, then
    * index) as the row-local variants. */
  def ivfTopKOnLayout(layout: DataFrame, queryVec: Array[Double],
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int,
      cellCol: String = "__c"): DataFrame = {
    require(centroids.nonEmpty, "empty quantizer")
    val probes = centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < c.length && j < queryVec.length) {
        val t = c(j) - queryVec(j); d += t * t; j += 1
      }
      (i, d)
    }.sortBy { case (i, d) => (d, i) }.take(nprobe).map(_._1)
    val qn = math.sqrt(queryVec.map(v => v * v).sum)
    layout.where(col(cellCol).isin(probes: _*))
      .withColumn("cos_sim",
        VectorFunctions.dotConst(col(vecCol), queryVec) /
          (VectorFunctions.norm(col(vecCol)) * lit(qn)))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Convenience form that trains the quantizer inline (tests /
    * exploratory use — production paths pretrain via
    * [[trainCentroids]] and call the pretrained overload). */
  def ivfTopK(embeddings: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nClusters: Int, nprobe: Int, iters: Int): DataFrame =
    ivfTopK(embeddings, query, idCol, vecCol, k,
      trainCentroids(embeddings, idCol, vecCol, nClusters, iters), nprobe)

  /** Embedding-cosine near-duplicate pairs, IVF-cell-blocked: vectors
    * are compared only within their quantizer cell (one shuffle on the
    * cell id), never all-pairs. Recall is bounded by cell assignment —
    * near-identical vectors quantize to the same cell except within
    * ~cell-boundary distance of each other (AnnSpec measures soundness
    * + recall vs brute force). At 100 TB: cells are the partition key
    * (ParquetSink.writeIvfPartitioned), so each cell's pairing is a
    * partition-local join. Pass pretrained `centroids` to keep
    * quantizer training out of the query path (null → deterministic
    * first-k init, no Lloyd scans). */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      nClusters: Int = 16,
      centroids: Array[Array[Double]] = null): DataFrame = {
    val cents =
      if (centroids != null) centroids
      else trainCentroids(embeddings, idCol, vecCol, nClusters)
    if (cents.isEmpty)
      // degenerate (empty corpus / empty training frame): no cells
      return embeddings.select(col(idCol).as("id_a"),
        col(idCol).as("id_b"), lit(0.0).as("cos_sim")).limit(0)
    // Precompute each vector's norm once; the pairwise stage then does
    // only the dot product (≈3× less per-pair work than full cosine).
    val cells = CacheRegistry.persist(embeddings
      .select(col(idCol).as("vid"), col(vecCol).as("vec"))
      .withColumn("__c", clusterOf(col("vec"), cents))
      .withColumn("__n", VectorFunctions.norm(col("vec"))))
    cells.as("a")
      .join(cells.as("b"),
        col("a.__c") === col("b.__c") && col("a.vid") < col("b.vid"))
      .withColumn("cos_sim",
        VectorFunctions.dot(col("a.vec"), col("b.vec")) /
          (col("a.__n") * col("b.__n")))
      .where(col("cos_sim") >= threshold)
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"), col("cos_sim"))
  }

  /** Top-k within LSH buckets ≤ `probe` Hamming bits from the query's
    * bucket. Returns (id, cos_sim) — recall tunable via nPlanes/probe. */
  def lshTopK(embeddings: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 12, probe: Int = 1, seed: Long = 42L,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val q = broadcast(query.select(col(vecCol).as("__qv"))
      .withColumn("__qb", bucketId(col("__qv"), planes)))
    embeddings
      .withColumn("__b", bucketId(col(vecCol), planes))
      .crossJoin(q)
      .where(bit_count(col("__b").bitwiseXOR(col("__qb"))) <= probe)
      .withColumn("cos_sim", VectorFunctions.cosine(col(vecCol), col("__qv")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }
}
