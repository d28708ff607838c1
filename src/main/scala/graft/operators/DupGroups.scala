package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-group clustering: near-dup PAIRS → connected components →
  * one canonical survivor per component.
  *
  * Near-duplicate relations are not transitive (A≈B and B≈C do not
  * imply A≈C), so pair lists from [[MinHashLSH]]/[[SimHash]]/
  * [[TextDedup]]/[[Ann.cosineNearDupPairs]] are a GRAPH, and "keep one
  * copy per duplicate cluster" — the step every training-corpus dedup
  * ends with — is connected components over that graph. The reference
  * pipeline's dedup is per-key `drop_duplicates`
  * (shopee_orders_loader.py:283-340), which only handles equality;
  * this operator is its transitive-closure generalization.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * published shuffle-native CC algorithm. Each round is two
  * groupBy+join passes over the edge list; the edge multiset converges
  * to disjoint stars centered on each component's minimum id in
  * O(log² n) rounds (2–4 in practice on dedup graphs, whose components
  * are near-cliques with tiny diameter). Per round the frame is
  * persisted and the previous one unpersisted, and lineage is cut with
  * `localCheckpoint` so plan depth stays constant — iterative
  * algorithms otherwise compound Catalyst plans until analysis itself
  * dominates. Nothing ever collects to the driver except the
  * per-round convergence signature (2 longs); no component is ever
  * materialized as one row (a 10⁷-member boilerplate cluster stays
  * distributed), unlike connected components via
  * `collect_set`/GraphX-style message passing with array state.
  */
object DupGroups {

  /** (node, component) for every node incident to `pairs`, where
    * `component` is the minimum node id reachable through the pair
    * graph. Ids must be integral (long-castable). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // canonical undirected edges (hi > lo), self-loops dropped
    def canon(df: DataFrame): DataFrame = df
      .where(col("u") =!= col("v"))
      .select(greatest($"u", $"v").as("hi"), least($"u", $"v").as("lo"))
      .distinct()

    // materialize the (possibly expensive — an LSH/Jaccard pipeline)
    // pair input ONCE before anything branches over it: the node and
    // edge derivations below each read p twice, and without an
    // up-front fill their concurrent branches race the cache and can
    // re-run the whole upstream pipeline.
    val p = pairs.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    val nodes = p.select($"u".as("n")).union(p.select($"v".as("n")))
      .distinct()
      .localCheckpoint(true)

    var edges = canon(p)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // large-star: every node links its LARGER neighbors to the minimum
    // of its closed neighborhood; small-star: every node links its
    // smaller neighbors (and itself) to that minimum. Both strictly
    // shrink the potential Σ depth; alternation converges to stars.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select($"hi".as("u"), $"lo".as("v"))
        .union(e.select($"lo".as("u"), $"hi".as("v")))
      val mins = sym.groupBy("u")
        .agg(least(min($"v"), first($"u")).as("m"))
      // m ≤ u < v, so (v, m) is already canonical (hi > lo); and no
      // distinct here — smallStar's groupBy-min is duplicate-blind and
      // its own canon() dedups the round's output. One fewer exchange
      // per round.
      sym.join(mins, "u").where($"v" > $"u")
        .select($"v".as("hi"), $"m".as("lo"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("hi").agg(min($"lo").as("m"))
      val withM = e.join(mins, "hi")
      canon(
        withM.select($"hi".as("u"), $"m".as("v"))
          .union(withM.select($"lo".as("u"), $"m".as("v"))))
    }

    // order-independent set signature (edges are distinct, so xor is
    // collision-safe to ~2⁻⁶⁴ with the count); equality of consecutive
    // rounds = fixed point (stars are fixed points of both passes)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(hi, lo))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(edges) // doubles as the emptiness check and
    var converged = sig._1 == 0L // pins edges' cache before p releases
    p.unpersist()
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges))
        .localCheckpoint(true) // cut lineage; constant plan depth
      val nextSig = signature(next)
      edges.unpersist()
      edges = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // converged edges are stars (hi = member, lo = component min);
    // nodes absent from any star are their own component
    val out = nodes
      .join(edges.select($"hi".as("n"), $"lo".as("comp")), Seq("n"), "left")
      .select($"n".as("node"), coalesce($"comp", $"n").as("component"))
    edges.unpersist()
    out
  }

  /** Incremental cluster maintenance: fold a batch of NEW pairs into
    * an existing (node, component) assignment, recomputing ONLY the
    * components the batch touches — the daily-growth path (a 100 TB
    * corpus adds a few million pairs a day; re-running CC over the
    * full graph to absorb them is a full-corpus job for a
    * metadata-size change, the same argument as [[Scd2]].applyBatch).
    *
    * The prior assignment's (node → component) rows ARE star edges, so
    * CC over (touched stars ∪ new pairs) reproduces exactly what a
    * full rebuild would say about those components — equivalence with
    * the full rebuild is asserted in DupGroupsSpec. Untouched
    * components pass through a broadcast anti join, never entering a
    * CC round. `pairs` is assumed batch-sized (its node list
    * broadcasts); `prior` can be arbitrarily large. */
  def updateClusters(prior: DataFrame, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 50): DataFrame = {
    val newNodes = pairs.select(col(aCol).cast("long").as("node"))
      .union(pairs.select(col(bCol).cast("long").as("node")))
      .distinct()
    // components adjacent to the batch (absent nodes join nothing —
    // they are new to the graph and surface through the CC below)
    val touchedComps = broadcast(prior
      .join(broadcast(newNodes), "node")
      .select(col("component").as("__tc"))
      .distinct())
    val touched = prior.join(touchedComps,
      prior("component") === touchedComps("__tc"), "left_semi")
    val untouched = prior.join(touchedComps,
      prior("component") === touchedComps("__tc"), "left_anti")
    val rebuilt = connectedComponents(
      touched.select(col("node").as("u"), col("component").as("v"))
        .unionByName(pairs.select(col(aCol).cast("long").as("u"),
          col(bCol).cast("long").as("v"))),
      "u", "v", maxIter)
    untouched.unionByName(rebuilt)
  }

  /** Annotate `docs` with its duplicate cluster and survivor flag:
    * every doc gets `cluster` (the min doc id of its component — its
    * own id when unpaired) and `is_keep` (true for the one canonical
    * survivor per cluster, the min id — deterministic and re-run
    * stable). `docs.filter(is_keep)` IS the deduplicated corpus. */
  def assignClusters(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("node", "__n")
    docs
      .join(cc, docs(idCol) === cc("__n"), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol).cast("long")))
      .withColumn("is_keep", col("cluster") === col(idCol).cast("long"))
      .drop("__n", "component")
  }
}
