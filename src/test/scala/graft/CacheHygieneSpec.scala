package graft

import graft.operators.CacheRegistry

/** Cache lifecycle: the cache-heavy SparkEntry queries must leave ZERO
  * persistent RDDs behind once the caller's action has run and the
  * library's release handle ([[CacheRegistry.releaseAll]]) is invoked —
  * the round-6 leak was exactly these (band buckets, shingle frames,
  * fingerprint buckets, IVF cell frames, and localCheckpoints, which
  * Dataset.unpersist silently fails to release). Delta-based so
  * artifacts other suites legitimately hold (pretrained PQ frames) do
  * not flake the assertion. */
class CacheHygieneSpec extends SparkTestBase {

  private val cacheHeavy = Seq(
    "q18_minhash_pairs",   // band buckets + shingle frame (MinHashLSH)
    "q19_simhash",         // fingerprint bucket frame (SimHash)
    "q20_ngram_jaccard",   // shingle base frame (TextDedup)
    "q26_embed_neardup",   // IVF cell frame (Ann)
    "q42_simhash_idf",     // idf-weighted fingerprint buckets
    "q54_dup_clusters",    // pairs + CC steps (DupGroups)
    "q61_corpus_pipeline", // composed pipeline
    "q66_lsh_artifact",    // artifact read path
    "q74_bpe_merges")      // per-round dict persists + localCheckpoints (Bpe.train)

  for (name <- cacheHeavy) test(s"$name: no persistent RDDs after action + releaseAll") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries(name)(spark, sf0001).count()
    CacheRegistry.releaseAll(blocking = true)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"$name left persistent RDDs ${leaked.mkString(",")} after releaseAll")
  }

  test("connected components cleans up after itself, without releaseAll") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    graft.operators.DupGroups.connectedComponents(pairs, "a", "b").count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"connectedComponents left persistent RDDs ${leaked.mkString(",")}")
  }

  test("freeReliableCheckpoints deletes a CC result's checkpoint files once durable") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val cc = graft.operators.DupGroups.connectedComponents(pairs, "a", "b")
    val files = cc.queryExecution.analyzed.collect {
      case p if p.getClass.getSimpleName == "LogicalRDD" => p
    }.flatMap(p => scala.util.Try(p.getClass.getMethod("rdd").invoke(p)
      .asInstanceOf[org.apache.spark.rdd.RDD[_]]).toOption)
      .flatMap(_.getCheckpointFile)
    assert(files.nonEmpty, "the CC result must be reliably checkpointed")
    def exists(f: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    assert(files.forall(exists))
    CacheRegistry.freeReliableCheckpoints(cc)
    assert(files.forall(f => !exists(f)),
      "checkpoint files must be gone after freeReliableCheckpoints")
  }

  test("releaseAll forces recomputation, not staleness: a released query re-runs correctly") {
    val a = SparkEntry.queries("q20_ngram_jaccard")(spark, sf0001).collect().toSeq
    CacheRegistry.releaseAll()
    val b = SparkEntry.queries("q20_ngram_jaccard")(spark, sf0001).collect().toSeq
    assert(a == b && a.nonEmpty)
    // the hygiene suite itself must not leave the second run's
    // registered frames behind for later suites' delta assertions
    CacheRegistry.releaseAll(blocking = true)
  }
}
