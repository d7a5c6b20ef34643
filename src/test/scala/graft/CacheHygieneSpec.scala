package graft

/** Session-lifetime cache hygiene: every operator that materializes an
  * intermediate (via eager localCheckpoint — the only sanctioned caching
  * primitive; raw `persist()` without a same-scope unpersist is banned)
  * must leave ZERO persisted RDD blocks behind once its result has been
  * consumed and dropped. The checkpoint blocks are reclaimed by Spark's
  * ContextCleaner when the plan becomes unreachable, so the assertion
  * is: run query → drop references → force GC → the cleaner drains
  * `sparkContext.getPersistentRDDs` to empty.
  *
  * The query list covers every materialization site in the codebase:
  * Dedup (shingle set, band table, posting lists, simhash signatures,
  * centrality edges/rounds), Graph (CC edge list + per-round labels),
  * Curation (cumBefore token relation, DSIR doc-bucket relation), Knn
  * (semantic-dedup assignment), TextAnalysis (LM bigram occurrences).
  */
class CacheHygieneSpec extends SparkSuite {

  private val coveredQueries = Seq(
    "dedup_minhash_lsh",  // Dedup: sh + bands
    "dedup_ngram_jaccard",// Dedup: postings
    "dedup_simhash",      // Dedup: simhashCore signatures
    "dedup_clusters",     // Graph: und0 persist + per-round checkpoints
    "dedup_centrality",   // Dedup: pairs/deg/undDeg/rank checkpoints + Graph
    "dedup_semantic",     // Knn: Lloyd assignment
    "dsir_select",        // Curation: (doc, bucket) relation
    "doc_lm_score",       // TextAnalysis: bigram occurrences
    "sequence_pack",      // Curation: cumBefore token relation
    "domain_mixture",     // Curation via docLmScore's bigram checkpoint
    "embedding_pca",      // Knn: moment relation + per-round checkpoints
    "term_pmi",           // TextAnalysis: pmiModel bigram-type relation
    "doc_pmi_score",      // TextAnalysis: same model checkpoint, scoring join
    "quality_drift",      // TextAnalysis: (source, ppl) hist + diffs
    "dedup_graph_stats",  // Dedup: thresholded edge list
    "dedup_incremental",  // Dedup: corpus-side shingle checkpoint
    "rfm_segments",       // EventWindows: per-user metric relation
    "bloom_semi_join"     // DataOps: key set
  )

  private def drainPersistentRdds(timeoutMs: Long = 30000): Int = {
    val sc = spark.sparkContext
    val deadline = System.currentTimeMillis() + timeoutMs
    var n = sc.getPersistentRDDs.size
    while (n > 0 && System.currentTimeMillis() < deadline) {
      System.gc()
      Thread.sleep(250)
      n = sc.getPersistentRDDs.size
    }
    n
  }

  test("no persisted RDDs survive a query's lifetime (ContextCleaner drains checkpoints)") {
    spark.catalog.clearCache()
    // the BPE chain memo and the dedup cluster-chain memo are the two
    // sanctioned session-lifetime caches — drop them so the clean-session
    // precondition below sees only leaks
    graft.pipeline.TextAnalysis.clearBpeMemo()
    graft.pipeline.Dedup.clearClusterMemo()
    assert(drainPersistentRdds() == 0,
      "session not clean before test — another spec leaked cached blocks")
    coveredQueries.foreach { name =>
      // consume the result inside a scope so the plan (and its checkpoint
      // RDDs) become unreachable as soon as the count returns
      def run(): Long = SparkEntry.queries(name)(spark, sf()).count()
      val rows = run()
      assert(rows >= 0)
      // the cluster-family queries intentionally pin the memoized pair +
      // component checkpoints — clear the memo so the drain below verifies
      // everything ELSE (bands, per-round CC labels, PR rounds) is garbage
      graft.pipeline.Dedup.clearClusterMemo()
      val left = drainPersistentRdds()
      assert(left == 0,
        s"$name left $left persisted RDD(s) after its result was dropped: " +
          spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", "))
    }
  }

  test("cluster family shares ONE pair build + ONE comp build; clear drains it") {
    import graft.pipeline.Dedup
    Dedup.clearClusterMemo()
    assert(drainPersistentRdds() == 0)
    val pb = Dedup.clusterPairBuilds.get()
    val cb = Dedup.clusterCompBuilds.get()
    // pairs-only consumer first: builds pairs, must NOT build components
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf()).collect()
    assert(Dedup.clusterPairBuilds.get() == pb + 1)
    assert(Dedup.clusterCompBuilds.get() == cb, "pairs-only query built components")
    C.reclaimBlocks(spark) // the harness reclaim must NOT evict the memo
    // comp consumer upgrades the entry in place (no pair rebuild)
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf()).collect()
    assert(clusters.nonEmpty && lsh.nonEmpty)
    assert(Dedup.clusterPairBuilds.get() == pb + 1,
      "dedup_clusters rebuilt the pair relation instead of reusing the memo")
    assert(Dedup.clusterCompBuilds.get() == cb + 1)
    C.reclaimBlocks(spark)
    // the rest of the family is fully memo-served, results hash-stable
    val keepBest = SparkEntry.queries("dedup_keep_best")(spark, sf()).collect()
    val centrality = SparkEntry.queries("dedup_centrality")(spark, sf()).collect()
    val clusters2 = SparkEntry.queries("dedup_clusters")(spark, sf()).collect()
    assert(keepBest.nonEmpty && centrality.nonEmpty)
    assert(clusters2.toSeq == clusters.toSeq)
    assert(Dedup.clusterPairBuilds.get() == pb + 1)
    assert(Dedup.clusterCompBuilds.get() == cb + 1)
    // memo lifecycle: protected ids are persisted, clear drains to zero
    assert(Dedup.clusterMemoProtectedRddIds(spark).nonEmpty)
    Dedup.clearClusterMemo()
    assert(Dedup.clusterMemoProtectedRddIds(spark).isEmpty)
    assert(drainPersistentRdds() == 0,
      "clearClusterMemo left persisted RDD blocks behind")
  }

  test("bpe_train and bpe_encode share ONE chain build; clearBpeMemo drains it") {
    import graft.pipeline.TextAnalysis
    TextAnalysis.clearBpeMemo()
    assert(drainPersistentRdds() == 0)
    val before = TextAnalysis.bpeChainBuilds.get()
    val train = SparkEntry.queries("bpe_train")(spark, sf()).collect()
    C.reclaimBlocks(spark) // the harness reclaim must NOT evict the memo
    val encode = SparkEntry.queries("bpe_encode")(spark, sf()).collect()
    assert(train.nonEmpty && encode.nonEmpty)
    assert(TextAnalysis.bpeChainBuilds.get() == before + 1,
      "second bpe query rebuilt the chain instead of reusing the memo")
    // second run of either is also served from the memo, hash-unchanged
    val train2 = SparkEntry.queries("bpe_train")(spark, sf()).collect()
    assert(train2.toSeq == train.toSeq)
    assert(TextAnalysis.bpeChainBuilds.get() == before + 1)
    // memo lifecycle: protected ids are persisted, clear drains to zero
    assert(TextAnalysis.bpeMemoProtectedRddIds(spark).nonEmpty)
    TextAnalysis.clearBpeMemo()
    assert(TextAnalysis.bpeMemoProtectedRddIds(spark).isEmpty)
    assert(drainPersistentRdds() == 0,
      "clearBpeMemo left persisted RDD blocks behind")
  }
}
