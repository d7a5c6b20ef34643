package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One entry per implemented operator from SURVEY.md §2; every entry has a
  * DuckDB oracle in [[oracleSql]] unless its result is approximate /
  * non-SQL-expressible (then the driver records a weaker rows-only check).
  * Column names are aliased identically on both sides — the driver compare
  * sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1PricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational batch flagships (SURVEY.md §2.8 "built-in when needed")
    "q1_pricing_summary" -> ((s, d) => Tpch.q1PricingSummary(Tables.lineitem(s, d))),
    "revenue_by_nation" -> ((s, d) =>
      Tpch.revenueByNation(Tables.orders(s, d), Tables.customer(s, d), Tables.nation(s, d))),
    "q3_shipping_priority" -> ((s, d) =>
      Tpch.q3ShippingPriority(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    // six-table Q5 shape: one fact-fact shuffle, dims broadcast/AQE
    "q5_region_revenue" -> ((s, d) =>
      Tpch.q5RegionRevenue(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))),
    // pure-pushdown Q6 shape: all predicates at the scan, one-row global agg
    "q6_forecast_revenue" -> ((s, d) => Tpch.q6ForecastRevenue(Tables.lineitem(s, d))),
    // Q4 shape: EXISTS as a left-semi join on the order key
    "q4_order_priority" -> ((s, d) =>
      Tpch.q4OrderPriority(Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q10 shape: pre-agg to the customer key before the attribute joins
    "q10_returned_revenue" -> ((s, d) =>
      Tpch.q10ReturnedItemRevenue(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.nation(s, d))),
    // Q12 shape: pushed fact filter, one key join, 2-group priority split
    "q12_shipmode_priority" -> ((s, d) =>
      Tpch.q12ShipmodePriority(Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q14 shape: single fact pass, broadcast part dim, conditional share
    "q14_promo_revenue" -> ((s, d) =>
      Tpch.q14PromoRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    // Q18 shape: HAVING prunes groups before any attribute join
    "q18_large_orders" -> ((s, d) =>
      Tpch.q18LargeOrders(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    // Q7 shape: bilateral nation-pair revenue by ship year
    "q7_volume_shipping" -> ((s, d) =>
      Tpch.q7VolumeShipping(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    // Q15 shape: argmax-by-broadcast top supplier, ties surface
    "q15_top_supplier" -> ((s, d) =>
      Tpch.q15TopSupplier(Tables.lineitem(s, d), Tables.supplier(s, d))),
    // Q17 shape: decorrelated half-average comparison, exact cross-multiply
    "q17_small_qty_revenue" -> ((s, d) =>
      Tpch.q17SmallQuantityRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    // Q19 shape: disjunctive brand/size/quantity pushdown
    "q19_discounted_revenue" -> ((s, d) =>
      Tpch.q19DiscountedRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    // Q8 shape: two-sided conditional market-share ratio from one aggregate
    "q8_market_share" -> ((s, d) =>
      Tpch.q8MarketShare(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d), Tables.part(s, d))),
    // Q13 shape: pre-agg + left-outer histogram (zero-order bucket kept)
    "q13_customer_distribution" -> ((s, d) =>
      Tpch.q13CustomerDistribution(Tables.customer(s, d), Tables.orders(s, d))),
    // Q22 shape: scalar-subquery threshold + anti join + nation agg
    "q22_dormant_balance" -> ((s, d) =>
      Tpch.q22DormantBalance(Tables.customer(s, d), Tables.orders(s, d))),
    // Q21 shape: broadcast nation prune + co-partitioned semi/anti on l_orderkey
    "q21_waiting_supplier" -> ((s, d) =>
      Tpch.q21WaitingSupplier(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.supplier(s, d), Tables.nation(s, d))),
    // partsupp-dependent shapes over the synthesized partsupp relation
    "q2_min_cost_supplier" -> ((s, d) =>
      Tpch.q2MinCostSupplier(Tables.part(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q9_product_profit" -> ((s, d) =>
      Tpch.q9ProductProfit(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.part(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    "q11_important_stock" -> ((s, d) =>
      Tpch.q11ImportantStock(Tables.part(s, d), Tables.supplier(s, d),
        Tables.nation(s, d))),
    "q16_parts_supplier" -> ((s, d) =>
      Tpch.q16PartsSupplierRelation(Tables.part(s, d), Tables.supplier(s, d))),
    "q20_potential_promotion" -> ((s, d) =>
      Tpch.q20PotentialPromotion(Tables.part(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.region(s, d), Tables.lineitem(s, d))),
    "rollup_counts" -> ((s, d) => Tpch.rollupCounts(Tables.events(s, d))),
    "cube_counts" -> ((s, d) => Tpch.cubeCounts(Tables.events(s, d))),
    "user_behavior_pivot" -> ((s, d) => Tpch.userBehaviorPivot(Tables.events(s, d))),
    "clickers_never_purchased" -> ((s, d) => Tpch.clickersNeverPurchased(Tables.events(s, d))),
    "clickers_who_purchased" -> ((s, d) => Tpch.clickersWhoPurchased(Tables.events(s, d))),
    "global_top_docs" -> ((s, d) => Tpch.globalTopDocs(Tables.documents(s, d))),
    // Windowed counts (PageView / UniqueVisitor / UvBloom / Market / AdGeo)
    "pv_hourly" -> ((s, d) => EventWindows.pvHourly(Tables.events(s, d))),
    "uv_hourly" -> ((s, d) => EventWindows.uvHourly(Tables.events(s, d))),
    "uv_hourly_approx" -> ((s, d) => EventWindows.uvHourlyApprox(Tables.events(s, d))),
    "uv_hourly_bloom" -> ((s, d) => EventWindows.uvHourlyBloom(Tables.events(s, d))),
    "market_by_channel" -> ((s, d) => EventWindows.marketByChannel(Tables.events(s, d))),
    "market_total" -> ((s, d) => EventWindows.marketTotal(Tables.events(s, d))),
    "market_by_channel_fine" -> ((s, d) => EventWindows.marketByChannelFine(Tables.events(s, d))),
    "ad_clicks_by_province" -> ((s, d) =>
      EventWindows.adClicksByProvince(Tables.events(s, d), Tables.customer(s, d), Tables.nation(s, d))),
    "sessionize" -> ((s, d) => EventWindows.sessionize(Tables.events(s, d))),
    // first-touch view->click->purchase conversion funnel
    "event_funnel" -> ((s, d) => EventWindows.eventFunnel(Tables.events(s, d))),
    // weekly cohort retention triangle
    "retention_cohorts" -> ((s, d) => EventWindows.retentionCohorts(Tables.events(s, d))),
    // RFM quintile segmentation with histogram-bounded thresholds
    "rfm_segments" -> ((s, d) => EventWindows.rfmSegments(Tables.events(s, d))),
    // hourly ingest-rate spike screen over the trailing-24h histogram
    "event_rate_anomaly" -> ((s, d) => EventWindows.eventRateAnomaly(Tables.events(s, d))),
    // first-order event-type transition matrix (Markov view of journeys)
    "user_path_transitions" -> ((s, d) => EventWindows.userPathTransitions(Tables.events(s, d))),
    // Per-window top-N (HotItems / NetworkFlow)
    "hot_items_topn" -> ((s, d) => TopN.hotItems(Tables.events(s, d))),
    "hot_pages_topn" -> ((s, d) => TopN.hotPages(Tables.events(s, d))),
    // CMS frequency sketch (approximate ⇒ rows-only; bounds property-tested)
    "hot_items_sketch" -> ((s, d) => graft.agg.HeavyHitters.hotItemsSketch(Tables.events(s, d))),
    // Pattern detection (LoginFail 1/2/CEP, AdBlacklist)
    "login_fail_consecutive" -> ((s, d) => FraudDetect.loginFailConsecutive(Tables.events(s, d))),
    // CEP `fail next fail within(gap)` (LoginFailWithCep) via the generic
    // pattern operator — hash-checked against the lag-based oracle
    // (FraudDetect.loginFailConsecutiveSql), proving strict contiguity ≡
    // consecutive-pair semantics (SURVEY.md §2.9)
    "login_fail_cep" -> ((s, d) => Cep.nextPattern(Tables.events(s, d),
      Seq(Cep.typeIs("first_fail", "error"), Cep.typeIs("second_fail", "error")), 3600)),
    // CEP `a followedBy b within(t)` (OrderTimeoutWithCep's match half)
    "cep_signup_purchase" -> ((s, d) => Cep.signupThenPurchase(Tables.events(s, d))),
    // Flink-CEP-exact multi-partial-match followedBy (k pending a's all match)
    "cep_signup_purchase_multi" -> ((s, d) => Cep.signupThenPurchaseEach(Tables.events(s, d))),
    // CEP absence pattern: a NOT followed by b within t (timeout side-output)
    "cep_abandoned_signup" -> ((s, d) => Cep.abandonedSignup(Tables.events(s, d))),
    "login_fail_burst" -> ((s, d) => FraudDetect.loginFailBurst(Tables.events(s, d))),
    "ad_blacklist" -> ((s, d) => FraudDetect.adBlacklist(Tables.events(s, d))),
    // Order lifecycle (OrderTimeout / OrderPayTxMatch)
    "order_timeout" -> ((s, d) => OrderFlow.orderTimeout(Tables.events(s, d))),
    "tx_match_interval" -> ((s, d) => OrderFlow.txMatchInterval(Tables.orders(s, d), Tables.lineitem(s, d))),
    "tx_unmatched" -> ((s, d) => OrderFlow.txUnmatched(Tables.orders(s, d), Tables.lineitem(s, d))),
    "purchase_attribution" -> ((s, d) => AsOf.purchaseAttribution(Tables.events(s, d))),
    // SCD type-2 validity intervals from the event log (one window shuffle)
    "scd2_intervals" -> ((s, d) => History.scd2Intervals(Tables.events(s, d))),
    // per-event trailing 1d/7d time-RANGE feature windows, integer cents
    "rolling_user_features" -> ((s, d) => History.rollingUserFeatures(Tables.events(s, d))),
    // bloom-prefiltered semi-join: broadcast bucket set, exact FP kill
    "bloom_semi_join" -> ((s, d) => DataOps.bloomSemiJoin(Tables.events(s, d))),
    // Z-order (Morton) layout key + per-cell occupancy report
    "zorder_layout" -> ((s, d) => DataOps.zorderLayout(Tables.events(s, d))),
    // one-pass per-column ingest profile of the documents table
    "table_profile" -> ((s, d) => DataOps.tableProfile(Tables.documents(s, d))),
    // blocked record linkage: prefix blocks, levenshtein + segment rule
    "entity_match" -> ((s, d) => Records.entityMatch(Tables.customer(s, d))),
    // nightly-ingest linkage: batch reps probe the capped corpus block index
    "entity_match_incremental" -> ((s, d) => Records.entityMatchIncremental(Tables.customer(s, d))),
    // k-anonymity audit: whole generalization lattice in one rollup pass
    "k_anonymity" -> ((s, d) => Records.kAnonymity(Tables.customer(s, d))),
    // market-basket co-occurrence: support/confidence/lift, fixed point
    "basket_pairs" -> ((s, d) => Records.basketPairs(Tables.lineitem(s, d))),
    // non-equi band join: purchases x value tiers, broadcast NLJ
    "range_join_tiers" -> ((s, d) => DataOps.rangeJoinTiers(Tables.events(s, d))),
    // zone-map data-skipping audit: scan-vs-match per stats predicate
    "zone_map_prune" -> ((s, d) => DataOps.zoneMapPrune(Tables.events(s, d))),
    // salted fact-dim join, row-identical to the plain join
    "salted_join_agg" -> ((s, d) =>
      Skew.saltedJoinAgg(Tables.events(s, d), Tables.customer(s, d), Tables.nation(s, d))),
    // Training-data pipeline: text analysis (documents table)
    "text_stats" -> ((s, d) => TextAnalysis.textStatsCanonical(Tables.documents(s, d))),
    "lang_id" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.docFingerprint(Tables.documents(s, d))),
    // MOSS winnowing fingerprints: per-window min k-gram hash, map-only
    "doc_winnow" -> ((s, d) => TextAnalysis.docWinnow(Tables.documents(s, d))),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(Tables.documents(s, d))),
    "vocab_topk" -> ((s, d) => TextAnalysis.vocabTopK(Tables.documents(s, d))),
    "bpe_pairs" -> ((s, d) => TextAnalysis.bpePairs(Tables.documents(s, d))),
    // one greedy BPE merge round + re-counted symbol-pair stats
    "bpe_merge_apply" -> ((s, d) => TextAnalysis.bpeMergeApply(Tables.documents(s, d))),
    // the full iterative BPE training loop: 4 elected merges compounding
    "bpe_train" -> ((s, d) => TextAnalysis.bpeTrain(Tables.documents(s, d))),
    // tokenizer application: per-doc token budget under the trained merges
    "bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(Tables.documents(s, d))),
    "doc_entropy" -> ((s, d) => TextAnalysis.docEntropy(Tables.documents(s, d))),
    // Gopher hard-filter battery: five integer rule verdicts + keep
    "gopher_rules" -> ((s, d) => TextAnalysis.gopherRules(Tables.documents(s, d))),
    // PMI collocation mining over adjacent token pairs (top-K by pmi_fp)
    "term_pmi" -> ((s, d) => TextAnalysis.termPmi(Tables.documents(s, d))),
    // per-doc collocational-strength score under the corpus PMI model
    "doc_pmi_score" -> ((s, d) => TextAnalysis.docPmiScore(Tables.documents(s, d))),
    // Heaps-law vocabulary growth over 10 corpus prefixes
    "vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(Tables.documents(s, d))),
    "doc_repetition" -> ((s, d) => TextAnalysis.docRepetition(Tables.documents(s, d))),
    "doc_rarity" -> ((s, d) => TextAnalysis.docRarity(Tables.documents(s, d))),
    "doc_lm_score" -> ((s, d) => TextAnalysis.docLmScore(Tables.documents(s, d))),
    // trigram stupid-backoff scoring: half-corpus model, real backoff mix
    "doc_lm_backoff" -> ((s, d) => TextAnalysis.docLmBackoff(Tables.documents(s, d))),
    // CCNet head/middle/tail perplexity partition at exact tertile cuts
    "ccnet_buckets" -> ((s, d) => TextAnalysis.ccnetBuckets(Tables.documents(s, d))),
    // per-source KS drift screen over the LM-score distribution
    "quality_drift" -> ((s, d) => TextAnalysis.qualityDrift(Tables.documents(s, d))),
    "nb_lang_classify" -> ((s, d) => Classify.nbLangConfusion(Tables.documents(s, d))),
    "doc_top_terms" -> ((s, d) => TextAnalysis.docTopTerms(Tables.documents(s, d))),
    // BM25 keyword retrieval (Lucene idf form, fixed-point contributions)
    "bm25_search" -> ((s, d) => Search.bm25Search(Tables.documents(s, d))),
    // postings-list build with per-term digests of the ordered postings
    "inverted_index" -> ((s, d) => Search.invertedIndex(Tables.documents(s, d))),
    // NDCG@10 of the BM25 ranking vs graded term-overlap relevance
    "search_eval" -> ((s, d) => Search.searchEval(Tables.documents(s, d))),
    // delta-gap bit budget of every postings list (compression sizing)
    "postings_delta_stats" -> ((s, d) => Search.postingsDeltaStats(Tables.documents(s, d))),
    "doc_chunks" -> ((s, d) => TextAnalysis.docChunks(Tables.documents(s, d))),
    "pii_redact" -> ((s, d) => TextAnalysis.piiRedact(Tables.documents(s, d))),
    "doc_length_quantiles" -> ((s, d) => TextAnalysis.docLengthQuantiles(Tables.documents(s, d))),
    "doc_length_quantiles_approx" -> ((s, d) => TextAnalysis.docLengthQuantilesApprox(Tables.documents(s, d))),
    // Training-data pipeline: deduplication
    "dedup_exact" -> ((s, d) => Dedup.dedupExact(Tables.documents(s, d))),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.dedupMinhashLsh(Tables.documents(s, d))),
    // per-doc top-k near-dup retrieval over the same LSH candidate graph
    "similar_docs" -> ((s, d) => Dedup.similarDocs(Tables.documents(s, d))),
    // asymmetric near-subset pairs (containment over the smaller set)
    "dedup_containment" -> ((s, d) => Dedup.dedupContainment(Tables.documents(s, d))),
    // incremental crawl-ingest: new batch probed against the static corpus index
    "dedup_incremental" -> ((s, d) => Dedup.dedupIncremental(Tables.documents(s, d))),
    // per-source duplication diagnostics from the cluster keep-list
    "source_dup_rates" -> ((s, d) => Dedup.sourceDupRates(Tables.documents(s, d))),
    // near-dup graph shape: wedges, triangles, clustering coefficient
    "dedup_graph_stats" -> ((s, d) => Dedup.dedupGraphStats(Tables.documents(s, d))),
    // recall audit: production LSH pairs vs exact truth on a bounded sample
    "dedup_recall" -> ((s, d) => Dedup.dedupRecall(Tables.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.dedupNgramJaccard(Tables.documents(s, d))),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimhash(Tables.documents(s, d))),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(Tables.documents(s, d))),
    // Quadratic-guard proof: boilerplate-skewed corpus where BandBucketCap /
    // DfCap demonstrably drop buckets/shingles, oracle mirrors the cap
    "dedup_minhash_lsh_skew" -> ((s, d) => Dedup.dedupMinhashLshSkew(Tables.documents(s, d))),
    "dedup_ngram_jaccard_skew" -> ((s, d) => Dedup.dedupNgramJaccardSkew(Tables.documents(s, d))),
    "dedup_simhash_skew" -> ((s, d) => Dedup.dedupSimhashSkew(Tables.documents(s, d))),
    "dedup_chunks" -> ((s, d) => TextAnalysis.dedupChunks(Tables.documents(s, d))),
    "dedup_substring" -> ((s, d) => Dedup.dedupSubstring(Tables.documents(s, d))),
    "dedup_centrality" -> ((s, d) => Dedup.dedupCentrality(Tables.documents(s, d))),
    // third keep rule: highest-quality member per cluster
    "dedup_keep_best" -> ((s, d) => Dedup.dedupKeepBest(Tables.documents(s, d))),
    "dedup_embedding" -> ((s, d) => Knn.dedupEmbedding(Tables.embeddings(s, d))),
    "dedup_embedding_ann" -> ((s, d) => Knn.dedupEmbeddingAnn(Tables.embeddings(s, d))),
    "dedup_embedding_lsh" -> ((s, d) => Knn.dedupEmbeddingLsh(Tables.embeddings(s, d))),
    // Training-data pipeline: corpus curation (deterministic sampling,
    // decontamination, token-budgeted quality selection)
    "sample_docs" -> ((s, d) => Curation.sampleDocs(Tables.documents(s, d))),
    "sample_stratified" -> ((s, d) => Curation.sampleStratified(Tables.documents(s, d))),
    // leakage-free 8/1/1 split keyed by source hash (split manifest)
    "split_assign" -> ((s, d) => Curation.splitAssign(Tables.documents(s, d))),
    "sample_weighted" -> ((s, d) => Curation.sampleWeighted(Tables.documents(s, d))),
    "quality_calibrate" -> ((s, d) => Curation.qualityCalibrate(Tables.documents(s, d))),
    "decontam_overlap" -> ((s, d) => Curation.decontamOverlap(Tables.documents(s, d))),
    "dsir_select" -> ((s, d) => Curation.dsirSelect(Tables.documents(s, d))),
    // DoReMi-style one-round mixture reweighting over lang domains
    "domain_mixture" -> ((s, d) => Curation.domainMixture(Tables.documents(s, d))),
    // count-based temperature-sampling shares (p_i ∝ n_i^α) at 3 alphas
    "mixture_temperature" -> ((s, d) => Curation.mixtureTemperature(Tables.documents(s, d))),
    // C4-style boilerplate strip: cleaned-text rewrite, not just a report
    "boilerplate_strip" -> ((s, d) => TextAnalysis.boilerplateStrip(Tables.documents(s, d))),
    // crawl-side HTML -> cleaned text (tag strip + link-density block keep)
    // over the deterministic htmlWrap fixture pages; canonical by distinct
    // text (extraction is a pure function of text), scorer runs reps-only
    "html_extract" -> ((s, d) => TextAnalysis.htmlExtractCanonical(Tables.documents(s, d))),
    // jusText's stopword-density axis on: keyword-stuffed blocks flip to dropped
    "html_extract_stopword" -> ((s, d) => TextAnalysis.htmlExtractCanonical(
      Tables.documents(s, d), stopwordAxis = true)),
    // crawl-frontier URL canonicalization (map-only) + canonical-URL dedup
    // (one hash-agg) over the deterministic urlWrap alias fixture
    "url_canonicalize" -> ((s, d) => Web.urlCanonicalize(Tables.documents(s, d))),
    "dedup_url" -> ((s, d) => Web.dedupUrl(Tables.documents(s, d))),
    "curate_budget" -> ((s, d) => Curation.curateBudget(Tables.documents(s, d))),
    "source_cap" -> ((s, d) => Curation.sourceCap(Tables.documents(s, d))),
    "curate_pipeline" -> ((s, d) => Curation.curatePipeline(Tables.documents(s, d))),
    "shard_pack" -> ((s, d) => Curation.shardPack(Tables.documents(s, d))),
    // GPT-style context-window packing: doc→(sequence, span) map at L=512
    "sequence_pack" -> ((s, d) => Curation.sequencePack(Tables.documents(s, d))),
    // Training-data pipeline: similarity search
    "knn_cosine" -> ((s, d) => Knn.knnBruteForce(Tables.embeddings(s, d))),
    "knn_ivf" -> ((s, d) => Knn.knnIvf(Tables.embeddings(s, d))),
    // radius search: everything within cosine >= tau, IVF-pruned
    "knn_ball_query" -> ((s, d) => Knn.ballQuery(Tables.embeddings(s, d))),
    // incremental vector-ingest dedup: new batch probed vs static corpus index
    "knn_incremental" -> ((s, d) => Knn.knnIncremental(Tables.embeddings(s, d))),
    "embedding_quantize" -> ((s, d) => Knn.embeddingQuantize(Tables.embeddings(s, d))),
    "knn_quantized" -> ((s, d) => Knn.knnQuantized(Tables.embeddings(s, d))),
    "label_centroids" -> ((s, d) => Knn.labelCentroids(Tables.embeddings(s, d))),
    "knn_ivf_adc" -> ((s, d) => Knn.knnIvfAdc(Tables.embeddings(s, d))),
    "knn_ivf_pq" -> ((s, d) => Knn.knnIvfPq(Tables.embeddings(s, d))),
    "embedding_stats" -> ((s, d) => Knn.embeddingStats(Tables.embeddings(s, d))),
    "knn_ivf_trained" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Knn.knnIvf(e, centroids = Some(Knn.trainCentroids(e)))
    }),
    "topic_clusters" -> ((s, d) => Knn.topicClusters(Tables.embeddings(s, d))),
    // external clustering quality: purity + fixed-point label entropy
    "topic_purity" -> ((s, d) => Knn.topicPurity(Tables.embeddings(s, d))),
    // ANN eval harness: recall@K of the IVF index vs the exact baseline
    "knn_recall" -> ((s, d) => Knn.knnRecall(Tables.embeddings(s, d))),
    // same harness grading the 8-byte IVFPQ production path
    "knn_recall_pq" -> ((s, d) => Knn.knnRecallPq(Tables.embeddings(s, d))),
    // OOD screen: vectors farthest from their assigned centroid
    "embedding_outliers" -> ((s, d) => Knn.embeddingOutliers(Tables.embeddings(s, d))),
    "dedup_semantic" -> ((s, d) => Knn.dedupSemantic(Tables.embeddings(s, d))),
    "embedding_project" -> ((s, d) => Knn.jlProject(Tables.embeddings(s, d))),
    // integer power iteration on the fixed-point second-moment matrix
    "embedding_pca" -> ((s, d) => Knn.embeddingPca(Tables.embeddings(s, d))),
    "pca_project" -> ((s, d) => Knn.pcaProject(Tables.embeddings(s, d))),
    // Training-data pipeline: multimodal binary columns. Image (ImageIO)
    // and audio (javax.sound) decodes are REAL; on the synthetic corpus
    // every payload takes the deterministic byte-stats fallback, which the
    // DuckDB oracle reproduces exactly (see pipeline.Multimodal)
    "media_features" -> ((s, d) =>
      Multimodal.extractFeaturesCanonical(Tables.documents(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Tpch.q1PricingSummarySql,
    "revenue_by_nation" -> Tpch.revenueByNationSql,
    "q3_shipping_priority" -> Tpch.q3ShippingPrioritySql,
    "q5_region_revenue" -> Tpch.q5RegionRevenueSql,
    "q6_forecast_revenue" -> Tpch.q6ForecastRevenueSql,
    "q4_order_priority" -> Tpch.q4OrderPrioritySql,
    "q10_returned_revenue" -> Tpch.q10ReturnedItemRevenueSql,
    "q12_shipmode_priority" -> Tpch.q12ShipmodePrioritySql,
    "q7_volume_shipping" -> Tpch.q7VolumeShippingSql,
    "q15_top_supplier" -> Tpch.q15TopSupplierSql,
    "q17_small_qty_revenue" -> Tpch.q17SmallQuantityRevenueSql,
    "q19_discounted_revenue" -> Tpch.q19DiscountedRevenueSql,
    "q8_market_share" -> Tpch.q8MarketShareSql,
    "q13_customer_distribution" -> Tpch.q13CustomerDistributionSql,
    "q22_dormant_balance" -> Tpch.q22DormantBalanceSql,
    "q21_waiting_supplier" -> Tpch.q21WaitingSupplierSql,
    "q2_min_cost_supplier" -> Tpch.q2MinCostSupplierSql,
    "q9_product_profit" -> Tpch.q9ProductProfitSql,
    "q11_important_stock" -> Tpch.q11ImportantStockSql,
    "q16_parts_supplier" -> Tpch.q16PartsSupplierRelationSql,
    "q20_potential_promotion" -> Tpch.q20PotentialPromotionSql,
    "q14_promo_revenue" -> Tpch.q14PromoRevenueSql,
    "q18_large_orders" -> Tpch.q18LargeOrdersSql,
    "rollup_counts" -> Tpch.rollupCountsSql,
    "cube_counts" -> Tpch.cubeCountsSql,
    "user_behavior_pivot" -> Tpch.userBehaviorPivotSql,
    "clickers_never_purchased" -> Tpch.clickersNeverPurchasedSql,
    "clickers_who_purchased" -> Tpch.clickersWhoPurchasedSql,
    "global_top_docs" -> Tpch.globalTopDocsSql,
    "pv_hourly" -> EventWindows.pvHourlySql,
    "uv_hourly" -> EventWindows.uvHourlySql,
    // approximate estimators, graded: Spark emits (key, exact, 0/1 bound
    // verdict); the oracle recomputes exact and emits literal 1, so an
    // estimator drifting out of its error envelope breaks the hash
    "uv_hourly_approx" -> EventWindows.uvHourlyApproxSql,
    "uv_hourly_bloom" -> EventWindows.uvHourlyBloomSql,
    "hot_items_sketch" -> graft.agg.HeavyHitters.hotItemsSketchSql,
    "doc_length_quantiles_approx" -> TextAnalysis.docLengthQuantilesApproxSql,
    "market_by_channel" -> EventWindows.marketByChannelSql,
    "market_total" -> EventWindows.marketTotalSql,
    "market_by_channel_fine" -> EventWindows.marketByChannelFineSql,
    "ad_clicks_by_province" -> EventWindows.adClicksByProvinceSql,
    "sessionize" -> EventWindows.sessionizeSql,
    "event_funnel" -> EventWindows.eventFunnelSql,
    "retention_cohorts" -> EventWindows.retentionCohortsSql,
    "rfm_segments" -> EventWindows.rfmSegmentsSql,
    "event_rate_anomaly" -> EventWindows.eventRateAnomalySql,
    "user_path_transitions" -> EventWindows.userPathTransitionsSql,
    "hot_items_topn" -> TopN.hotItemsSql,
    "hot_pages_topn" -> TopN.hotPagesSql,
    "login_fail_consecutive" -> FraudDetect.loginFailConsecutiveSql,
    "login_fail_cep" -> FraudDetect.loginFailConsecutiveSql,
    "cep_signup_purchase" -> Cep.signupThenPurchaseSql,
    "cep_signup_purchase_multi" -> Cep.signupThenPurchaseEachSql,
    "cep_abandoned_signup" -> Cep.abandonedSignupSql,
    "login_fail_burst" -> FraudDetect.loginFailBurstSql,
    "ad_blacklist" -> FraudDetect.adBlacklistSql,
    "order_timeout" -> OrderFlow.orderTimeoutSql,
    "tx_match_interval" -> OrderFlow.txMatchIntervalSql,
    "tx_unmatched" -> OrderFlow.txUnmatchedSql,
    "purchase_attribution" -> AsOf.purchaseAttributionSql,
    "scd2_intervals" -> History.scd2IntervalsSql,
    "rolling_user_features" -> History.rollingUserFeaturesSql,
    "bloom_semi_join" -> DataOps.bloomSemiJoinSql,
    "zorder_layout" -> DataOps.zorderLayoutSql,
    "table_profile" -> DataOps.tableProfileSql,
    "entity_match" -> Records.entityMatchSql,
    "entity_match_incremental" -> Records.entityMatchIncrementalSql,
    "k_anonymity" -> Records.kAnonymitySql,
    "basket_pairs" -> Records.basketPairsSql,
    "range_join_tiers" -> DataOps.rangeJoinTiersSql,
    "zone_map_prune" -> DataOps.zoneMapPruneSql,
    "salted_join_agg" -> Skew.saltedJoinAggSql,
    "text_stats" -> TextAnalysis.textStatsSql,
    "lang_id" -> TextAnalysis.langIdSql,
    "doc_fingerprint" -> TextAnalysis.docFingerprintSql,
    "doc_winnow" -> TextAnalysis.docWinnowSql,
    "token_count" -> TextAnalysis.tokenCountSql,
    "vocab_topk" -> TextAnalysis.vocabTopKSql(),
    "bpe_pairs" -> TextAnalysis.bpePairsSql,
    "bpe_merge_apply" -> TextAnalysis.bpeMergeApplySql,
    "bpe_train" -> TextAnalysis.bpeTrainSql,
    "bpe_encode" -> TextAnalysis.bpeEncodeSql,
    "doc_entropy" -> TextAnalysis.docEntropySql,
    "gopher_rules" -> TextAnalysis.gopherRulesSql,
    "term_pmi" -> TextAnalysis.termPmiSql,
    "doc_pmi_score" -> TextAnalysis.docPmiScoreSql,
    "vocab_growth" -> TextAnalysis.vocabGrowthSql,
    "doc_rarity" -> TextAnalysis.docRaritySql,
    "doc_lm_score" -> TextAnalysis.docLmScoreSql,
    "doc_lm_backoff" -> TextAnalysis.docLmBackoffSql,
    "ccnet_buckets" -> TextAnalysis.ccnetBucketsSql,
    "quality_drift" -> TextAnalysis.qualityDriftSql,
    "nb_lang_classify" -> Classify.nbLangConfusionSql,
    "doc_top_terms" -> TextAnalysis.docTopTermsSql,
    "bm25_search" -> Search.bm25SearchSql(),
    "inverted_index" -> Search.invertedIndexSql,
    "search_eval" -> Search.searchEvalSql(),
    "postings_delta_stats" -> Search.postingsDeltaStatsSql,
    "doc_chunks" -> TextAnalysis.docChunksSql,
    "doc_length_quantiles" -> TextAnalysis.docLengthQuantilesSql,
    "media_features" -> Multimodal.mediaFeaturesSql,
    "doc_repetition" -> TextAnalysis.docRepetitionSql,
    "pii_redact" -> TextAnalysis.piiRedactSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_minhash_lsh" -> Dedup.dedupMinhashLshSql,
    "similar_docs" -> Dedup.similarDocsSql,
    "dedup_containment" -> Dedup.dedupContainmentSql,
    "dedup_incremental" -> Dedup.dedupIncrementalSql,
    "source_dup_rates" -> Dedup.sourceDupRatesSql,
    "dedup_graph_stats" -> Dedup.dedupGraphStatsSql,
    "dedup_recall" -> Dedup.dedupRecallSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_clusters" -> Dedup.dedupClustersSql,
    "dedup_minhash_lsh_skew" -> Dedup.dedupMinhashLshSkewSql,
    "dedup_ngram_jaccard_skew" -> Dedup.dedupNgramJaccardSkewSql,
    "dedup_simhash_skew" -> Dedup.dedupSimhashSkewSql,
    "dedup_chunks" -> TextAnalysis.dedupChunksSql,
    "dedup_substring" -> Dedup.dedupSubstringSql,
    "dedup_centrality" -> Dedup.dedupCentralitySql,
    "dedup_keep_best" -> Dedup.dedupKeepBestSql,
    "dedup_embedding" -> Knn.dedupEmbeddingSql,
    "dedup_embedding_ann" -> Knn.dedupEmbeddingAnnSql,
    "dedup_embedding_lsh" -> Knn.dedupEmbeddingLshSql,
    "knn_cosine" -> Knn.knnBruteForceSql,
    // approximate index, but DETERMINISTIC bucketing (argmax cosine, fixed
    // seeds/iterations) ⇒ exactly reproducible in SQL and hash-checked
    "knn_ivf" -> Knn.knnIvfSql,
    "knn_ball_query" -> Knn.ballQuerySql,
    "knn_incremental" -> Knn.knnIncrementalSql,
    "embedding_quantize" -> Knn.embeddingQuantizeSql,
    "knn_quantized" -> Knn.knnQuantizedSql,
    "label_centroids" -> Knn.labelCentroidsSql,
    "knn_ivf_adc" -> Knn.knnIvfAdcSql,
    "knn_ivf_pq" -> Knn.knnIvfPqSql,
    "embedding_stats" -> Knn.embeddingStatsSql,
    "knn_ivf_trained" -> Knn.knnIvfTrainedSql,
    "topic_clusters" -> Knn.topicClustersSql,
    "topic_purity" -> Knn.topicPuritySql,
    "knn_recall" -> Knn.knnRecallSql,
    "knn_recall_pq" -> Knn.knnRecallPqSql,
    "embedding_outliers" -> Knn.embeddingOutliersSql,
    "dedup_semantic" -> Knn.dedupSemanticSql,
    "embedding_project" -> Knn.jlProjectSql,
    "embedding_pca" -> Knn.embeddingPcaSql,
    "pca_project" -> Knn.pcaProjectSql,
    "sample_docs" -> Curation.sampleDocsSql(),
    "sample_stratified" -> Curation.sampleStratifiedSql,
    "split_assign" -> Curation.splitAssignSql,
    "sample_weighted" -> Curation.sampleWeightedSql,
    "quality_calibrate" -> Curation.qualityCalibrateSql,
    "decontam_overlap" -> Curation.decontamOverlapSql,
    "dsir_select" -> Curation.dsirSelectSql(),
    "domain_mixture" -> Curation.domainMixtureSql,
    "mixture_temperature" -> Curation.mixtureTemperatureSql,
    "boilerplate_strip" -> TextAnalysis.boilerplateStripSql,
    "html_extract" -> TextAnalysis.htmlExtractSql,
    "html_extract_stopword" -> TextAnalysis.htmlExtractSql(stopwordAxis = true),
    "url_canonicalize" -> Web.urlCanonicalizeSql,
    "dedup_url" -> Web.dedupUrlSql,
    "curate_budget" -> Curation.curateBudgetSql(),
    "source_cap" -> Curation.sourceCapSql(),
    "curate_pipeline" -> Curation.curatePipelineSql,
    "shard_pack" -> Curation.shardPackSql(),
    "sequence_pack" -> Curation.sequencePackSql(),
  )
}
