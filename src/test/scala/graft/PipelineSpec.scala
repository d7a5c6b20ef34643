package graft

import graft.ops.{EventWindows, TopN}
import graft.pipeline.{Classify, Curation, Dedup, Knn, TextAnalysis}
import org.apache.spark.sql.functions._

/** Invariants over the analytics and pipeline operators (SURVEY.md §5.4):
  * pane-count conservation, top-N containment, approximation bounds,
  * planted-duplicate recovery, ANN recall.
  */
class PipelineSpec extends SparkSuite {

  private lazy val events = Tables.events(spark, sf())
  private lazy val docs = Tables.documents(spark, sf())
  private lazy val embs = Tables.embeddings(spark, sf())

  test("driver contract: every oracle references a registered query, entry runs") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    // every registered query is callable at the smallest SF and yields rows
    // (the driver smoke-checks entry the same way)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("tumbling panes conserve the total count") {
    val total = events.filter(col("event_type") === "click").count()
    val sum = EventWindows.pvHourly(events).agg(org.apache.spark.sql.functions.sum("pv_count"))
      .collect()(0).getLong(0)
    assert(sum == total)
  }

  test("every event lands in exactly size/slide sliding panes") {
    val nonError = events.filter(col("event_type") =!= "error").count()
    val paneSum = EventWindows.marketTotal(events).agg(sum("cnt")).collect()(0).getLong(0)
    assert(paneSum == nonError * 6) // 1 h window / 10 min slide = 6 panes
  }

  test("top-N rows are a prefix of the full per-window ranking") {
    val top = TopN.hotPages(events)
    assert(top.filter(col("rnk") > 5).count() == 0)
    // rank 2 exists only where rank 1 exists, counts non-increasing by rank
    val bad = top.as("a").join(top.as("b"),
      col("a.window_start") === col("b.window_start") && (col("a.rnk") + 1) === col("b.rnk")
        && col("a.cnt") < col("b.cnt"))
    assert(bad.count() == 0)
  }

  test("approx UV within 5% of exact UV per window") {
    val exact = EventWindows.uvHourly(events).withColumnRenamed("uv_count", "exact")
    val approx = EventWindows.uvHourlyApproxRaw(events).withColumnRenamed("uv_approx", "approx")
    val joined = exact.join(approx, "window_start")
    val bad = joined.filter(abs(col("approx") - col("exact")) > col("exact") * 0.05 + lit(1))
    assert(bad.count() == 0)
  }

  test("graded approximate queries: every within_bound verdict is 1") {
    // the driver's oracle emits literal 1 for within_bound — any estimator
    // leaving its error envelope flips the verdict and breaks the hash;
    // this locks the same invariant locally for all four graded queries
    Seq(
      EventWindows.uvHourlyApprox(events),
      EventWindows.uvHourlyBloom(events),
      graft.agg.HeavyHitters.hotItemsSketch(events),
      TextAnalysis.docLengthQuantilesApprox(docs))
      .foreach { df =>
        assert(df.filter(col("within_bound") =!= 1L).count() == 0)
        assert(df.count() > 0)
      }
  }

  test("pii redaction scrubs emails and phone numbers, counts match") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact bob.smith+x@mail.example.org or 555-867-5309x nope"),
      (2L, "two mails a@b.io c@d.co and a phone 123 456 7890 end"),
      (3L, "clean text with no pii at all"),
      (4L, "edge 12-34-5678 not a phone, partial@nope missing tld"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis.piiRedact(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 == 1 && out(1L)._3.contains("<EMAIL>"))
    assert(out(2L) == ((2L, 1L, "two mails <EMAIL> <EMAIL> and a phone <PHONE> end")))
    assert(out(3L) == ((0L, 0L, "clean text with no pii at all")))
    assert(out(4L)._1 == 0 && out(4L)._2 == 0)
  }

  test("repetition metric: constructed duplicate-heavy doc is flagged, varied doc kept") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a b a b a b a b a b"),       // bigrams heavily repeated
      (2L, "one two three four five six") // all bigrams distinct
    ).toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis.docRepetition(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(1L) == ((9L, 2L, 0L))) // 9 bigrams, only "a b"/"b a" distinct -> dropped
    assert(out(2L) == ((5L, 5L, 1L))) // all distinct -> kept
  }

  test("source cap keeps at most N per source, preferring longer docs") {
    val out = graft.pipeline.Curation.sourceCap(docs, cap = 3)
    val bySource = out.collect().groupBy(_.getString(1))
    assert(bySource.values.forall(_.length <= 3))
    assert(bySource.size == docs.select("source").distinct().count())
    // kept docs are the longest of their source
    val minKept = out.groupBy("source").agg(min("n_chars").as("m"))
    val bad = docs.select(col("source"), length(col("text")).cast("long").as("n"))
      .join(minKept, "source")
      .groupBy("source", "m").agg(count(when(col("n") > col("m"), 1)).as("longer"))
      .filter(col("longer") > 3) // > cap docs longer than the kept minimum is impossible
    assert(bad.count() == 0)
  }

  test("shard packing: two-phase cumsum == naive global window, shards honor budget") {
    import org.apache.spark.sql.expressions.Window
    val out = graft.pipeline.Curation.shardPack(docs, shardTokens = 2000)
    // force docs into MANY blocks to exercise the offset phase: synthetic
    // ids spread across 7 blocks
    val spread = docs.withColumn("doc_id", col("doc_id") * lit(143L))
    val naive = spread
      .select(col("doc_id"), graft.pipeline.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    graft.pipeline.Curation.shardPack(spread, 2000).collect().foreach { r =>
      assert(r.getLong(2) == naive(r.getLong(0)),
        s"two-phase cumsum diverges at doc ${r.getLong(0)}")
    }
    // every shard's token total stays within budget + one max doc overhang
    val maxDoc = out.agg(max("n_tokens")).collect()(0).getLong(0)
    val shardTotals = out.groupBy("shard_id").agg(sum("n_tokens").as("tot"))
      .collect().map(_.getLong(1))
    assert(shardTotals.forall(_ <= 2000 + maxDoc))
    assert(shardTotals.length > 1)
  }

  test("sequence packing: spans tile every sequence exactly and every doc exactly") {
    val L = 512L
    val out = graft.pipeline.Curation.sequencePack(docs, seqLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // (a) within each sequence, spans tile [0, L) contiguously with no
    // overlap; every sequence except the last is exactly full
    val bySeq = out.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seqId, rows) =>
      val spans = rows.sortBy(_._4).map(r => (r._4, r._4 + r._5)) // (seq_offset, end)
      assert(spans.head._1 == 0, s"seq $seqId does not start at 0")
      spans.sliding(2).foreach {
        case Array((_, e), (s2, _)) => assert(e == s2, s"gap/overlap in seq $seqId")
        case _ =>
      }
      if (seqId != lastSeq) assert(spans.last._2 == L, s"seq $seqId not full")
    }
    // (b) each doc's spans tile its full token count in order
    val toks = docs
      .select(col("doc_id"),
        size(graft.pipeline.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    out.groupBy(_._1).foreach { case (docId, rows) =>
      val spans = rows.sortBy(_._3).map(r => (r._3, r._3 + r._5)) // (doc_offset, end)
      assert(spans.head._1 == 0 && spans.last._2 == toks(docId),
        s"doc $docId spans do not cover its tokens")
      spans.sliding(2).foreach {
        case Array((_, e), (s2, _)) => assert(e == s2, s"gap in doc $docId")
        case _ =>
      }
    }
    // (c) zero-token docs emit nothing
    assert(out.map(_._1).toSet == toks.filter(_._2 > 0).keySet)
  }

  test("stratified sample: per-stratum keep fraction tracks its configured rate") {
    import spark.implicits._
    val kept = graft.pipeline.Curation.sampleStratified(docs)
      .groupBy("lang", "rate_pct").count()
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      val (rate, k) = kept.getOrElse(lang, (graft.pipeline.Curation.StratRates.toMap
        .getOrElse(lang, graft.pipeline.Curation.StratDefaultPct).toLong, 0L))
      val expected = n * rate / 100.0
      // 4-sigma binomial tolerance on small strata
      val tol = 4 * math.sqrt(expected * (1 - rate / 100.0)) + 1
      assert(math.abs(k - expected) <= tol, s"$lang: kept $k of $n at rate $rate%")
    }
    // the stratified hash is decorrelated from the flat sample's
    val flat = graft.pipeline.Curation.sampleDocs(docs).select("doc_id")
    val strat = graft.pipeline.Curation.sampleStratified(docs).select("doc_id")
    assert(strat.except(flat).count() > 0)
  }

  test("connected components: chain needs pointer jumping, labels are component mins") {
    import spark.implicits._
    // a 100-vertex chain (diameter 99 > maxIters, so neighbor-min alone
    // cannot converge — this fails if label compression is broken) plus a
    // disjoint triangle with non-contiguous ids
    val chain = (0L until 99L).map(i => (i, i + 1))
    val tri = Seq((500L, 700L), (700L, 600L))
    // smallGraphMax = 0 forces the distributed loop — the path under test
    val comp = graft.pipeline.Graph.connectedComponents(
        (chain ++ tri).toDF("s", "t"), smallGraphMax = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 99L).forall(comp(_) == 0L))
    assert(Seq(500L, 600L, 700L).forall(comp(_) == 500L))
    assert(comp.size == 103) // only vertices that appear in edges
    // the driver-side union-find fast path computes the identical fixpoint
    val fast = graft.pipeline.Graph.connectedComponents((chain ++ tri).toDF("s", "t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast == comp)
  }

  test("connected components: empty edge list yields empty labels; singleton corpus all-keep") {
    import spark.implicits._
    assert(graft.pipeline.Graph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("s", "t")).count() == 0)
    // three unrelated docs: no LSH pairs -> every doc its own kept cluster
    val singletons = Seq(
      (1L, "alpha bravo charlie delta echo"),
      (2L, "foxtrot golf hotel india juliet"),
      (3L, "kilo lima mike november oscar"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupClusters(singletons).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)))
  }

  test("dedup clusters: one row per doc, transitive closure of the LSH pairs") {
    val clusters = Dedup.dedupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.length == docs.count())
    val label = clusters.map(c => c._1 -> c._2).toMap
    // cluster representative is the cluster's own min member and is kept
    clusters.foreach { case (doc, cl, keep) =>
      assert(cl <= doc)
      assert(label(cl) == cl, s"representative $cl of $doc not self-labeled")
      assert(keep == (if (doc == cl) 1L else 0L))
    }
    // every LSH pair ended up in one cluster
    Dedup.dedupMinhashLsh(docs).select("doc_a", "doc_b").collect().foreach { r =>
      assert(label(r.getLong(0)) == label(r.getLong(1)))
    }
    // and some cluster is non-trivial (the testdata plants duplicates)
    assert(clusters.exists(c => c._3 == 0L))
  }

  test("minhash LSH recovers planted near-duplicates with high Jaccard") {
    val pairs = Dedup.dedupMinhashLsh(docs).collect()
    assert(pairs.nonEmpty)
    // jaccard within (0.5, 1]; doc_a < doc_b
    assert(pairs.forall(r => r.getDouble(3) > 0.5 - 1e-9 && r.getDouble(3) <= 1.0))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dedup_recall: per-decile counts coherent; detected == in-sample LSH pairs; memo reused") {
    val rows = Dedup.dedupRecall(docs).collect()
    assert(rows.nonEmpty, "sample ground truth found no >=-threshold pairs")
    rows.foreach { r =>
      val (dec, nT, nD, rec) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dec >= 5 && dec <= 10, s"decile $dec outside the >=0.5 truth range")
      assert(nD >= 0 && nD <= nT, "detected exceeds truth — precision-1 invariant broken")
      assert(math.abs(rec - nD.toDouble / nT) < 1e-15)
    }
    // global precision-1 cross-check: the sum of detected pairs equals the
    // number of production LSH pairs with BOTH ends in the md5 sample —
    // every verified >=-threshold LSH pair must appear in the exact truth
    // (identical per-doc shingle sets and threshold on both sides)
    val sampleIds = docs.select(col("doc_id"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(200).collect().map(_.getLong(0)).toSet
    val lshInSample = Dedup.dedupMinhashLsh(docs).collect()
      .count(r => sampleIds(r.getLong(0)) && sampleIds(r.getLong(1)))
    assert(rows.map(_.getLong(2)).sum == lshInSample)
    // the audit rides the cluster-chain memo: a second run rebuilds nothing
    val pb = Dedup.clusterPairBuilds.get()
    Dedup.dedupRecall(docs).collect()
    assert(Dedup.clusterPairBuilds.get() == pb,
      "dedup_recall rebuilt the verified-pair relation instead of reusing the memo")
  }

  test("exact dedup keep-list covers every document exactly once") {
    val total = docs.count()
    val sumCopies = Dedup.dedupExact(docs).agg(sum("n_copies")).collect()(0).getLong(0)
    assert(sumCopies == total)
  }

  test("incremental dedup == full batch dedup restricted to cross-split pairs") {
    // with no bucket cap firing at test scale, probing the new batch
    // against the corpus index must find exactly the (batch, corpus)
    // pairs the full self-join finds, with identical verified scores —
    // bucket derivation is per-doc, so splitting the corpus changes
    // nothing but which pairs are eligible
    val isBatch = (id: Long) => id % 17 == 3
    val full = Dedup.dedupMinhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .filter { case (a, b, _, _) => isBatch(a) ^ isBatch(b) }
      .map { case (a, b, n, j) =>
        if (isBatch(a)) ((a, b), (n, j)) else ((b, a), (n, j)) }
      .toMap
    val incr = Dedup.dedupIncremental(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(incr.nonEmpty, "fixture has no cross-split near-dup pairs")
    assert(incr == full, s"incremental=${incr.keySet} full=${full.keySet}")
  }

  test("incremental vector dedup == full index pairs restricted to cross-split") {
    // bucket membership is a pure function of (vector, corpus cents), so
    // probing only the new batch against the corpus index must find
    // exactly the (batch, corpus) pairs the full bucket self-join finds,
    // with bit-identical verified cosines
    val isBatch = (id: Long) => id % 17 == 3
    // τ = 0.3: the registered 0.45 leaves the sf0.001 fixture with a single
    // brute-force cross pair that happens to miss its probed buckets; the
    // property is threshold-independent, so test where pairs exist (52)
    val full = Knn.annPairsUnderIncrementalIndex(embs, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => isBatch(a) ^ isBatch(b) }
      .map { case (a, b, s) =>
        if (isBatch(a)) ((a, b), s) else ((b, a), s) }
      .toMap
    val incr = Knn.knnIncremental(embs, threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(incr.nonEmpty, "fixture has no cross-split vector near-dup pairs")
    assert(incr == full, s"incremental=${incr.keySet} full=${full.keySet}")
  }

  test("simhash finds the highest-Jaccard planted near-dup pair") {
    val top = Dedup.dedupMinhashLsh(docs).orderBy(col("jaccard").desc).limit(1).collect()(0)
    val (a, b) = (top.getLong(0), top.getLong(1))
    val pairs = Dedup.dedupSimhash(docs)
      .filter(col("doc_a") === a && col("doc_b") === b).collect()
    assert(pairs.length == 1 && pairs(0).getLong(2) <= 6, s"pair ($a,$b) missing from simhash dups")
  }

  test("IVF ANN: scores exact, recall >= coverage bound on isotropic data") {
    val bf = Knn.knnBruteForce(embs).select("query_id", "neighbor_id", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Knn.knnIvf(embs).select("query_id", "neighbor_id", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // every IVF hit that brute force also ranked must carry the identical score
    ivf.foreach { case (pair, s) => bf.get(pair).foreach(b => assert(b == s)) }
    // nprobe=2 of nlist=4 covers ~half the corpus; isotropic data ⇒ recall
    // concentrates near coverage. 0.35 leaves slack for bucket imbalance.
    val recall = ivf.map(_._1).toSet.intersect(bf.keySet).size.toDouble / bf.size
    assert(recall >= 0.35, s"recall=$recall")
  }

  test("as-of join: equal-ts click matches; max id wins equal-ts ties; none before -> null") {
    import spark.implicits._
    import graft.ops.AsOf
    val purchases = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 30L, 12L))
      .toDF("user_id", "e", "event_id")
    val clicks = Seq((1L, 100L, 20L), (1L, 100L, 21L), (1L, 40L, 22L), (2L, 31L, 23L))
      .toDF("user_id", "e", "event_id")
    val out = AsOf.asOfJoin(purchases, clicks, "user_id", "e", "event_id")
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out(10L) == Some(21L)) // equal-ts clicks match; id 21 > 20 wins
    assert(out(11L) == Some(22L)) // latest click at/before t=50 is t=40
    assert(out(12L) == None)      // only click for user 2 is after the purchase
  }

  test("approx quantiles: each estimate sits at its target rank") {
    // approx_percentile returns an actual data value (no interpolation), so
    // the guarantee is rank accuracy, not value closeness: the fraction of
    // the group's values <= estimate must bracket the target quantile
    val values = docs
      .selectExpr("lang", "CAST(length(text) AS DOUBLE) AS n_chars").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .map { case (l, vs) => l -> vs.map(_._2).sorted }
    val approx = TextAnalysis.docLengthQuantilesApproxRaw(docs).collect()
      .map(r => r.getString(0) -> Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2),
        0.75 -> r.getDouble(3))).toMap
    assert(approx.keySet == values.keySet)
    approx.foreach { case (lang, qs) =>
      val vs = values(lang)
      qs.foreach { case (q, est) =>
        val below = vs.count(_ <= est).toDouble / vs.size
        val above = vs.count(_ < est).toDouble / vs.size
        assert(above - 0.02 <= q && q <= below + 0.02,
          s"$lang q$q: est=$est covers ($above, $below]")
      }
    }
  }

  test("cube lattice is self-consistent: grand total row equals corpus size") {
    import graft.ops.Tpch
    val out = Tpch.cubeCounts(events).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val n = events.count()
    assert(out(("ALL", -1L)) == n) // (ALL, ALL) cell
    // each marginal sums back to the grand total
    val typeMarginals = out.collect { case ((t, -1L), c) if t != "ALL" => c }.sum
    val dowMarginals = out.collect { case (("ALL", d), c) if d != -1L => c }.sum
    assert(typeMarginals == n && dowMarginals == n)
  }

  test("pivot rows sum to each user's event count") {
    import graft.ops.Tpch
    val out = Tpch.userBehaviorPivot(events)
    val colsSum = out.collect().map(r =>
      (r.getLong(0), (1 to 5).map(i => r.getLong(i)).sum)).toMap
    val expected = events.groupBy(col("user_id")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(colsSum == expected)
  }

  test("as-of plan shape: no join node anywhere — one keyed window pass") {
    val plan = graft.ops.AsOf.purchaseAttribution(events).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("trained IVF: Lloyd rounds are deterministic and keep exact scoring") {
    val c1 = Knn.trainCentroids(embs, nlist = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val c2 = Knn.trainCentroids(embs, nlist = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(c1.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L)) // no label lost
    assert(c1.map(_._2.toList).toSeq == c2.map(_._2.toList).toSeq) // reproducible
    // training moved the centroids off the seed vectors
    val seeds = embs.filter(col("vec_id") < 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(c1.map(_._2.toList).toSeq != seeds.map(_._2.toList).toSeq)
    // searching the trained index still returns exact cosine scores and
    // positive recall vs brute force
    val bf = Knn.knnBruteForce(embs).select("query_id", "neighbor_id", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val trained = Knn.knnIvf(embs, centroids = Some(Knn.trainCentroids(embs)))
      .select("query_id", "neighbor_id", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    trained.foreach { case (pair, s) => bf.get(pair).foreach(b => assert(b == s)) }
    val recall = trained.map(_._1).toSet.intersect(bf.keySet).size.toDouble / bf.size
    assert(recall >= 0.35, s"trained recall=$recall")
  }

  test("shingle DF cap bounds stop-shingle pair explosion") {
    import spark.implicits._
    // 60 docs share one boilerplate sentence (every doc ⇒ a stop-shingle)
    // but are otherwise disjoint. Uncapped, the inverted index pairs all
    // 60·59/2 of them through the boilerplate; with the cap the
    // stop-shingles leave the Jaccard universe and no pair remains.
    val docs = (0 until 60).map(i =>
      (i.toLong, s"common header line shared everywhere u$i v$i w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.dedupNgramJaccard(docs, threshold = 0.0, dfCap = 1 << 30).count()
    val capped = Dedup.dedupNgramJaccard(docs, threshold = 0.0, dfCap = 10).count()
    assert(uncapped == 60L * 59 / 2, s"uncapped=$uncapped")
    assert(capped == 0, s"capped=$capped")
  }

  test("ngram canonicalization: exact-copy groups expand to all member pairs, cross pairs ride the reps") {
    import spark.implicits._
    // group A: docs 1,5,9 byte-identical; group B: docs 2,7 byte-identical;
    // A and B near-dup (share 5 of 7/6 shingles); doc 20 unrelated
    val a = "alpha beta gamma delta epsilon zeta eta theta iota"   // 7 shingles
    val b = "alpha beta gamma delta epsilon zeta eta kappa"        // 6 shingles, 5 shared
    val docs = Seq(1L -> a, 5L -> a, 9L -> a, 2L -> b, 7L -> b,
      20L -> "completely different words nothing here matches at all")
      .toDF("doc_id", "text")
    val out = Dedup.dedupNgramJaccard(docs, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // within-group: C(3,2) + C(2,2) pairs at bit-exact jaccard 1.0
    val withinA = Seq((1L, 5L), (1L, 9L), (5L, 9L)); val withinB = Seq((2L, 7L))
    withinA.foreach { p => assert(out(p) == ((7L, 1.0)), s"$p: ${out.get(p)}") }
    withinB.foreach { p => assert(out(p) == ((6L, 1.0)), s"$p: ${out.get(p)}") }
    // cross-group: every A member x every B member at the rep pair's jaccard,
    // pair orientation by doc id (5 > 2, 9 > 7 — least/greatest matters)
    val jab = 5.0 / (7 + 6 - 5)
    val cross = Seq((1L, 2L), (2L, 5L), (2L, 9L), (1L, 7L), (5L, 7L), (7L, 9L))
    cross.foreach { p => assert(out(p) == ((5L, jab)), s"$p: ${out.get(p)}") }
    // nothing else: doc 20 pairs with nobody; total = 4 within + 6 cross
    assert(out.size == withinA.size + withinB.size + cross.size)
  }

  test("substring dedup: hand-computed spans — overlap merge, disjoint spans, short docs zero") {
    import spark.implicits._
    def tok(i: Int) = f"w$i%03d "
    def run(r: Range) = r.map(tok).mkString
    // A and B share tokens 5..19 (75 chars); E repeats A's tokens 0..9 and
    // 10..19 in two regions split by a 50-char '#' run ('#' appears in no
    // token, so no cross-boundary gram can partially match); C is exactly
    // one (unique) gram; D is under K chars
    val fixture = Seq(
      (1L, run(0 until 20)),
      (2L, run(5 until 25)),
      (3L, run(30 until 40)),
      (4L, run(60 until 68)),
      (5L, run(0 until 10) + "#" * 50 + run(10 until 20))
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")).cast("long"))
    val out = Dedup.dedupSubstring(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // A: dup positions {1 (vs E), 26..51 (vs B), 51 (vs E)} — one merged
    // island covering chars [1, 101) = the whole doc
    assert(out(1L) == ((1L, 100L)))
    // B: positions 1..26 -> one 75-char span
    assert(out(2L) == ((1L, 75L)))
    // C: its single gram is unique; D: shorter than K
    assert(out(3L) == ((0L, 0L)))
    assert(out(4L) == ((0L, 0L)))
    // E: exactly its two aligned grams match A; separator-spanning grams
    // match nothing -> two disjoint 50-char spans
    assert(out(5L) == ((2L, 100L)))

    // full corpus: total (one row per doc), spans bounded by doc length,
    // every span carries at least K chars
    val full = Dedup.dedupSubstring(docs).collect()
    assert(full.length == docs.count())
    full.foreach { r =>
      val (nChars, nSpans, dupChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dupChars <= nChars)
      assert(dupChars >= nSpans * Dedup.SubstrK)
    }
  }

  test("null-text docs survive exact-dup canonicalization: substring report emits their zeroed rows") {
    import spark.implicits._
    // two exact copies (one canonical group) + two NULL-text docs. Before
    // the null-safe group key (C.textGid), md5(NULL) = NULL fell out of the
    // members equi-join and the NULL docs vanished from the report — the
    // legacy per-doc plan and the LEFT-JOIN oracle both emit them with 0s.
    val txt = (0 until 15).map(i => f"w$i%03d ").mkString // 75 chars > K
    val fixture = Seq(
      (1L, Option(txt)), (2L, Option(txt)),
      (3L, Option.empty[String]), (4L, Option.empty[String])
    ).toDF("doc_id", "text")
      .withColumn("n_chars", coalesce(length(col("text")).cast("long"), lit(0L)))
    val out = Dedup.dedupSubstring(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(3L) == ((0L, 0L)) && out(4L) == ((0L, 0L)))
    // the copies still dedup against each other: whole doc is one span
    assert(out(1L) == ((1L, txt.length.toLong)) && out(2L) == out(1L))
  }

  test("centrality dedup: one keeper per cluster, keeper maximizes rank, corpus vertices == lsh graph") {
    val pairs = Dedup.dedupMinhashLsh(docs).select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val vertices = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val rows = Dedup.dedupCentrality(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // exactly the LSH-graph vertices are ranked
    assert(rows.map(_._1).sorted.toSeq == vertices.toSeq)
    // degree agrees with the pair list
    val degExp = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.length)
    rows.foreach(r => assert(r._3 == degExp(r._1).toLong, s"deg of ${r._1}"))
    // per cluster: exactly one keeper and it maximizes (pr, -id)
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val kept = members.filter(_._5 == 1L)
      assert(kept.length == 1, s"cluster $cid kept ${kept.length}")
      assert(kept.head._1 == members.maxBy(m => (m._4, -m._1))._1, s"cluster $cid keeper")
    }
    // rank mass: every vertex retains at least the uniform term and the
    // fixed-point ranks are positive and bounded by total in-mass
    rows.foreach(r => assert(r._4 >= Dedup.PrScale * 15 / 100))
    // hand-checked integer power iteration on an explicit path graph
    // 1—2—3: deg = (1, 2, 1); per round r'(v) = 150000 + Σ (85·r(u)) div (100·deg(u))
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    var exp = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
    val degs = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    val nbrs = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    (1 to Dedup.PrIters).foreach { _ =>
      exp = exp.map { case (v, _) =>
        v -> (150000L + nbrs(v).map(u => (85L * exp(u)) / (100L * degs(u))).sum)
      }
    }
    val pr = Dedup.centralityFromPairs(path).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    exp.foreach { case (v, e) => assert(pr(v)._3 == e, s"pr of $v: ${pr(v)._3} != $e") }
    // middle of the path is the most central -> sole keeper of cluster 1
    assert(pr(2L)._3 > pr(1L)._3 && pr(2L)._3 > pr(3L)._3)
    assert(pr.values.map(_._1).toSet == Set(1L) && pr.count(_._2._4 == 1L) == 1 && pr(2L)._4 == 1L)
    assert(pr(1L)._2 == 1L && pr(2L)._2 == 2L && pr(3L)._2 == 1L)
  }

  test("centrality driver fast path == distributed PR loop (measured-cutover A/B)") {
    // the corpus fixture rides the small-graph driver path by default;
    // smallGraphMax = 0 forces the distributed join loop over the same
    // quotient graph — identical (doc, cluster, deg, pr, keep) rows
    val fast = Dedup.dedupCentrality(docs).collect().map(_.toSeq).toSet
    val dist = Dedup.dedupCentrality(docs, smallGraphMax = 0L)
      .collect().map(_.toSeq).toSet
    assert(fast.nonEmpty && fast == dist)
  }

  test("skew fixture fires both quadratic guards live; capped outputs drop boilerplate") {
    // Fixture ids must sit above every real doc_id (else synthetic rows
    // would silently collide with the corpus — identically in both engines,
    // so parity alone would never catch it).
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    assert(maxId < Dedup.SkewIdBase, s"doc_id $maxId >= SkewIdBase")

    val skewed = Dedup.skewedDocuments(docs)
    // (a) BandBucketCap: the byte-identical boilerplate copies share one
    // signature, so every one of the NumBands band-buckets they occupy
    // exceeds the cap — the guard branch demonstrably fires.
    val overCap = Dedup.lshBands(Dedup.shingleHashes(skewed))
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("n") > Dedup.BandBucketCap)
    assert(overCap.count() == Dedup.NumBands, "expected every boilerplate band-bucket over cap")
    // (b) DfCap: every boilerplate shingle's document frequency exceeds it.
    val overDf = Dedup.shingleHashes(skewed)
      .groupBy(col("h0")).agg(count(lit(1)).as("df"))
      .filter(col("df") > Dedup.DfCap)
    assert(overDf.count() > 0, "expected boilerplate shingles over DfCap")
    // (c) With the guards live, no synthetic doc survives to the pair
    // output — capped buckets/shingles are dropped BEFORE the self-join.
    val synthetic = col("doc_a") >= Dedup.SkewIdBase || col("doc_b") >= Dedup.SkewIdBase
    assert(Dedup.dedupMinhashLshSkew(docs).filter(synthetic).count() == 0)
    assert(Dedup.dedupNgramJaccardSkew(docs).filter(synthetic).count() == 0)
    // (d) the SimHash block cap (same BandBucketCap, fixed 2^12 block
    // space) fires on the same fixture: the byte-identical copies share
    // one signature, over-filling all SimBlocks buckets — none of the
    // synthetic mass may reach the pair output
    assert(Dedup.dedupSimhash(skewed).filter(synthetic).count() == 0)
  }

  test("no CartesianProduct in any embedding-pairing plan") {
    // exact dedup runs as the block-grid equi-join, ANN/IVF as bucket
    // equi-joins — a CartesianProduct node would mean the 100 TB
    // scale-killer shape crept back in
    Seq(Knn.dedupEmbedding(embs), Knn.dedupEmbeddingAnn(embs), Knn.knnIvf(embs),
        Knn.dedupEmbeddingLsh(embs))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), plan.take(2000))
      }
  }

  test("source cap plan carries the partial top-K rewrite (WindowGroupLimit)") {
    val plan = graft.pipeline.Curation.sourceCap(docs).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("int8 quantization reconstructs every dimension within half a step") {
    import org.apache.spark.sql.functions.broadcast
    val ranges = Knn.quantizeRanges(embs)
    val withR = embs.crossJoin(broadcast(ranges))
    val joined = Knn.quantizeCodes(withR)
      .join(withR.select(col("vec_id"), col("embedding"), col("mns"), col("mxs")), "vec_id")
      .select(col("vec_id"), col("codes"), col("embedding"), col("mns"), col("mxs"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val codes = r.getSeq[Long](1)
      val xs = r.getSeq[Float](2)
      val mns = r.getSeq[Double](3)
      val mxs = r.getSeq[Double](4)
      codes.indices.foreach { i =>
        val step = (mxs(i) - mns(i)) / 255.0
        assert(codes(i) >= 0 && codes(i) <= 255)
        if (step > 0) {
          val deq = mns(i) + (codes(i) + 0.5) * step
          assert(math.abs(xs(i) - deq) <= step * 0.5001 + 1e-9,
            s"vec ${r.getLong(0)} dim $i: x=${xs(i)} deq=$deq step=$step")
        }
      }
    }
  }

  test("LSH dedup pairs are a subset of exact pairs with identical scores") {
    val exact = Knn.dedupEmbedding(embs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Knn.dedupEmbeddingLsh(embs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, sim) =>
      assert(exact.contains(pair), s"LSH invented pair $pair")
      assert(exact(pair) == sim, s"score mismatch for $pair")
    }
  }

  test("deterministic sample is repartition-invariant and ~pct sized") {
    import graft.pipeline.Curation
    val s1 = Curation.sampleDocs(docs).collect().map(_.getLong(0)).toSeq
    val s2 = Curation.sampleDocs(docs.repartition(7)).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2) // same rows, same order, any physical layout
    val n = docs.count()
    assert(s1.size > n / 20 && s1.size < n / 5) // 10% nominal, loose bounds
  }

  test("samples nest: a smaller cut is a subset of a larger one") {
    import graft.pipeline.Curation
    val small = Curation.sampleDocs(docs, pct = 4).collect().map(_.getLong(0)).toSet
    val large = Curation.sampleDocs(docs, pct = 25).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large)) // threshold filter ⇒ monotone selection
    assert(small.nonEmpty && large.size > small.size)
  }

  test("budgeted curation keeps a top tier-prefix within budget") {
    import graft.pipeline.Curation
    val budget = 10000L
    val kept = Curation.curateBudget(docs, budget)
    val keptTokens = kept.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(keptTokens <= budget)
    // tiers form a prefix from the top: every unkept doc's tier is <= every kept doc's min tier
    val minKeptTier = kept.agg(min("tier")).collect()(0).getLong(0)
    val unkeptAbove = docs
      .join(kept.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .filter(floor(size(array_distinct(col("toks"))).cast("double") / size(col("toks")) * 1000) > minKeptTier)
    assert(unkeptAbove.count() == 0)
  }

  test("decontamination flags a planted copy of an eval document") {
    import graft.pipeline.Curation
    import spark.implicits._
    // doc 0 (eval: 0 % 53 == 0) cloned as training doc 1000001
    val evalText = docs.filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val planted = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((1000001L, evalText)).toDF("doc_id", "text"))
    val out = Curation.decontamOverlap(planted)
      .filter(col("doc_id") === 1000001L).collect()
    assert(out.length == 1 && out(0).getDouble(3) == 1.0) // fully contaminated
  }

  test("ANN dedup pairs are a subset of exact pairs with identical scores") {
    val exact = Knn.dedupEmbedding(embs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ann = Knn.dedupEmbeddingAnn(embs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ann.nonEmpty)
    ann.foreach { case (pair, s) =>
      assert(exact.get(pair).contains(s), s"ANN pair $pair not exact or score drift")
    }
    // the embeddings corpus is isotropic (threshold sits in the noise
    // tail), so candidate recall tracks bucket COVERAGE (nprobe/nlist)
    // rather than 1.0 — real near-dup mass (cos→1) co-buckets regardless
    // of nlist, but noise-tail pairs don't. The majority-recall floor is
    // therefore asserted at the pinned nlist=4 calibration (nprobe/nlist
    // = 1/2 coverage); the adaptive ⌈√N⌉ default above keeps only the
    // subset + score-identity contract
    val pinned = Knn.dedupEmbeddingAnn(embs, nlist = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    pinned.foreach { case (pair, s) =>
      assert(exact.get(pair).contains(s), s"pinned ANN pair $pair not exact or score drift")
    }
    assert(pinned.size.toDouble / exact.size >= 0.5, s"${pinned.size}/${exact.size}")
  }

  test("language ID and text stats are total (one row per document)") {
    assert(TextAnalysis.langId(docs).count() == docs.count())
    assert(TextAnalysis.textStats(docs).filter(col("n_tokens") <= 0).count() == 0)
  }

  test("doc rarity: hand-computed corpus frequencies, integer-exact sums") {
    import spark.implicits._
    // corpus counts: x->4, y->2, z->1
    val rows = Seq((1L, "x y x"), (2L, "x x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.docRarity(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((3L, 10L, 2L, 10.0 / 3))) // 4+2+4, rarest y=2
    assert(out(2L) == ((4L, 11L, 1L, 11.0 / 4))) // 4+4+2+1, rarest z=1
  }

  test("bigram LM score: hand-computed surprisal model, integer-exact sums") {
    import spark.implicits._
    // bigram counts: (a,b)->3, (b,a)->1, (b,c)->1; prefix counts: a->3, b->2
    // surprisal_fp: (a,b)=round(ln(3/3)*1e4)=0; (b,a)=(b,c)=round(ln(2)*1e4)=6931
    val rows = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.docLmScore(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 6931L, 1L))) // (a,b)+(b,a)+(a,b) = 0+6931+0
    assert(out(2L) == ((2L, 6931L, 1L))) // (a,b)+(b,c) = 0+6931
    // <2-token docs have no bigrams and drop out; empty corpus is total
    assert(TextAnalysis.docLmScore(Seq((9L, "solo")).toDF("doc_id", "text")).count() == 0)
    assert(TextAnalysis.docLmScore(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() == 0)
  }

  test("topic clusters: partition of the corpus, dominant label contained, cluster ids in range") {
    val rows = Knn.topicClusters(embs).collect()
    // every vector lands in exactly one cluster
    assert(rows.map(_.getLong(1)).sum == embs.count())
    rows.foreach { r =>
      val (cluster, nVecs, nLabels, nTop) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))
      assert(cluster >= 0 && cluster < 8)
      // the dominant label is a plurality of a real partition cell
      assert(nTop >= 1 && nTop <= nVecs)
      assert(nLabels >= 1 && nLabels <= nVecs)
      // plurality bound: n_top >= ceil(n_vecs / n_labels)
      assert(nTop * nLabels >= nVecs)
    }
  }

  test("semdedup: total partition, groups stay in-cluster, keep = farthest-from-centroid, near-dup pairs grouped") {
    val rows = Knn.dedupSemantic(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // one row per vector
    assert(rows.length == embs.count())
    val byGroup = rows.groupBy(_._3)
    byGroup.foreach { case (gid, members) =>
      // edges only join vectors of the same Lloyd cluster, so a connected
      // component can never span clusters
      assert(members.map(_._2).distinct.length == 1, s"group $gid spans clusters")
      // exactly one survivor per group: the min-csim (farthest) member,
      // vec_id tie-break
      val kept = members.filter(_._5 == 1L)
      assert(kept.length == 1, s"group $gid kept ${kept.length}")
      assert(kept.head._1 == members.minBy(m => (m._4, m._1))._1)
      // the group id is the smallest member id (min-label components)
      assert(gid == members.map(_._1).min)
    }
    // the synthetic corpus has real near-dups at tau — some group must be
    // non-trivial, and singletons must keep themselves
    assert(byGroup.exists(_._2.length > 1))
    rows.filter(r => byGroup(r._3).length == 1)
      .foreach(r => assert(r._3 == r._1 && r._5 == 1L))
  }

  test("dsir: target-vocabulary pool doc outranks disjoint-vocabulary one; ranks contiguous; no target docs selected") {
    import spark.implicits._
    // target (en) vocabulary is {alpha..delta}; pool doc 10 reuses it,
    // pool doc 11 is disjoint, pool doc 12 mixes — expected order 10, 12, 11
    val corpus = Seq(
      (1L, "alpha beta gamma delta alpha beta", "en"),
      (2L, "alpha gamma alpha delta beta gamma", "en"),
      (10L, "alpha beta gamma delta", "fr"),
      (11L, "zq xw vv uu", "fr"),
      (12L, "alpha beta zq xw", "fr")
    ).toDF("doc_id", "text", "lang")
    val rows = graft.pipeline.Curation.dsirSelect(corpus).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L, 12L, 11L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    // weights strictly ordered: full target overlap > partial > none
    val w = rows.map(_.getLong(2))
    assert(w(0) > w(1) && w(1) > w(2))
    // full sf corpus: selection excludes the target language and respects K
    val sel = graft.pipeline.Curation.dsirSelect(docs)
    assert(sel.count() <= graft.pipeline.Curation.DsirK)
    val selIds = sel.select("doc_id")
    assert(docs.filter(col("lang") === "en").join(selIds, "doc_id").count() == 0)
  }

  test("jl projection: exact driver replication, shape total, mean pairwise distance preserved") {
    val out = Knn.jlProject(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = embs.orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // total: one row per (vector, output dim)
    assert(out.size == vecs.size * Knn.JlDim)
    // bit-exact replication of the projection on the driver (same
    // ascending-order double fold, same /4)
    vecs.take(20).foreach { case (id, emb) =>
      Knn.jlSigns.zipWithIndex.foreach { case (s, j) =>
        var acc = 0.0
        emb.indices.foreach(i => acc += emb(i).toDouble * s(i))
        assert(out((id, j.toLong)) == acc / 4.0, s"vec $id dim $j")
      }
    }
    // JL property: squared pairwise distances preserved in expectation —
    // mean ratio over many pairs lands near 1 (deterministic corpus)
    def proj(id: Long): Seq[Double] = (0 until Knn.JlDim).map(j => out((id, j.toLong)))
    val ids = vecs.keys.toSeq.sorted.take(40)
    val ratios = for {
      a <- ids; b <- ids if a < b
      da = vecs(a).zip(vecs(b)).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      if da > 0
      dp = proj(a).zip(proj(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    } yield dp / da
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.4, s"mean distance ratio $mean")
  }

  test("weighted sampling: driver-replicated priorities, contiguous ranks, weight-proportional tilt") {
    // replicate the exact A-ES priority on the driver (same md5-hash
    // uniform, same Math.log, same fixed-point rounding) — the operator
    // must reproduce it bit-for-bit
    def md5Long(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val corpus = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = corpus.map { case (id, text) =>
      val w = math.max(1L, text.length.toLong)
      val lnu = math.round(
        math.log((md5Long(id.toString) + 1).toDouble / math.pow(2, 60)) * Curation.LnuScale)
      (id, w, lnu, lnu.toDouble / w.toDouble)
    }.sortBy { case (id, _, _, pri) => (-pri, id) }.take(Curation.WeightedK)
    val out = Curation.sampleWeighted(docs).collect()
    assert(out.length == math.min(Curation.WeightedK, corpus.length))
    out.zip(expected).zipWithIndex.foreach { case ((r, (id, w, lnu, _)), i) =>
      assert(r.getLong(0) == i + 1, s"rank at $i")
      assert(r.getLong(1) == id, s"doc at rank ${i + 1}")
      assert(r.getLong(3) == w && r.getLong(4) == lnu, s"key fields for doc $id")
    }
    // the weighting tilts selection toward long docs: mean selected
    // weight must exceed the corpus mean (deterministic fixture)
    val meanSel = out.map(_.getLong(3)).sum.toDouble / out.length
    val meanAll = corpus.map(_._2.length.toLong).sum.toDouble / corpus.length
    assert(meanSel > meanAll, s"$meanSel <= $meanAll")
  }

  test("bpe pairs: hand-counted pair frequencies, rank order, single-char and empty docs ignored") {
    import spark.implicits._
    // pairs: "abab" -> ab,ba,ab; "abc" -> ab,bc; "x" and "" contribute none
    // counts: ab=3, ba=1, bc=1 -> ranks: ab(1), ba(2), bc(3)
    val fixture = Seq((1L, "abab abc"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairs(fixture).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "ab", 3L), (2L, "ba", 1L), (3L, "bc", 1L)))
    // corpus: K rows, counts non-increasing, every pair 2 chars
    val full = TextAnalysis.bpePairs(docs).collect()
    assert(full.length == TextAnalysis.BpeK)
    assert(full.forall(_.getString(1).length == 2))
    val cnts = full.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("doc entropy: hand-computed histogram, uniform > repeated, empty doc zero") {
    import spark.implicits._
    def lnFp(x: Long) = math.round(math.log(x.toDouble) * TextAnalysis.EntScale)
    // "aab": n=3, counts a=2,b=1 -> ent = 3ln3 - (2ln2 + 0)
    val fixture = Seq((1L, "aab"), (2L, "aaaa"), (3L, "abcd"), (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.docEntropy(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 3 * lnFp(3) - 2 * lnFp(2))))
    assert(out(2L) == ((4L, 0L))) // 4ln4 - 4ln4: zero entropy
    assert(out(3L) == ((4L, 4 * lnFp(4)))) // uniform: maximal for n=4
    assert(out(4L) == ((0L, 0L)))
    // corpus: total, non-negative, bounded by n ln n
    val full = TextAnalysis.docEntropy(docs).collect()
    assert(full.length == docs.count())
    full.foreach { r =>
      val (n, e) = (r.getLong(1), r.getLong(2))
      assert(e >= 0L && (n <= 1 || e <= n * lnFp(n)))
    }
  }

  test("quality calibrate: hand-computed percentiles with ties, singleton stratum, corpus monotonicity") {
    import spark.implicits._
    // en stratum: lengths 1,2,2,4 -> below = 0,1,1,3 of n-1=3
    // fr stratum: single doc -> pct 0 (div by greatest(1, 0))
    val fixture = Seq(
      (1L, "a", "en"), (2L, "bb", "en"), (3L, "cc", "en"), (4L, "dddd", "en"),
      (5L, "eee", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.qualityCalibrate(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((4L, 0L, 0L)))
    assert(out(2L) == ((4L, 1L, 333333L)))
    assert(out(3L) == ((4L, 1L, 333333L)))
    assert(out(4L) == ((4L, 3L, 1000000L)))
    assert(out(5L) == ((1L, 0L, 0L)))
    // full corpus: total, bounded, and monotone in score within stratum
    val full = Curation.qualityCalibrate(docs).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(5)))
    assert(full.length == docs.count())
    assert(full.forall { case (_, _, p) => p >= 0L && p <= Curation.PctScale })
    full.groupBy(_._1).values.foreach { strat =>
      val byScore = strat.sortBy(_._2).map(_._3)
      assert(byScore.zip(byScore.tail).forall { case (a, b) => a <= b })
    }
  }

  test("nb classifier: separable corpus diagonal; empty doc -> prior argmax; zero-token class stays smoothed") {
    import spark.implicits._
    val rows = Seq(
      (1L, "aa aa bb", "en"), (2L, "aa bb bb", "en"), (3L, "aa aa", "en"),
      (4L, "xx yy xx", "fr"), (5L, "yy xx yy", "fr"),
      (6L, "", "de")).toDF("doc_id", "text", "lang")
    val out = Classify.nbLangConfusion(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // separable vocabularies classify to their own language — in
    // particular "de" (zero training tokens) must NOT win on prior alone:
    // its smoothed per-token 1/(0+V) out-scores nothing here
    assert(out(("en", "en")) == 3L)
    assert(out(("fr", "fr")) == 2L)
    // the empty doc has no token evidence: argmax of the priors is "en"
    assert(out(("de", "en")) == 1L)
    // every document lands in exactly one confusion cell
    assert(out.values.sum == 6L)
  }

  test("doc top terms: tf desc then df asc then token; ties broken stably") {
    import spark.implicits._
    // doc 1: a×2 b×2 c×1; doc 2: b×1 c×1. df: a=1, b=2, c=2
    val rows = Seq((1L, "a b a b c"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.docTopTerms(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // tf ties a/b at 2 -> a wins on smaller df; b second; c third
    assert(out((1L, 1L)) == (("a", 2L, 1L)))
    assert(out((1L, 2L)) == (("b", 2L, 2L)))
    assert(out((1L, 3L)) == (("c", 1L, 2L)))
    // doc 2: tf tie b/c at 1, df tie at 2 -> token order
    assert(out((2L, 1L)) == (("b", 1L, 2L)))
    assert(out((2L, 2L)) == (("c", 1L, 2L)))
  }

  test("round-5 operators are total on an empty corpus (no rows, no crash)") {
    import spark.implicits._
    import graft.pipeline.Curation
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.docRarity(noDocs).count() == 0)
    assert(TextAnalysis.docTopTerms(noDocs).count() == 0)
    assert(TextAnalysis.docChunks(noDocs).count() == 0)
    assert(Curation.curatePipeline(noDocs).count() == 0)
    val noVecs = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(Knn.labelCentroids(noVecs).count() == 0)
    assert(Knn.knnQuantized(noVecs).count() == 0)
    assert(Knn.knnIvfAdc(noVecs).count() == 0)
  }

  test("chunk dedup: identical docs dedup chunk-wise to the min doc") {
    import spark.implicits._
    val text100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val rows = Seq((7L, text100), (3L, text100), (9L, "totally different words here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupChunks(rows).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3))
    // docs 3 and 7 share every chunk -> keeper is doc 3, n_copies 2;
    // doc 9's single chunk is unique
    assert(out.toMap == Map((3L, 0L) -> 2L, (3L, 1L) -> 2L, (3L, 2L) -> 2L, (9L, 0L) -> 1L))
  }

  test("doc chunks match the pure span rule for every length 1..150") {
    import spark.implicits._
    // one doc per token count; the OPERATOR's output is compared against
    // an independent pure mirror (a property over the rule alone is
    // vacuous — it can't see an off-by-one introduced into the operator)
    val rows = (1 to 150).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.docChunks(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = (1 to 150).flatMap { n =>
      val starts = LazyList.iterate(1)(_ + 48).takeWhile(_ <= n).toList
      starts.zipWithIndex.map { case (st, idx) =>
        (n.toLong, idx.toLong, st.toLong, math.min(st + 63, n).toLong - st + 1)
      }
    }.toSet
    assert(got == expect)
  }

  test("doc chunks: stride windows cover every token, hand-checked shapes") {
    import spark.implicits._
    // 100 tokens t1..t100 -> chunks start at 1, 49, 97 with sizes 64, 52, 4
    val text100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val rows = Seq((1L, text100), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.docChunks(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
    val byKey = out.toMap
    assert(out.length == 4) // 3 chunks for doc 1, 1 for doc 2, none for empty doc 3
    assert(byKey((1L, 0L)) == ((1L, 64L, (1 to 64).map(i => s"t$i").mkString(" "))))
    assert(byKey((1L, 1L)) == ((49L, 52L, (49 to 100).map(i => s"t$i").mkString(" "))))
    assert(byKey((1L, 2L)) == ((97L, 4L, "t97 t98 t99 t100")))
    assert(byKey((2L, 0L)) == ((1L, 3L, "a b c")))
    // every token index of doc 1 appears in at least one chunk span
    val covered = out.filter(_._1._1 == 1L).flatMap { case ((_, _), (s, n, _)) =>
      (s until s + n) }.toSet
    assert(covered == (1L to 100L).toSet)
  }

  test("label centroids: repartition-invariant and within fixed-point resolution of exact mean") {
    val base = Knn.labelCentroids(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val shuffled = Knn.labelCentroids(embs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(base == shuffled, "fixed-point centroid must not depend on partitioning")
    // vs driver-side exact double mean: fixed-point rounding error <= 1e-7/2 per element
    val rows = embs.select("label", "embedding").collect()
      .map(r => r.getInt(0).toLong -> r.getSeq[Float](1))
    val byLabel = rows.groupBy(_._1)
    base.foreach { case ((label, pos), (n, _, meanScaled)) =>
      val vals = byLabel(label).map(_._2(pos.toInt - 1).toDouble)
      assert(n == vals.size)
      val exact = vals.sum / vals.size
      assert(math.abs(meanScaled / 1e7 - exact) <= 0.5e-7 + 1e-12,
        s"centroid drift at ($label,$pos): ${meanScaled / 1e7} vs $exact")
    }
  }

  test("embedding stats flag zero and exploded norms, keep healthy vectors") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0.6f, 0.8f)),        // unit norm -> keep
      (2L, Array(0f, 0f)),            // zero vector -> drop
      (3L, Array(2000f, 0f)),         // exploded -> drop
      (4L, Array(0.1f, 0.1f)))        // small but sane -> keep
      .toDF("vec_id", "embedding")
    val out = Knn.embeddingStats(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - 1.0) < 1e-7 && out(1L)._3 == 1L)
    assert(out(2L)._3 == 0L && out(3L)._3 == 0L && out(4L)._3 == 1L)
  }

  test("IVFADC: results drawn from IVF candidate set, cosines exact") {
    val brute = Knn.knnBruteForce(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val adc = Knn.knnIvfAdc(embs).collect()
    assert(adc.length == 80)
    adc.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      // re-rank cosine must be the identical double wherever the pair is
      // also in the exact top-k (same expression tree end to end)
      brute.get(key).foreach(c => assert(c == r.getDouble(4), s"cos drift $key"))
    }
    // the ADC shortlist prunes WITHIN the IVF candidate set, so IVFADC's
    // top-1 can never beat plain IVF's top-1 for the same query
    val ivfTop1 = Knn.knnIvf(embs).filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    adc.filter(_.getLong(1) == 1).foreach { r =>
      assert(r.getDouble(4) <= ivfTop1(r.getLong(0)) + 1e-15,
        s"IVFADC top-1 outside IVF candidates for query ${r.getLong(0)}")
    }
  }

  test("IVFPQ: cosines exact, recall vs in-bucket truth >= scalar ADC's") {
    val brute = Knn.knnBruteForce(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val pq = Knn.knnIvfPq(embs).collect()
    assert(pq.length == 80)
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      // the exact-float re-rank shares the brute-force expression tree
      brute.get(key).foreach(c => assert(c == r.getDouble(4), s"cos drift $key"))
    }
    // knnIvf = exact ranking over the SAME candidate set (same buckets,
    // same probes), so it is the recall ceiling for both ADC scans;
    // per-query overlap with it isolates shortlist quality. The PQ scan
    // reads 8 B/vector vs scalar ADC's 64 B; asymmetric scoring + the
    // deeper PqShortK shortlist must keep recall at least on par.
    val ivf = Knn.knnIvf(embs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .map { case (q, ns) => q -> ns.map(_._2).toSet }
    def overlap(rows: Array[org.apache.spark.sql.Row]): Int =
      rows.map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
        .map { case (q, ns) => ns.map(_._2).toSet.intersect(ivf(q)).size }.sum
    val pqHits = overlap(pq)
    val adcHits = overlap(Knn.knnIvfAdc(embs).collect())
    assert(pqHits >= adcHits, s"IVFPQ recall $pqHits < scalar-ADC recall $adcHits (of ${ivf.values.map(_.size).sum})")
  }

  test("curation funnel agrees stage-by-stage with the standalone operators") {
    import graft.pipeline.Curation
    val out = Curation.curatePipeline(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == docs.count())
    // keep is exactly the stage product
    out.values.foreach { case (q, d, c, k) => assert(k == q * d * c) }
    // every eval doc (id % 53 == 0) is dropped by decontam
    out.foreach { case (id, (_, _, c, _)) => if (id % 53 == 0) assert(c == 0L) }
    // dedup verdicts match the standalone keep-list
    val keepIds = Dedup.dedupExact(docs).collect().map(_.getLong(1)).toSet
    out.foreach { case (id, (_, d, _, _)) =>
      assert((d == 1L) == keepIds.contains(id), s"dedup verdict drift for doc $id")
    }
    // quality verdicts match the standalone repetition filter where defined
    val rep = TextAnalysis.docRepetition(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    out.foreach { case (id, (q, _, _, _)) =>
      assert(q == rep.getOrElse(id, 1L), s"quality verdict drift for doc $id")
    }
  }

  test("domain mixture: shares normalize, harder domains upweight, baseline is the pooled mean") {
    import graft.pipeline.Curation
    val out = Curation.domainMixture(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    // the baseline is the bigram-weighted pooled mean: excess must be a
    // mix of signs (or all zero), never uniformly positive/negative
    val ex = out.map(_._5)
    assert(ex.exists(_ <= 0) && ex.exists(_ >= 0))
    // w = exp(excess): monotone in excess, and w(0 excess) = MixScale
    val sorted = out.sortBy(_._5)
    assert(sorted.map(_._6).toSeq == sorted.map(_._6).sorted.toSeq)
    out.filter(_._5 == 0L).foreach { d => assert(d._6 == Curation.MixScale) }
    // shares renormalize n_docs * w: sum within integral-truncation slack
    // (each domain truncates < 1 unit)
    val shareSum = out.map(_._7).sum
    assert(shareSum <= Curation.MixScale &&
      shareSum > Curation.MixScale - out.length,
      s"shares sum to $shareSum, expected ~${Curation.MixScale}")
    // upweighted domains gain share vs their natural share, downweighted lose
    val nTotal = out.map(_._2).sum
    out.foreach { case (dom, nDocs, _, _, excess, _, share) =>
      val natural = nDocs.toDouble / nTotal * Curation.MixScale
      if (excess > 0) assert(share > natural - 1, s"$dom should gain share")
      if (excess < 0) assert(share < natural + 1, s"$dom should lose share")
    }
  }

  test("mixture temperature: natural shares at alpha=1, flattening toward uniform as alpha drops") {
    import graft.pipeline.Curation
    val out = Curation.mixtureTemperature(docs).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    val nSources = docs.select(coalesce(col("source"), lit(""))).distinct().count()
    assert(out.length == 3 * nSources)
    val byAlpha = out.groupBy(_._1)
    assert(byAlpha.keySet == Curation.TempAlphas.toSet)
    byAlpha.foreach { case (a, rows) =>
      // shares sum to 1 within per-source rounding slack
      assert(math.abs(rows.map(_._5).sum - 1.0) < rows.length.toDouble / Curation.TempScale)
      // allocation never exceeds the budget, upsample = target/n exactly
      assert(rows.map(_._6).sum <= Curation.TempBudget)
      rows.foreach { r => assert(r._7 == r._6.toDouble / r._3) }
      // alpha=1 is the natural mixture: share tracks n/N
      if (a == 1.0) {
        val nTotal = rows.map(_._3).sum
        rows.foreach { r =>
          assert(math.abs(r._5 - r._3.toDouble / nTotal) < 1e-6,
            s"natural share drift for ${r._2}")
        }
      }
    }
    // temperature flattens: the largest source loses share as alpha drops,
    // the smallest gains (strictly, unless the mixture is already uniform)
    val big = out.filter(_._3 == out.map(_._3).max).groupBy(_._1).map { case (a, r) => a -> r.head._5 }
    val small = out.filter(_._3 == out.map(_._3).min).groupBy(_._1).map { case (a, r) => a -> r.head._5 }
    if (out.map(_._3).distinct.length > 1) {
      assert(big(0.3) < big(0.7) && big(0.7) < big(1.0), s"largest source should lose share: $big")
      assert(small(0.3) > small(0.7) && small(0.7) > small(1.0), s"smallest source should gain share: $small")
    }
  }

  test("PCA driver power iteration: truncating integer rounds on a known matrix") {
    // diagonal-dominant moment matrix: iteration must converge to the
    // dominant axis at max-norm PcaScale, every division truncating toward
    // zero (the Spark-div / DuckDB-// semantics the oracle rounds use)
    val dim = 64
    val cells = new Array[Long](dim * dim)
    for (i <- 0 until dim) cells(i * dim + i) = 1000L + i
    cells(63 * dim + 63) = 100000L                         // axis 63 strongly dominant
    cells(0 * dim + 63) = -7L; cells(63 * dim + 0) = -7L   // negative cell: trunc-to-zero path
    val v = graft.pipeline.Knn.pcaPowerIterate(cells)
    assert(v.length == dim)
    assert(v.indexOf(v.maxBy(math.abs)) == 63, "dominant axis wins the iteration")
    // hand-rolled mirror of the unrolled rounds (independent arithmetic)
    var e = Array.fill(dim)(1000000L)
    val md = cells.map(math.abs).max
    val ms = cells.map(_ / math.max(1L, md / 1000000000L))
    for (_ <- 1 to 8) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => ms(i * dim + j) * e(j)).sum)
      val wm = w.map(math.abs).max
      e = w.map(_ / math.max(1L, wm / 1000000L))
    }
    assert(v.toSeq == e.toSeq)
  }

  test("embedding PCA: deterministic, max-norm 1e6, Rayleigh beats every basis axis") {
    val v = Knn.embeddingPca(embs).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(v.length == 64 && v.map(_._1).toSeq == (1L to 64L))
    // renormalized to max-norm PcaScale
    assert(v.map(x => math.abs(x._2)).max == 1000000L)
    // deterministic across runs (fixed-point integer arithmetic)
    val again = Knn.embeddingPca(embs).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(v.toSeq == again.toSeq)
    // power iteration found a direction whose Rayleigh quotient on the
    // real-valued second moment beats every coordinate axis
    val X = embs.selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = 64
    val M = Array.ofDim[Double](d, d)
    for (x <- X; i <- 0 until d; j <- 0 until d) M(i)(j) += x(i) * x(j)
    val vec = v.map(_._2.toDouble)
    def rayleigh(u: Array[Double]): Double = {
      val mu = Array.tabulate(d)(i => (0 until d).map(j => M(i)(j) * u(j)).sum)
      (0 until d).map(i => u(i) * mu(i)).sum / (0 until d).map(i => u(i) * u(i)).sum
    }
    val rv = rayleigh(vec)
    (0 until d).foreach { i =>
      val e = Array.fill(d)(0.0); e(i) = 1.0
      assert(rv >= rayleigh(e) - 1e-6, s"axis $i beats the PCA direction")
    }
  }

  test("quantized knn: re-rank cosines agree bit-exactly with brute force") {
    val brute = Knn.knnBruteForce(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val quant = Knn.knnQuantized(embs).collect()
    assert(quant.length == 80) // 8 queries x K=10, ranks total
    quant.foreach { r =>
      val (q, rank, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(rank >= 1 && rank <= 10)
      // wherever a (query, neighbor) pair also appears in the exact top-k,
      // the re-ranked cosine must be the identical double
      brute.get((q, n)).foreach(c => assert(c == r.getDouble(4), s"cos drift for ($q,$n)"))
    }
    // shortlist recall: quantized top-1 should usually be the exact top-1
    val bruteTop1 = Knn.knnBruteForce(embs).filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val qTop1 = quant.filter(_.getLong(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = qTop1.count { case (q, n) => bruteTop1(q) == n }
    assert(hits >= 4, s"quantized top-1 recall collapsed: $hits/8")
  }

  test("bm25: hand-computed scores on a fixture; corpus ranks contiguous and monotone") {
    import spark.implicits._
    // df(spark)=2, df(dup)=1, N=3, dl=(2,2,3), avgdl=7/3
    val fx = Seq(
      (1L, "spark dup"), (2L, "spark spark"), (3L, "other other other")
    ).toDF("doc_id", "text")
    val got = graft.pipeline.Search.bm25Search(fx).collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2), r.getLong(3))).toMap
    def w(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log(1.0 + (3L - df + 0.5) / (df + 0.5))
      val den = tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (7.0 / 3)))
      math.round(idf * (tf * 2.2) / den * 1000000).toLong
    }
    assert(got.keySet == Set(1L, 2L)) // doc 3 matches no query term
    assert(got(1L)._2 == 2 && got(2L)._2 == 1) // terms matched
    assert(got(1L)._3 == w(1, 2, 2) + w(1, 1, 2), "doc 1 score")
    assert(got(2L)._3 == w(2, 2, 2), "doc 2 score")
    // rare term dominates: doc 1 (spark+dup) outranks doc 2 (spark twice)
    assert(got(1L)._1 == 1 && got(2L)._1 == 2)
    // corpus invariants
    val corpus = graft.pipeline.Search.bm25Search(docs).collect()
    assert(corpus.map(_.getLong(0)).toSeq == (1L to corpus.length))
    val ss = corpus.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(ss.zip(ss.drop(1)).forall { case (a, b) => a >= b }, "scores not monotone in rank")
  }

  test("bpe merge apply: greedy overlap semantics on fixtures, pair election ties") {
    import spark.implicits._
    // top pair is "aa" (cnt 4); "aaa" merges to (aa)(a) — greedy, not a(aa)
    val fx1 = Seq((1L, "aaa aaa"), (2L, "ab")).toDF("doc_id", "text")
    val got1 = TextAnalysis.bpeMergeApply(fx1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got1.toSeq == Seq((1L, "aa", "a", 2L), (2L, "a", "b", 1L)), got1.mkString(","))
    // even-length run: "aaaa" -> (aa)(aa)
    val fx2 = Seq((1L, "aaaa aaaa aax")).toDF("doc_id", "text")
    val got2 = TextAnalysis.bpeMergeApply(fx2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got2.contains((1L, "aa", "aa", 2L)), got2.mkString(","))
    assert(got2.contains((2L, "aa", "x", 1L)), got2.mkString(","))
    // non-overlapping alternation: "abab" under merge (a,b) -> (ab)(ab)
    val fx3 = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val got3 = TextAnalysis.bpeMergeApply(fx3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got3.toSeq == Seq((1L, "ab", "ab", 2L)), got3.mkString(","))
  }

  test("embedding outliers: ascending-cosine prefix of the full assignment") {
    val out = Knn.embeddingOutliers(embs).collect()
    assert(out.length == 20)
    val cs = out.sortBy(_.getLong(0)).map(_.getDouble(3))
    assert(cs.zip(cs.drop(1)).forall { case (a, b) => a <= b }, "cosines not ascending")
    // the outlier threshold (max reported cosine) bounds the prefix: no
    // vector outside the report may sit strictly below it
    val thr = cs.last
    val below = Knn.topicClusters(embs) // same trained assignment, cluster sizes
    // recompute assignment cosines via the IVF assign path is indirect;
    // instead assert the report's clusters exist in the assignment
    val clusters = below.collect().map(_.getLong(0)).toSet
    assert(out.forall(r => clusters.contains(r.getLong(2))))
    assert(thr < 1.0)
  }

  test("retention cohorts: offset-0 rows anchor, counts bounded by cohort size") {
    val rows = EventWindows.retentionCohorts(events).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (c, rs) =>
      val base = rs.find(_.getLong(1) == 0L)
      assert(base.isDefined, s"cohort $c missing offset 0")
      val n0 = base.get.getLong(2)
      rs.foreach { r =>
        assert(r.getLong(2) <= n0, s"cohort $c offset ${r.getLong(1)} exceeds base")
        assert(r.getDouble(3) == r.getLong(2).toDouble / n0)
      }
      assert(base.get.getDouble(3) == 1.0)
    }
    // every user is in exactly one cohort: offset-0 totals == distinct users
    val users = events.select(col("user_id")).distinct().count()
    assert(byCohort.values.map(_.find(_.getLong(1) == 0L).get.getLong(2)).sum == users)
  }

  test("event funnel: strict first-touch chaining on a fixture; corpus counts monotone") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(h: Long) = new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600000L)
    val fx = Seq(
      (1L, t(0), "view"), (1L, t(2), "click"), (1L, t(30), "purchase"), // gap 28h > 24h: stops at click
      (2L, t(0), "view"), (2L, t(1), "click"), (2L, t(10), "purchase"), // completes
      (3L, t(0), "click"), // no anchoring view
      (4L, t(0), "view"), (4L, t(1), "purchase"), (4L, t(2), "click") // purchase precedes click
    ).toDF("user_id", "ts", "event_type")
    val got = EventWindows.eventFunnel(fx).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 3L), (3L, "purchase", 1L)),
      got.mkString(","))
    // corpus: counts non-increasing, rates in (0,1], rate chain consistent
    val corpus = EventWindows.eventFunnel(events).collect()
    val ns = corpus.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(ns.zip(ns.drop(1)).forall { case (a, b) => a >= b })
    corpus.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("bpe train: merges compound across rounds; exhausted corpus stops electing") {
    import spark.implicits._
    // "abc"x3: round 1 elects (a,b) (ties to lexicographic first), round 2
    // merges the COMPOUND pair (ab,c); rounds 3-4 have nothing to elect
    val fx = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(fx).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "b", 3L), (2L, "ab", "c", 3L)), got.mkString(","))
    // corpus: every round elects a positive-count pair, rounds contiguous
    val corpus = TextAnalysis.bpeTrain(docs).collect()
    assert(corpus.map(_.getLong(0)).toSeq == (1L to TextAnalysis.BpeTrainRounds))
    assert(corpus.forall(_.getLong(3) > 0))
    // round 1's election agrees with the standalone pair statistic
    val firstPair = TextAnalysis.bpePairs(docs).filter(col("pair_rank") === 1)
      .collect().map(r => r.getString(1)).head
    assert(corpus.head.getString(1) + corpus.head.getString(2) == firstPair)
  }

  test("bpe encode: compression accounting against the trained merge table") {
    import spark.implicits._
    // "abc"x3 compresses to one symbol per token after the two merges
    val fx = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 9L, 3L, 3.0 / 9)), got.mkString(","))
    // corpus: every ratio <= 1; chars removed == merges applied, bounded
    // by the elected pair counts (overlaps can only reduce applications)
    val enc = TextAnalysis.bpeEncode(docs).collect()
    enc.foreach(r => assert(r.getLong(2) <= r.getLong(1) && r.getDouble(3) <= 1.0))
    val removed = enc.map(r => r.getLong(1) - r.getLong(2)).sum
    val electedTotal = TextAnalysis.bpeTrain(docs).collect().map(_.getLong(3)).sum
    assert(removed > 0 && removed <= electedTotal,
      s"removed $removed outside (0, $electedTotal]")
  }

  test("ccnet buckets: tertile partition is monotone in score and conserves docs") {
    val b = TextAnalysis.ccnetBuckets(docs).collect()
    val scored = TextAnalysis.docLmScore(docs).collect()
    assert(b.length == scored.length) // same population: docs with >= 1 bigram
    val byBucket = b.groupBy(_.getString(4)).view.mapValues(_.map(_.getLong(3))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // every head score <= every middle score <= every tail score
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // tertiles: head holds at least a third minus ties, never the majority+
    val n = b.length
    assert(byBucket("head").length * 3 >= n - byBucket("head").length * 2,
      "head smaller than a tie-adjusted tertile")
    // equal scores always share a bucket
    b.groupBy(_.getLong(3)).foreach { case (s, rows) =>
      assert(rows.map(_.getString(4)).toSet.size == 1, s"score $s split across buckets")
    }
  }

  test("knn recall: matches a hand-joined exact/ivf intersection, bounded in [0,1]") {
    val exact = Knn.knnBruteForce(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Knn.knnIvf(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rec = Knn.knnRecall(embs).collect()
    assert(rec.length == 8) // one row per query
    rec.foreach { r =>
      val (q, hits, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val expected = exact.count(p => p._1 == q && approx(p))
      assert(hits == expected, s"query $q: $hits != hand-counted $expected")
      assert(recall == hits.toDouble / 10)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // the IVF index must not be useless on this corpus
    assert(rec.map(_.getLong(1)).sum > 0, "zero recall across all queries")
  }

  test("similar docs: rows come from the verified pair relation, ranked correctly") {
    val pairs = Dedup.dedupMinhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val sim = Dedup.similarDocs(docs).collect()
    assert(sim.nonEmpty)
    // ranks are 1..k contiguous per doc, jaccard non-increasing
    sim.groupBy(_.getLong(0)).foreach { case (d, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq, s"ranks not contiguous for $d")
      val js = byRank.map(_.getDouble(4))
      assert(js.zip(js.drop(1)).forall { case (a, b) => a >= b }, s"jaccard not monotone for $d")
      assert(byRank.length <= Dedup.SimilarTopK)
    }
    // every above-threshold dedup pair must be retrievable from BOTH ends
    // (top-k may evict only when a doc has more than k neighbors)
    val simSet = sim.map(r => (r.getLong(0), r.getLong(2))).toSet
    val perDoc = sim.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    pairs.keys.foreach { case (a, b) =>
      assert(simSet((a, b)) || perDoc.getOrElse(a, 0) == Dedup.SimilarTopK,
        s"pair ($a,$b) missing from $a's non-full neighbor list")
      assert(simSet((b, a)) || perDoc.getOrElse(b, 0) == Dedup.SimilarTopK,
        s"pair ($a,$b) missing from $b's non-full neighbor list")
    }
  }

  test("containment dedup: identical docs fully contained; bounds and side-tagging hold") {
    import spark.implicits._
    val fx = Seq(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "zz yy xx ww vv uu tt ss rr qq")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupContainment(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 1.0, 1L)), got.mkString(","))
    // corpus invariants: containment within [threshold, 1]; contained side
    // is the one with the smaller (or equal) shingle set
    val corpus = Dedup.dedupContainment(docs).collect()
    corpus.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= 0.9 && c <= 1.0 + 1e-12, s"containment $c out of range")
      assert(r.getLong(4) == r.getLong(0) || r.getLong(4) == r.getLong(1))
    }
    // containment >= jaccard on every dedup pair (set identity)
    val jac = Dedup.dedupMinhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    corpus.foreach { r =>
      jac.get((r.getLong(0), r.getLong(1)))
        .foreach(j => assert(r.getDouble(3) >= j - 1e-12))
    }
  }

  test("source dup rates: conserve docs and casualties against the cluster keep-list") {
    val clusters = Dedup.dedupClusters(docs).collect()
    val rates = Dedup.sourceDupRates(docs).collect()
    assert(rates.map(_.getLong(1)).sum == clusters.length, "docs not conserved")
    assert(rates.map(_.getLong(2)).sum == clusters.count(_.getLong(2) == 0L),
      "dups not conserved")
    rates.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == r.getLong(2).toDouble / r.getLong(1))
    }
  }

  test("topic purity: consistent with topicClusters, entropy zero iff pure") {
    val clusters = Knn.topicClusters(embs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val purity = Knn.topicPurity(embs).collect()
    assert(purity.map(_.getLong(0)).toSet == clusters.keySet)
    purity.foreach { r =>
      val (c, nVecs, nTop, p, entFp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      val (cnVecs, nLabels, cnTop) = clusters(c)
      assert(nVecs == cnVecs && nTop == cnTop)
      assert(p == nTop.toDouble / nVecs)
      assert(p > 0.0 && p <= 1.0)
      // a single-label cluster has zero entropy; a mixed one positive
      if (nLabels == 1) assert(entFp == 0L, s"pure cluster $c has ent_fp=$entFp")
      else assert(entFp > 0L, s"mixed cluster $c has ent_fp=$entFp")
    }
    // vectors are conserved across clusters
    assert(purity.map(_.getLong(1)).sum == embs.count())
  }

  test("graph stats: driver-replicated wedges/triangles/gcc from the pair list") {
    val edges = Dedup.dedupMinhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val stats = Dedup.dedupGraphStats(docs).collect()
    assert(stats.length == 1)
    val r = stats.head
    val (nNodes, nEdges, nWedges, nTri, gcc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val vertices = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
    val degrees = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val edgeSet = edges.toSet
    val expTri = (for {
      ((a1, b1), i) <- edges.zipWithIndex
      (a2, b2) <- edges.drop(i + 1)
      if a1 == a2 && b1 != b2
    } yield if (edgeSet.contains(if (b1 < b2) (b1, b2) else (b2, b1))) 1L else 0L).sum
    assert(nNodes == vertices.size)
    assert(nEdges == edges.length)
    assert(nWedges == degrees.values.map(d => d * (d - 1) / 2).sum)
    assert(nTri == expTri)
    assert(gcc == (if (nWedges > 0) 3 * nTri * 1000000L / nWedges else 0L))
    assert(gcc >= 0L && gcc <= 1000000L)
  }

  test("graph stats: factorized == naive join form == driver math on a dup-dense blow-up") {
    import spark.implicits._
    // rep-level triangle (a,b,c mutually near-dup) with groups of size
    // 3/2/2, plus an isolated duplicated group (clique only, size 3), plus
    // a singleton near a (gsz=1 cross) — exercises every factorization
    // term: C(g,3) cliques, C(g,2)·g' bipartite wedge-triangles, and
    // g·g'·g'' rep triangles
    val a = "alpha beta gamma delta epsilon zeta eta theta iota"
    val b = "alpha beta gamma delta epsilon zeta eta theta kappa"
    val c = "alpha beta gamma delta epsilon zeta eta theta lambda"
    val e = "alpha beta gamma delta epsilon zeta eta theta mu"
    val d = "totally unrelated boilerplate words repeated in every copy here"
    val docs = Seq(1L -> a, 4L -> a, 8L -> a, 2L -> b, 6L -> b,
      3L -> c, 7L -> c, 30L -> d, 31L -> d, 32L -> d, 40L -> e)
      .toDF("doc_id", "text")
    val fact = Dedup.dedupGraphStats(docs).collect().head
    val legacy = Dedup.dedupGraphStatsLegacy(docs).collect().head
    assert(fact == legacy, s"factorized $fact != naive $legacy")
    // independent driver math from the actual pair list
    val edges = Dedup.dedupMinhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val degrees = edges.flatMap { case (x, y) => Seq(x, y) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val edgeSet = edges.toSet
    val expTri = (for {
      ((a1, b1), i) <- edges.zipWithIndex
      (a2, b2) <- edges.drop(i + 1)
      if a1 == a2 && b1 != b2
    } yield if (edgeSet.contains(if (b1 < b2) (b1, b2) else (b2, b1))) 1L else 0L).sum
    assert(fact.getLong(0) == degrees.size)
    assert(fact.getLong(1) == edges.length)
    assert(fact.getLong(2) == degrees.values.map(x => x * (x - 1) / 2).sum)
    assert(fact.getLong(3) == expTri, s"triangles ${fact.getLong(3)} != $expTri")
    // the fixture must actually exercise the clique and cross terms
    assert(expTri > 0 && edges.exists { case (x, y) => Set(30L, 31L, 32L)(x) && Set(30L, 31L, 32L)(y) })
  }

  test("winnowing: full driver replication (hashes, rightmost-min selection, digest)") {
    import java.security.MessageDigest
    def md5Long(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val k = TextAnalysis.WinnowK
    val w = TextAnalysis.WinnowW
    def winnow(text: String): (Long, Long, Long) = {
      val hs = (0 to text.length - k).map(i => md5Long(text.substring(i, i + k)))
      val sel =
        if (hs.isEmpty) Seq.empty[Int]
        else if (hs.size < w) {
          val m = hs.min; Seq(hs.lastIndexOf(m))
        } else
          (0 to hs.size - w).map { s =>
            val m = hs.slice(s, s + w).min
            s + hs.slice(s, s + w).lastIndexOf(m)
          }.distinct.sorted
      val fp = sel.map(p => s"${p + 1}:${hs(p)}").mkString(",")
      (hs.size.toLong, sel.size.toLong, md5Long(fp))
    }
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis.docWinnow(docs).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val (id, ng, ns, fh) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert((ng, ns, fh) == winnow(texts(id)), s"winnow mismatch doc $id")
      // winnowing guarantees: one fingerprint per window, each covering <= w windows
      if (ng >= w) {
        val windows = ng - w + 1
        assert(ns <= windows && ns * w >= windows)
      }
    }
  }

  test("inverted index: driver-replicated postings stats; token mass conserved") {
    val occ = docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byTerm = occ.groupBy(_._2)
    val out = graft.pipeline.Search.invertedIndex(docs).collect()
    assert(out.map(_.getString(0)).toSet == byTerm.keySet)
    out.foreach { r =>
      val (term, df, tf, fd, ld) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val mine = byTerm(term)
      assert(df == mine.map(_._1).distinct.size.toLong)
      assert(tf == mine.size.toLong)
      assert(fd == mine.map(_._1).min && ld == mine.map(_._1).max)
    }
    assert(out.map(_.getLong(2)).sum == occ.length.toLong)
  }

  test("keep-best rule: one keeper per cluster, keeper maximizes quality") {
    val clusters = Dedup.dedupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = TextAnalysis.textStats(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    val out = Dedup.dedupKeepBest(docs).collect()
    assert(out.map(_.getLong(0)).toSet == clusters.keySet) // same doc set
    out.foreach(r => assert(r.getLong(1) == clusters(r.getLong(0)))) // same clusters
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rows) =>
      val keepers = rows.filter(_.getLong(3) == 1L)
      assert(keepers.length == 1, s"cluster $c has ${keepers.length} keepers")
      val best = rows.map(r => (quality(r.getLong(0)), -r.getLong(0))).max
      assert((quality(keepers.head.getLong(0)), -keepers.head.getLong(0)) == best)
    }
    // the three keep rules agree on cluster structure, not necessarily keepers
    assert(byCluster.keySet == clusters.values.toSet)
  }

  test("ball query: thresholded subset of the IVF candidate scores") {
    val out = Knn.ballQuery(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.forall(_._3 >= 0.3))
    assert(out.forall(_._1 < 8))
    assert(out.map(p => (p._1, p._2)).distinct.length == out.length)
    // same candidate set as knnIvf: every top-K hit above tau is in the ball
    val ivf = Knn.knnIvf(embs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val ballSet = out.map(p => (p._1, p._2)).toSet
    ivf.filter(_._3 >= 0.3).foreach { case (q, n, _) =>
      assert(ballSet.contains((q, n)), s"ivf hit ($q,$n) missing from ball")
    }
    assert(out.nonEmpty)
  }

  test("backoff LM: hand-computed trigram/bigram/unigram paths; training docs all hit3") {
    import spark.implicits._
    def lnFp(x: Long) = math.round(math.log(x.toDouble) * TextAnalysis.LmScale)
    val k = TextAnalysis.BackoffFp
    // training half = even ids: doc 0 only. trigrams: (a,b,c)x2,(b,c,a),(c,a,b)
    // bigrams: (a,b)x2,(b,c)x2,(c,a); unigrams: a:2,b:2,c:2 -> N+V = 6+3 = 9
    val fixture = Seq((0L, "a b c a b c"), (1L, "a b c"), (3L, "b c a"),
      (5L, "x b c"), (7L, "z z q"), (9L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.docLmBackoff(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(0L) == ((4L, 4L, 0L,
      2 * (lnFp(2) - lnFp(2)) + (lnFp(1) - lnFp(1)) * 2)))
    assert(out(1L) == ((1L, 1L, 0L, lnFp(2) - lnFp(2)))) // c12(a,b)=2, c123=2
    assert(out(3L) == ((1L, 1L, 0L, lnFp(1) - lnFp(1)))) // (b,c,a): c12(b,c)=2? no - c12 from tri2
    assert(out(5L) == ((1L, 0L, 1L, k + lnFp(2) - lnFp(2)))) // bigram (b,c) path
    assert(out(7L) == ((1L, 0L, 0L, 2 * k + lnFp(9) - lnFp(1)))) // unigram path, c3(q)=0
    assert(!out.contains(9L)) // <3 tokens -> no trigrams
    // corpus: every training (even-id) doc scores entirely via hit3
    val full = TextAnalysis.docLmBackoff(docs).collect()
    full.filter(_.getLong(0) % 2 == 0).foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"training doc ${r.getLong(0)} backed off")
    }
    // hit counts partition correctly
    full.foreach(r => assert(r.getLong(2) + r.getLong(3) <= r.getLong(1)))
    assert(full.exists(r => r.getLong(2) + r.getLong(3) < r.getLong(1)),
      "no unigram backoff ever fired on the held-out half")
  }

  test("doc pmi score: bigram mass conserved; scores decompose through the model") {
    val model = TextAnalysis.termPmi(docs) // hash-green top slice, for spot checks
    val out = TextAnalysis.docPmiScore(docs).collect()
    // every doc with >= 2 tokens scores; bigram mass conserves
    val nBigrams = docs.select(sum(greatest(
      size(TextAnalysis.tokens(col("text"))) - 1, lit(0)))).head.getLong(0)
    assert(out.map(_.getLong(1)).sum == nBigrams)
    assert(out.length == docs.filter(size(TextAnalysis.tokens(col("text"))) >= 2).count())
    // driver replication on a small slice: rebuild the full model in Scala
    val bigrams = docs.select(col("doc_id"),
        explode(TextAnalysis.bigramArray(col("text"))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lnFp(x: Long) = math.round(math.log(x.toDouble) * TextAnalysis.PmiScale)
    val c12 = bigrams.groupBy(p => (p._2, p._3)).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val r2 = bigrams.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val n = bigrams.length.toLong
    val expect = bigrams.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.map { case (_, w1, w2) =>
        lnFp(c12((w1, w2))) + lnFp(n) - lnFp(c1(w1)) - lnFp(r2(w2))
      }.sum)
    }.toMap
    out.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == expect(r.getLong(0)),
        s"pmi score mismatch doc ${r.getLong(0)}")
    }
    assert(model.count() > 0)
  }

  test("postings delta stats: driver-replicated gap bits per term") {
    import graft.pipeline.Search
    val occ = docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val postings = occ.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val out = Search.postingsDeltaStats(docs).collect()
    assert(out.map(_.getString(0)).toSet == postings.keySet)
    out.foreach { r =>
      val ds = postings(r.getString(0))
      val gaps = (ds.head + 1) +: ds.sliding(2).filter(_.length == 2).map(w => w(1) - w(0)).toSeq
      val bits = gaps.map(g => java.lang.Long.toBinaryString(g).length.toLong).sum
      assert(r.getLong(1) == ds.size.toLong)
      assert(r.getLong(2) == bits, s"delta_bits(${r.getString(0)})")
      assert(r.getLong(3) == ds.size.toLong * 64)
      assert(r.getLong(4) == bits * 1000000L / (ds.size * 64))
      assert(r.getLong(4) <= 1000000L) // delta bits never exceed the flat 64-bit cost
    }
  }

  test("user path transitions: driver-replicated counts; rows normalize per prev") {
    val ev = Tables.events(spark, sf())
    val seqs = ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3)).map(_._4).toSeq).toMap
    val pairs = seqs.values.flatMap(s => s.zip(s.tail)).toSeq
    val expect = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = EventWindows.userPathTransitions(ev).collect()
    assert(out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap == expect)
    // per-prev rows: counts sum to the prev total, p_ppm = n*1e6 div tot
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      rows.foreach(r => assert(r.getLong(3) == r.getLong(2) * 1000000L / tot))
    }
  }

  test("search eval: driver-replicated NDCG from the graded ranking") {
    import graft.pipeline.Search
    val rels = docs.select(col("doc_id"),
      size(array_intersect(array_distinct(TextAnalysis.tokens(col("text"))),
        array(lit("spark"), lit("query"), lit("dup")))).cast("long").as("rel"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranked = Search.bm25Search(docs).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))) // (rank, doc_id)
    val d = Search.NdcgDiscounts
    val dcg = ranked.map { case (rank, id) => rels(id) * d(rank - 1) }.sum
    val idcg = rels.values.toSeq.sortBy(-_).take(10)
      .zipWithIndex.map { case (rel, i) => rel * d(i) }.sum
    val out = Search.searchEval(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == dcg && r.getLong(1) == idcg)
    assert(r.getLong(2) == (if (idcg > 0) dcg * 1000000L / idcg else 0L))
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
    assert(r.getLong(3) == ranked.length.toLong)
  }

  test("salted join agg: row-identical to the plain join; salt fans the small side") {
    import graft.ops.Skew
    val d = sf()
    val (ev, cust, nat) =
      (Tables.events(spark, d), Tables.customer(spark, d), Tables.nation(spark, d))
    val out = Skew.saltedJoinAgg(ev, cust, nat).collect()
    val plain = ev.select(col("user_id"), graft.C.dec(col("value")).as("v"))
      .join(cust, col("user_id") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).cast("double").as("total_value"))
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      == plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet)
    assert(out.nonEmpty)
  }

  test("q5: equals an independently-built plain join; only ASIA nations appear") {
    import graft.ops.Tpch
    val d = sf()
    val out = Tpch.q5RegionRevenue(Tables.customer(spark, d), Tables.orders(spark, d),
      Tables.lineitem(spark, d), Tables.supplier(spark, d),
      Tables.nation(spark, d), Tables.region(spark, d)).collect()
    // independent rebuild: one naive join chain, no hints, same predicates
    val plain = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(spark, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA"
        && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(graft.C.dec(col("l_extendedprice"))
        * (lit(1).cast(org.apache.spark.sql.types.DecimalType(18, 2))
          - graft.C.dec(col("l_discount")))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      == plain.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet)
    val asia = Tables.nation(spark, d)
      .join(Tables.region(spark, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name")).collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).toSet.subsetOf(asia) && out.nonEmpty)
  }

  test("html extraction: hand-cleaned fixture; wrap/extract round-trips the corpus") {
    import spark.implicits._
    val page = (1L,
      """<html><head><title>T</title><style>p { color: red }</style>
        |<script>if (x < 3) alert("&");</script></head><body>
        |<nav><a href="/">Home</a></nav>
        |<h2>Tiny head</h2>
        |<p>The first real paragraph of body text, well over the length cut.</p>
        |<p>Messy   spacing &amp; a <b>bold</b> word plus an <a href="/i">inline link</a> kept fine.</p>
        |<div class="ads"><a href="/b1">Buy this one</a> <a href="/b2">And also this other one</a> <a href="/b3">And a third thing here</a></div>
        |<footer>(c) site</footer></body></html>""".stripMargin)
    val out = TextAnalysis.htmlExtract(Seq(page).toDF("doc_id", "html")).collect()(0)
    // kept: the two real paragraphs (the second despite one inline link);
    // dropped: title/nav/headline/footer (short), ad block (link-dense),
    // script/style content (removed with their tags), entity decoded
    assert(out.getAs[String]("clean_text") ==
      "The first real paragraph of body text, well over the length cut. " +
        "Messy spacing & a bold word plus an inline link kept fine.")
    assert(out.getAs[Long]("n_kept") == 2L)
    assert(out.getAs[Long]("n_blocks") == 7L) // title nav h2 p p ads footer
    // corpus round-trip: wrap escapes & < > and extraction decodes them.
    // The wrap plants a keyword-stuffed SEO block (long, link-free, zero
    // stopwords) that ONLY the stopword axis can reject — base extraction
    // keeps it (junk rides along), the axis drops it (perfect round-trip).
    val kw = "WIDGET GADGET SPROCKET FLANGE DONGLE BRACKET CATALOG"
    val rt = TextAnalysis.htmlExtract(TextAnalysis.htmlWrap(docs))
      .join(docs.select(col("doc_id"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("norm")), "doc_id")
    assert(rt.filter(length(col("norm")) >= 25 &&
      col("clean_text") =!= concat(col("norm"), lit(" " + kw))).count() == 0)
    assert(rt.filter(length(col("norm")) < 25 &&
      col("clean_text") =!= kw).count() == 0)
    // stopword axis on: the planted block flips to dropped everywhere;
    // prose blocks (those carrying a bare stopword token) survive intact
    val stop = Seq("the", "a", "of", "and", "or", "in", "on", "is")
    val hasStop = size(filter(split(lower(col("norm")), " "),
      t => t.isin(stop.map(lit): _*))) >= 1
    val rts = TextAnalysis.htmlExtract(TextAnalysis.htmlWrap(docs), stopwordAxis = true)
      .join(docs.select(col("doc_id"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("norm")), "doc_id")
    assert(rts.filter(col("clean_text").contains("WIDGET")).count() == 0)
    assert(rts.filter(length(col("norm")) >= 25 && hasStop &&
      col("clean_text") =!= col("norm")).count() == 0)
    assert(rts.filter((length(col("norm")) < 25 || !hasStop) &&
      col("clean_text") =!= "").count() == 0)
  }

  test("gopher rules: hand-computed battery verdicts; keep is the conjunction") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // all pass
      (2L, "a b"), // fails r_wc (2 words) and r_mwl (mean 1)
      (3L, "the the the the the the the the the the"), // fails r_dup (all dup bigrams)
      (4L, "1 22 333 4444 55555 666666"), // no stopword, no alpha
      (5L, "") // empty: fails r_wc
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1L, 1L, 1L)))
    assert(out(2L) == ((0L, 0L, 1L, 1L, 1L, 0L)))
    assert(out(3L) == ((1L, 1L, 1L, 1L, 0L, 0L)))
    assert(out(4L) == ((1L, 1L, 0L, 0L, 1L, 0L)))
    assert(out(5L) == ((0L, 1L, 0L, 1L, 1L, 0L))) // r_alpha vacuous on empty
    // corpus: total, keep == product of verdicts on every row
    val full = TextAnalysis.gopherRules(docs).collect()
    assert(full.length == docs.count())
    full.foreach { r =>
      assert(r.getLong(7) ==
        r.getLong(2) * r.getLong(3) * r.getLong(4) * r.getLong(5) * r.getLong(6))
    }
  }

  test("event rate anomaly: driver-replicated trailing sums and spike flags") {
    val ev = Tables.events(spark, sf())
    val hourly = ev.groupBy(expr("unix_timestamp(ts) div 3600 * 3600").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val out = EventWindows.eventRateAnomaly(ev).collect()
    assert(out.length == hourly.length)
    out.zipWithIndex.foreach { case (r, i) =>
      val (h, n) = hourly(i)
      assert(r.getLong(0) == h && r.getLong(1) == n)
      val trail = hourly.slice(math.max(0, i - 24), i).map(_._2)
      assert(r.getLong(2) == trail.sum)
      val expectSpike = trail.length == 24 && n * 24 > trail.sum * 2
      assert(r.getLong(3) == (if (expectSpike) 1L else 0L), s"hour $h")
    }
  }

  test("rfm: driver-replicated quintile scores; segments concatenate the digits") {
    val ev = Tables.events(spark, sf())
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), graft.C.epochSec(col("ts")).as("sec"),
        (graft.C.dec(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val refSec = purchases.map(_._2).max
    val per = purchases.groupBy(_._1).map { case (u, es) =>
      (u, (refSec - es.map(_._2).max) / 86400, es.size.toLong, es.map(_._3).sum)
    }.toSeq
    def cuts(vs: Seq[Long]): Seq[Long] = {
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val tot = vs.size.toLong
      val cum = hist.scanLeft((0L, 0L)) { case ((_, c), (v, n)) => (v, c + n) }.tail
      (1 to 4).map(i => cum.find { case (_, c) => c * 5 >= tot * i }.get._1)
    }
    def score(v: Long, cs: Seq[Long]) = 1L + cs.count(v > _)
    val (rc, fc, mc) = (cuts(per.map(_._2)), cuts(per.map(_._3)),
      cuts(per.map(_._4 / 1000)))
    val expect = per.map { case (u, r, f, m) =>
      u -> ((6 - score(r, rc), score(f, fc), score(m / 1000, mc)))
    }.toMap
    val out = EventWindows.rfmSegments(ev).collect()
    assert(out.length == expect.size)
    out.foreach { row =>
      val u = row.getLong(0)
      val (r, f, m) = (row.getLong(4), row.getLong(5), row.getLong(6))
      assert((r, f, m) == expect(u), s"scores mismatch for user $u")
      assert(Seq(r, f, m).forall(s => s >= 1 && s <= 5))
      assert(row.getString(7) == s"$r$f$m")
    }
  }

  test("range join tiers: partitions the purchases; broadcast NLJ plan") {
    import graft.ops.DataOps
    val ev = Tables.events(spark, sf())
    val out = DataOps.rangeJoinTiers(ev)
    val rows = out.collect()
    val purchases = ev.filter(col("event_type") === "purchase")
    // every purchase in exactly one tier: counts and revenue conserve
    assert(rows.map(_.getLong(2)).sum == purchases.count())
    val total = purchases.agg(sum(graft.C.dec(col("value"))).cast("double"))
      .head.getDouble(0)
    assert(math.abs(rows.map(_.getDouble(4)).sum - total) < 1e-6)
    // tier bounds honored: lo ascending, tiers from the configured table
    val los = rows.map(_.getDouble(1))
    assert(los.sorted.sameElements(los))
    assert(rows.map(_.getString(0)).toSet
      .subsetOf(DataOps.ValueTiers.map(_._1).toSet))
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastNestedLoopJoin"), "range join should broadcast-NLJ")
  }

  test("bloom semi-join: equals the plain semi-join; prefilter broadcasts") {
    import graft.ops.DataOps
    val ev = Tables.events(spark, sf())
    val out = DataOps.bloomSemiJoin(ev)
    // ground truth: plain exact semi-join, no bloom stage
    val keys = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= DataOps.BuyerMinPurchases).select(col("user_id"))
    val plain = ev.join(keys, Seq("user_id"), "left_semi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.C.dec(col("value"))).cast("double").as("total_value"))
    assert(out.collect().toSeq.sortBy(_.getLong(0))
      == plain.orderBy(col("user_id")).collect().toSeq)
    // the bucket-set probe must be a broadcast join (that is the point), and
    // it must sit BELOW the exact join — a LeftSemi in the plan means
    // PushDownLeftSemiAntiJoin hoisted the exact stage under the probe,
    // un-doing the prefilter (the regression the inner-join form prevents)
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"), "bloom probe did not broadcast")
    assert(!planStr.contains("LeftSemi"), "exact stage was pushed below the bloom probe")
  }

  test("zorder: driver-replicated interleave; cells partition the event count") {
    import graft.ops.DataOps
    val ev = Tables.events(spark, sf())
    val rows = DataOps.zorderLayout(ev).collect()
    def morton(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    rows.foreach { r =>
      assert(r.getLong(0) == morton(r.getLong(1), r.getLong(2)))
      assert(r.getLong(1) >= 0 && r.getLong(1) < 16 && r.getLong(2) >= 0 && r.getLong(2) < 12)
      assert(r.getLong(4) <= r.getLong(3)) // users <= events per cell
    }
    // zorder is a bijection on (x, y): one row per cell, counts conserve
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.map(_.getLong(3)).sum == ev.count())
  }

  test("zone map prune: driver-replicated skipping arithmetic on real events") {
    import graft.ops.DataOps
    val ev = Tables.events(spark, sf())
    val rows = DataOps.zoneMapPrune(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("ts_day", "value_floor", "type_eq"))
    // driver replica: zone stats + predicate truth from a local pass
    val local = ev.select(col("event_id"), unix_timestamp(col("ts")).as("e"),
      col("value"), col("event_type")).collect()
    val zones = local.groupBy(r => r.getLong(0) / DataOps.ZoneRows)
    def finite(d: Any): Option[Double] = d match {
      case x: java.lang.Double if !x.isNaN && !x.isInfinite => Some(x)
      case _ => None
    }
    val n = local.length.toLong
    // ts_day: zone maybe iff [min,max] overlaps the day; match from rows
    val tsStats = zones.values.map { rs =>
      val es = rs.filterNot(_.isNullAt(1)).map(_.getLong(1))
      val cnt = rs.length.toLong
      val maybe = es.nonEmpty && es.max >= DataOps.ZoneDayLo && es.min < DataOps.ZoneDayHi
      val m = rs.count(r => !r.isNullAt(1) &&
        r.getLong(1) >= DataOps.ZoneDayLo && r.getLong(1) < DataOps.ZoneDayHi).toLong
      (maybe, cnt, m)
    }
    val r1 = rows("ts_day")
    assert(r1.getLong(1) == zones.size.toLong && r1.getLong(3) == n)
    assert(r1.getLong(2) == tsStats.count(_._1).toLong)
    assert(r1.getLong(4) == tsStats.filter(_._1).map(_._2).sum)
    assert(r1.getLong(5) == tsStats.map(_._3).sum)
    assert(r1.getLong(6) == (n - r1.getLong(4)) * 1000000L / n)
    assert(r1.getLong(7) == r1.getLong(4) - r1.getLong(5))
    // invariants across all three predicates: matched <= scanned <= total,
    // scanned zones <= total zones
    rows.values.foreach { r =>
      assert(r.getLong(5) <= r.getLong(4) && r.getLong(4) <= r.getLong(3))
      assert(r.getLong(2) <= r.getLong(1))
    }
    // value_floor honors the finite-or-null contract in stats AND matches
    val vStats = zones.values.map { rs =>
      val vs = rs.flatMap(r => finite(r.get(2)))
      (vs.nonEmpty && vs.max >= DataOps.ZoneValFloor,
        rs.length.toLong,
        rs.count(r => finite(r.get(2)).exists(_ >= DataOps.ZoneValFloor)).toLong)
    }
    val r2 = rows("value_floor")
    assert(r2.getLong(2) == vStats.count(_._1).toLong)
    assert(r2.getLong(5) == vStats.map(_._3).sum)
  }

  test("table profile: driver-replicated per-column stats") {
    import graft.ops.DataOps
    val prof = DataOps.tableProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(prof.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val local = docs.collect()
    val n = local.length.toLong
    def check(name: String, f: org.apache.spark.sql.Row => Any): Unit = {
      val vs = local.map(f).filter(_ != null).map(_.toString)
      val (rN, rNull, rDist, rMin, rMax) = prof(name)
      assert(rN == n && rNull == n - vs.length && rDist == vs.distinct.length.toLong)
      assert(rMin == vs.min && rMax == vs.max)
    }
    check("doc_id", _.getAs[Any]("doc_id"))
    check("text", _.getAs[Any]("text"))
    check("lang", _.getAs[Any]("lang"))
    check("source", _.getAs[Any]("source"))
    check("n_chars", _.getAs[Any]("n_chars"))
  }

  test("quality drift: driver-replicated KS numerators; sources conserved and bounded") {
    // independent replication: per-doc ppl_fp from ccnetBuckets (already
    // hash-checked), KS computed in plain Scala
    val ppl = TextAnalysis.ccnetBuckets(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scored = ppl.toSeq.map { case (id, p) => (srcOf(id), p) }
    val total = scored.size.toLong
    val rows = TextAnalysis.qualityDrift(docs).collect()
    assert(rows.map(_.getString(0)).toSet == scored.map(_._1).toSet)
    val values = scored.map(_._2).distinct.sorted
    rows.foreach { r =>
      val (src, nS, nRest, ksNum, atPpl, dPpm) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val mine = scored.filter(_._1 == src).map(_._2)
      assert(nS == mine.size.toLong && nRest == total - nS)
      val diffs = values.map { v =>
        val cumS = mine.count(_ <= v).toLong
        val cumR = scored.count(p => p._1 != src && p._2 <= v).toLong
        v -> math.abs(cumS * nRest - cumR * nS)
      }
      val expKs = diffs.map(_._2).max
      assert(ksNum == expKs, s"ks_num mismatch for $src")
      assert(atPpl == diffs.filter(_._2 == expKs).map(_._1).min)
      assert(dPpm == ksNum * 1000000L / (nS * nRest))
      assert(dPpm >= 0L && dPpm <= 1000000L)
    }
    // driver fast path == distributed KS plan (measured-cutover A/B):
    // smallHistMax = 0 forces the grid-join + window + argmax-join plan
    val dist = TextAnalysis.qualityDrift(docs, smallHistMax = 0L)
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == dist)
  }

  test("term pmi: hand-computed fixed-point scores; corpus rows ranked and above floor") {
    import spark.implicits._
    def lnFp(x: Long) = math.round(math.log(x.toDouble) * TextAnalysis.PmiScale)
    // bigrams (5+ occurrences to clear PmiMinCount):
    //   "a b" ×6 and "a c" ×6 -> N=12, c(a b)=6, left c1(a)=12,
    //   right r2(b)=6 -> pmi(a,b) = lnFp(6)+lnFp(12)-lnFp(12)-lnFp(6) = 0
    val fixture = Seq.tabulate(6)(i => (i.toLong, "a b")) ++
      Seq.tabulate(6)(i => (10L + i, "a c"))
    val out = TextAnalysis.termPmi(fixture.toDF("doc_id", "text")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("a", "b")) == ((6L, 12L, 6L, 0L)))
    assert(out(("a", "c")) == ((6L, 12L, 6L, 0L)))
    assert(out.size == 2)
    // corpus: every reported pair clears the count floor, scores are
    // non-increasing, and each pmi_fp decomposes into its four ln terms
    val full = TextAnalysis.termPmi(docs).collect()
    assert(full.nonEmpty && full.length <= TextAnalysis.PmiTopK)
    assert(full.forall(_.getLong(2) >= TextAnalysis.PmiMinCount))
    val scores = full.map(_.getLong(5))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val n = docs.select(sum(greatest(
      size(TextAnalysis.tokens(col("text"))) - 1, lit(0))).as("n")).head.getLong(0)
    full.foreach { r =>
      val expect = lnFp(r.getLong(2)) + lnFp(n) - lnFp(r.getLong(3)) - lnFp(r.getLong(4))
      assert(r.getLong(5) == expect, s"pmi_fp mismatch for ${r.getString(0)} ${r.getString(1)}")
    }
  }

  test("vocab growth: cumulative counts monotone, final row is the whole corpus") {
    import spark.implicits._
    // 4 docs over ids 0..3 with GrowthBuckets=10 -> buckets 1,3,6,8 among 10
    // doc2 introduces no new type; doc3 introduces one
    val fixture = Seq((0L, "a a b"), (1L, "b c"), (2L, "a c"), (3L, "d"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 1L, 3L, 2L), (3L, 2L, 5L, 3L),
      (6L, 3L, 7L, 3L), (8L, 4L, 8L, 4L)))
    // corpus: docs/tokens/types all non-decreasing, last row totals the corpus
    val full = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    full.sliding(2).foreach {
      case Array((_, d1, tk1, ty1), (_, d2, tk2, ty2)) =>
        assert(d1 <= d2 && tk1 <= tk2 && ty1 <= ty2)
      case _ =>
    }
    val (_, nd, ntk, nty) = full.last
    assert(nd == docs.count())
    val allToks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
    assert(ntk == allToks.count())
    assert(nty == allToks.distinct().count())
  }
}
