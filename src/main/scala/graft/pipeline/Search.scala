package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text relevance retrieval over the `documents` table — the search
  * side of a training-data pipeline (dedup against benchmark queries,
  * targeted corpus probes, "what does the corpus say about X" audits all
  * reduce to scored keyword retrieval).
  *
  * Scoring is BM25 in the Lucene form (idf = ln(1 + (N−df+0.5)/(df+0.5)),
  * always positive — Robertson's raw idf goes negative once df > N/2,
  * which this synthetic corpus's common terms would trigger). Per-(doc,
  * term) contributions round ONCE to [[Bm25Scale]] fixed point and
  * per-doc totals are exact BIGINT sums — order-invariant, so the result
  * hash-matches the DuckDB oracle (the [[TextAnalysis.docLmScore]]
  * determinism construction).
  */
object Search {

  /** BM25 shape parameters (Robertson et al.; the Lucene defaults),
    * interpolated into BOTH the Spark expressions and the oracle SQL so a
    * tuning edit cannot desync the hash check.
    */
  private[graft] val Bm25K1 = 1.2
  private[graft] val Bm25B = 0.75
  private[graft] val Bm25Scale = 1000000L

  /** Result-list depth. */
  private[graft] val Bm25TopK = 10

  /** The fixed probe query: two common terms + one rare term ("dup"
    * marks the planted duplicate family in the synthetic corpus), so the
    * ranking exercises both the tf saturation and the idf contrast.
    */
  private[graft] val QueryTerms = Seq("spark", "query", "dup")

  /** Top-[[Bm25TopK]] documents for [[QueryTerms]] by BM25. Output:
    * (rank, doc_id, n_terms, score_fp).
    *
    * Shape at 100 TB: the postings relation is filtered to the query's
    * terms BEFORE the shuffle (a literal-set map-side filter — the scan
    * moves only matching tokens), so the corpus-sized explode never
    * shuffles; df is a |terms|-row agg OF that relation; doc lengths are
    * a map-only projection whose global (N, Σdl) reduce to one broadcast
    * row. Scoring joins are term-table-broadcast + doc-keyed; the final
    * top-k is `TakeOrderedAndProject` (K rows per partition, no global
    * sort) with the rank window over the K survivors only — the
    * [[Curation.dsirSelect]] selection shape.
    */
  /** The per-(doc, term) fixed-point BM25 contribution over columns
    * `tf, df, dl, n_docs, t_tokens` — ONE definition shared by the batch
    * search and the streaming twin, so the scoring arithmetic cannot
    * drift between them.
    */
  private[graft] def bm25ContribFp: org.apache.spark.sql.Column = {
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val den = col("tf") + lit(Bm25K1) *
      (lit(1.0) - lit(Bm25B) + lit(Bm25B) *
        (col("dl") / (col("t_tokens").cast("double") / col("n_docs"))))
    round(idf * (col("tf") * lit(Bm25K1 + 1.0)) / den * Bm25Scale).cast("long")
  }

  /** The trained retrieval model a production deployment ships to scoring:
    * one row per query term carrying (tok, df, n_docs, t_tokens) — the
    * |terms|-row broadcastable side of [[bm25Search]], also joined
    * statically by [[graft.streaming.StreamJobs.bm25ScoreStream]].
    */
  def bm25Model(documents: DataFrame, terms: Seq[String] = QueryTerms): DataFrame = {
    val dl = documents.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"), col("doc_id"))
      .filter(col("tok").isin(terms.map(lit): _*))
      .groupBy(col("tok")).agg(count_distinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(stats))
  }

  /** Per-doc (doc_id, n_terms, score_fp) for every matching document —
    * [[bm25Search]] without the top-k truncation; the batch side the
    * streaming-twin parity test compares against.
    */
  def bm25Scores(documents: DataFrame, terms: Seq[String] = QueryTerms): DataFrame = {
    val dl = documents.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    val tf = documents
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(terms.map(lit): _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    tf
      .join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), bm25ContribFp.as("s_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"), sum(col("s_fp")).as("score_fp"))
  }

  def bm25Search(documents: DataFrame, terms: Seq[String] = QueryTerms): DataFrame = {
    bm25Scores(documents, terms)
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(Bm25TopK)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score_fp").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_terms"), col("score_fp"))
      .orderBy(col("rank"))
  }

  /** DuckDB twin of [[bm25Search]]: identical expression tree (same
    * literal constants, same association order), so every double op is
    * the same IEEE op and the once-rounded `s_fp` matches bit-for-bit.
    */
  def bm25SearchSql(terms: Seq[String] = QueryTerms): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, ${TextAnalysis.tokensSql} AS toks FROM documents
       |), dl AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t
       |), stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS t_tokens
       |  FROM dl
       |), tf AS (
       |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       |  FROM t, unnest(toks) AS u(tok)
       |  WHERE tok IN ($inList)
       |  GROUP BY doc_id, tok
       |), df AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
       |), contrib AS (
       |  SELECT tf.doc_id,
       |         CAST(round(
       |           ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
       |             * (tf.tf * ${Bm25K1 + 1.0})
       |             / (tf.tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B *
       |                 (dl.dl / (CAST(s.t_tokens AS DOUBLE) / s.n_docs))))
       |             * $Bm25Scale) AS BIGINT) AS s_fp
       |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats s
       |), scored AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |         CAST(sum(s_fp) AS BIGINT) AS score_fp
       |  FROM contrib GROUP BY doc_id
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rank,
       |       doc_id, n_terms, score_fp
       |FROM scored ORDER BY score_fp DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  // ---- Retrieval evaluation (NDCG@K) ----

  /** Fixed-point rank discounts for [[searchEval]]: `round(1e6 / log2(i+1))`
    * for ranks 1..[[Bm25TopK]], computed ONCE here and interpolated as
    * integer literals into both engines — no cross-engine float math.
    */
  private[graft] val NdcgDiscounts: Seq[Long] =
    (1 to Bm25TopK).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** NDCG@[[Bm25TopK]] of the BM25 ranking against a deterministic graded
    * relevance — the IR eval loop (relevance here = how many distinct
    * query terms the document contains, 0..|terms|; a production eval
    * would join human judgments instead, same plan). DCG sums
    * `rel_i · D_i` over the BM25 top-K; IDCG over the corpus-ideal top-K
    * (relevance-descending); `ndcg_ppm` is their ratio at 1e-6 by integer
    * division. Everything is exact BIGINT arithmetic over once-computed
    * literal discounts, so the eval hash-checks.
    *
    * Shape at 100 TB: relevance is a map-only expression; the ideal top-K
    * is a TakeOrderedAndProject (never a global sort); both DCG sums
    * aggregate K rows. The only real work is the BM25 search being graded.
    * Output: one row (dcg_fp, idcg_fp, ndcg_ppm, n_ranked).
    */
  def searchEval(documents: DataFrame, terms: Seq[String] = QueryTerms): DataFrame = {
    val rel = size(array_intersect(
      array_distinct(TextAnalysis.tokens(col("text"))),
      array(terms.map(lit): _*))).cast("long")
    val discounts = array(NdcgDiscounts.map(lit): _*)
    val graded = documents.select(col("doc_id"), rel.as("rel"))
    val dcg = bm25Search(documents, terms)
      .join(graded, "doc_id")
      .agg(coalesce(sum(col("rel") * element_at(discounts, col("rank").cast("int"))),
        lit(0L)).as("dcg_fp"),
        count(lit(1)).as("n_ranked"))
    val idcg = graded
      .orderBy(col("rel").desc, col("doc_id"))
      .limit(Bm25TopK)
      .withColumn("irank", row_number().over(
        Window.orderBy(col("rel").desc, col("doc_id"))).cast("int"))
      .agg(coalesce(sum(col("rel") * element_at(discounts, col("irank"))), lit(0L))
        .as("idcg_fp"))
    dcg.crossJoin(broadcast(idcg))
      .select(col("dcg_fp"), col("idcg_fp"),
        when(col("idcg_fp") > 0,
          expr("dcg_fp * 1000000 div idcg_fp")).otherwise(0L).as("ndcg_ppm"),
        col("n_ranked"))
  }

  def searchEvalSql(terms: Seq[String] = QueryTerms): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val discountRows = NdcgDiscounts.zipWithIndex
      .map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")
    s"""WITH disc(rank, d) AS (VALUES $discountRows),
       |graded AS (
       |  SELECT doc_id,
       |         CAST(len(list_intersect(list_distinct(${TextAnalysis.tokensSql}),
       |                                 [$termList])) AS BIGINT) AS rel
       |  FROM documents
       |), ranked AS (
       |  ${bm25SearchSql(terms).replaceAll("\n", "\n  ")}
       |), dcg AS (
       |  SELECT CAST(coalesce(sum(g.rel * dc.d), 0) AS BIGINT) AS dcg_fp,
       |         CAST(count(*) AS BIGINT) AS n_ranked
       |  FROM ranked r JOIN graded g USING (doc_id) JOIN disc dc USING (rank)
       |), ideal AS (
       |  SELECT rel, CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS irank
       |  FROM graded ORDER BY rel DESC, doc_id LIMIT $Bm25TopK
       |), idcg AS (
       |  SELECT CAST(coalesce(sum(i.rel * dc.d), 0) AS BIGINT) AS idcg_fp
       |  FROM ideal i JOIN disc dc ON dc.rank = i.irank
       |)
       |SELECT d.dcg_fp, c.idcg_fp,
       |       CAST(CASE WHEN c.idcg_fp > 0 THEN d.dcg_fp * 1000000 // c.idcg_fp
       |            ELSE 0 END AS BIGINT) AS ndcg_ppm,
       |       d.n_ranked
       |FROM dcg d, idcg c""".stripMargin
  }

  // ---- Inverted-index construction ----

  /** Postings-list build — the index structure behind [[bm25Search]] (and
    * any term-lookup audit), materialized as a relation: per term, its
    * document frequency, total term frequency, posting span, and a 60-bit
    * digest of the full ordered postings list (`doc:tf` pairs sorted by
    * doc id). The digest check proves BOTH engines built byte-identical
    * postings without shipping corpus-sized lists through the compare.
    *
    * Shape at 100 TB: explode → one (term, doc) hash-agg with map-side
    * combine (repeats of a term in a doc collapse before the shuffle) →
    * one per-term agg whose `collect_list` is df-bounded per term; the
    * output relation is vocabulary-sized (Heaps-bounded). A production
    * serving index would sink the postings column itself (delta-encoded)
    * instead of its digest — same plan, different sink.
    */
  /** Canonical (term, doc_id, tf) relation: a doc's term-frequency map is
    * a pure function of its text, so the tokenize/explode/first-agg runs
    * over distinct-text reps only and the member expansion (an
    * output-sized join) re-attaches doc ids. The downstream per-term
    * aggregations are unchanged — at the ×100 replica the 30 M-row
    * explode+hash-agg becomes a 0.3 M-row one plus a join.
    */
  private def docTermFreqs(documents: DataFrame): DataFrame = {
    val (_, members, reps) = graft.pipeline.Dedup.canonicalTexts(documents)
    reps
      .select(col("doc_id").as("rep_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("rep_id")).agg(count(lit(1)).as("tf"))
      .join(members, Seq("rep_id"))
      .select(col("term"), col("doc_id"), col("tf"))
  }

  /** Rep-level twin of [[docTermFreqs]] as a CTE chain ending in
    * `tf(term, doc_id, tf)`. */
  private def docTermFreqsCtesSql(tag: String): String =
    s"""${tag}_g AS MATERIALIZED (
       |  SELECT doc_id, ${graft.C.textGidSql("text")} AS gid FROM documents
       |), ${tag}_r AS MATERIALIZED (
       |  SELECT gid, min(doc_id) AS rep_id FROM ${tag}_g GROUP BY gid
       |), ${tag}_occ AS (
       |  SELECT t.rep_id, u.tok AS term
       |  FROM (SELECT d.doc_id AS rep_id, ${TextAnalysis.tokensSql} AS toks
       |        FROM documents d JOIN ${tag}_r ON d.doc_id = ${tag}_r.rep_id) t,
       |       unnest(toks) AS u(tok)
       |), ${tag}_tfr AS MATERIALIZED (
       |  SELECT term, rep_id, count(*) AS tf FROM ${tag}_occ GROUP BY term, rep_id
       |), tf AS (
       |  SELECT f.term, g.doc_id, f.tf
       |  FROM ${tag}_tfr f
       |  JOIN ${tag}_r r ON f.rep_id = r.rep_id
       |  JOIN ${tag}_g g ON g.gid = r.gid
       |)""".stripMargin

  def invertedIndex(documents: DataFrame): DataFrame =
    docTermFreqs(documents)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
        graft.C.md5Long(
          array_join(
            transform(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
              x => concat(x.getField("doc_id").cast("string"), lit(":"),
                x.getField("tf").cast("string"))), ",")).as("postings_hash"))
      .orderBy(col("term"))

  def invertedIndexSql: String =
    s"""WITH ${docTermFreqsCtesSql("ii")}
       |SELECT term, CAST(count(*) AS BIGINT) AS df,
       |       CAST(sum(tf) AS BIGINT) AS tf_total,
       |       CAST(min(doc_id) AS BIGINT) AS first_doc,
       |       CAST(max(doc_id) AS BIGINT) AS last_doc,
       |       ${graft.C.md5LongSql(
            "string_agg(concat(doc_id, ':', tf), ',' ORDER BY doc_id)")} AS postings_hash
       |FROM tf GROUP BY term ORDER BY term""".stripMargin

  /** Index-compression sizing: per-term delta-gap bit budget of the
    * postings list — the estimate that decides whether a 100 TB index
    * delta-encodes (Elias/VByte family all key off `⌈log2 gap⌉`, here the
    * exact binary length of each gap, `length(bin(gap))`). Gaps are
    * doc-id differences (first gap anchored at `doc_id + 1` so it is
    * always ≥ 1); `raw_bits` is the 64-bit flat cost; `ratio_ppm` the
    * integer compression ratio. One user-invisible pass over the (term,
    * doc) relation: a term-keyed `lag` window (co-partitioned with the
    * index build) then a vocabulary-sized agg — nothing corpus-scaled
    * after the explode. Exact integers, hash-checked.
    * Output: (term, df, delta_bits, raw_bits, ratio_ppm).
    */
  def postingsDeltaStats(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    docTermFreqs(documents)
      .withColumn("gap",
        coalesce(col("doc_id") - lag(col("doc_id"), 1).over(w), col("doc_id") + 1))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(length(bin(col("gap"))).cast("long")).as("delta_bits"),
        (count(lit(1)) * 64).as("raw_bits"))
      .select(col("term"), col("df"), col("delta_bits"), col("raw_bits"),
        expr("delta_bits * 1000000 div raw_bits").as("ratio_ppm"))
      .orderBy(col("term"))
  }

  def postingsDeltaStatsSql: String =
    s"""WITH ${docTermFreqsCtesSql("pd")}, gaps AS (
       |  SELECT term,
       |         coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
       |                  doc_id + 1) AS gap
       |  FROM tf
       |)
       |SELECT term, CAST(count(*) AS BIGINT) AS df,
       |       CAST(sum(length(bin(gap))) AS BIGINT) AS delta_bits,
       |       CAST(count(*) * 64 AS BIGINT) AS raw_bits,
       |       CAST(sum(length(bin(gap))) * 1000000 // (count(*) * 64) AS BIGINT) AS ratio_ppm
       |FROM gaps GROUP BY term ORDER BY term""".stripMargin
}
