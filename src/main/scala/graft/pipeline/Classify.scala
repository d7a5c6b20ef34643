package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Naive-Bayes document classification — the linear-classifier family of
  * quality/domain filters (CCNet's fastText language filter, C4's
  * bad-words classifier, Gopher/RefinedWeb quality classifiers): train a
  * bag-of-words model on a labeled corpus, score every document against
  * every class, take the argmax. Self-trained on the `documents` table's
  * `lang` label here (production would broadcast a pre-trained weight
  * table instead — the scoring plan is identical), and evaluated in the
  * same DAG: the output is the L × L confusion matrix of actual vs
  * predicted language.
  *
  * Model: multinomial NB with add-one smoothing over a capped vocabulary.
  *   score(d, l) = log P(l) + Σ_t n_dt · log P(t | l)
  *   P(t | l) = (c_lt + 1) / (T_l + V)
  * Every log is rounded ONCE to a fixed-point BIGINT per model cell
  * ([[Scale]] — the [[TextAnalysis.docLmScore]] recipe), so per-document
  * scores are exact integer sums: order-invariant, hash-stable, and the
  * argmax (ties to the lexicographically first language) is deterministic
  * cross-engine.
  *
  * Shape at 100 TB: the occurrence stream collapses to per-(doc, token)
  * counts in one map-side-combined hash-agg; the vocabulary is a top-V
  * TakeOrdered (per-partition heaps, no global sort); the model is V × L rows
  * (V = [[VocabCap]], L = #classes) built from three small aggregates of
  * the SAME token-count relation — kilobytes, broadcast to the scoring
  * join. Scoring joins per-doc counts to the model on token (L-fold
  * amplification, L small and fixed), one hash-agg to (doc, class) sums,
  * one rank-1 window for the argmax, one hash-agg to the L² confusion
  * cells. No shuffle carries anything doc-length-sized: after the first
  * hash-agg everything is count-sized.
  */
object Classify {
  import TextAnalysis.{tokens, tokensSql}

  /** Top-V vocabulary cap (count DESC, token ASC). Mirrors production
    * feature selection — an uncapped vocabulary would make the broadcast
    * model corpus-dependent in size; out-of-vocabulary tokens are ignored
    * by scoring (in both engines).
    */
  private[graft] val VocabCap = 2000

  /** Fixed-point resolution for log-probabilities: 1e-4 nats, rounded once
    * per model cell ([[TextAnalysis.docLmScore]]'s determinism argument).
    */
  private val Scale = 10000L

  /** The (doc_id, tok, n) token-count relation scoring and model training
    * share — one corpus explode, map-side combined.
    */
  private def docTokOf(documents: DataFrame): DataFrame = documents
    .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    .groupBy(col("doc_id"), col("tok"))
    .agg(count(lit(1)).as("n"))

  /** Trained NB weight table (lang, tok, s_fp) + priors (lang, prior_fp) —
    * the broadcastable model a production deployment ships to scoring
    * (here also to the streaming twin,
    * [[graft.streaming.StreamJobs.nbClassifyStream]]).
    */
  def nbModelAndPriors(documents: DataFrame): (DataFrame, DataFrame) =
    nbModelFrom(docTokOf(documents), documents.select(col("doc_id"), col("lang")))

  /** Per-document predicted language + integer NB scores, then the L × L
    * confusion matrix (lang, pred_lang, n_docs). Docs with zero in-vocab
    * tokens still classify (prior-only argmax) — no row is dropped.
    */
  def nbLangConfusion(documents: DataFrame): DataFrame = {
    val docTok = docTokOf(documents)
    val docLang = documents.select(col("doc_id"), col("lang"))
    val (model, priors) = nbModelFrom(docTok, docLang)
    val scores = docTok
      .join(broadcast(model), "tok")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("n") * col("s_fp")).as("tok_fp"))
    val scored = docLang.select(col("doc_id"), col("lang").as("actual"))
      .crossJoin(broadcast(priors))
      .join(scores, Seq("doc_id", "lang"), "left_outer")
      .select(col("doc_id"), col("actual"), col("lang"),
        (coalesce(col("tok_fp"), lit(0L)) + col("prior_fp")).as("score"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("lang"))))
      .filter(col("rk") === 1)
      .groupBy(col("actual").as("lang"), col("lang").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Model construction from the shared token-count relation: V × L
    * smoothed log-likelihood cells + per-class log-priors, each log
    * rounded ONCE to fixed point.
    */
  private def nbModelFrom(docTok: DataFrame, docLang: DataFrame): (DataFrame, DataFrame) = {
    val tokCnt = docTok.groupBy(col("tok")).agg(sum(col("n")).as("cnt"))
    // global top-V via orderBy+limit = TakeOrdered (per-partition heaps +
    // a V-row driver merge), never a single-partition window sort
    val vocab = tokCnt.orderBy(col("cnt").desc, col("tok")).limit(VocabCap).select(col("tok"))
    // in-vocab per-(lang, token) counts, from the per-doc relation (never
    // re-exploding the corpus) joined to its labels
    val langTok = docTok
      .join(vocab, "tok")
      .join(docLang, "doc_id")
      .groupBy(col("lang"), col("tok"))
      .agg(sum(col("n")).as("c"))
    // totals over ALL languages, not just those with in-vocab tokens: a
    // class with zero training tokens must still get the smoothed
    // P(t|l) = 1/(0+V) per token — dropping it from the model would score
    // it likelihood-1 (empty sum) and its prior alone could beat every
    // real candidate's negative token sum
    val langTotals = docLang.select(col("lang")).distinct()
      .join(langTok, Seq("lang"), "left_outer")
      .groupBy(col("lang")).agg(coalesce(sum(col("c")), lit(0L)).as("tl"))
    val vocabSize = vocab.agg(count(lit(1)).as("v"))
    val priors = docLang.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(docLang.agg(count(lit(1)).as("total"))))
      .select(col("lang"),
        round(log(col("nd").cast("double") / col("total").cast("double")) * Scale)
          .cast("long").as("prior_fp"))
    // V × L model: langs × vocab, absent cells smoothed to c = 0
    val model = langTotals
      .crossJoin(vocab)
      .crossJoin(broadcast(vocabSize))
      .join(langTok, Seq("lang", "tok"), "left_outer")
      .select(col("lang"), col("tok"),
        round(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("tl") + col("v")).cast("double")) * Scale).cast("long").as("s_fp"))
    (model, priors)
  }

  val nbLangConfusionSql: String =
    s"""WITH doctok AS (
       |  SELECT doc_id, u.tok AS tok, count(*) AS n
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents) t, unnest(toks) AS u(tok)
       |  GROUP BY doc_id, u.tok
       |), vocab AS (
       |  SELECT tok FROM (
       |    SELECT tok, row_number() OVER (ORDER BY sum(n) DESC, tok) AS rk
       |    FROM doctok GROUP BY tok
       |  ) WHERE rk <= $VocabCap
       |), langtok AS (
       |  SELECT d.lang, dt.tok, sum(dt.n) AS c
       |  FROM doctok dt JOIN vocab USING (tok) JOIN documents d USING (doc_id)
       |  GROUP BY d.lang, dt.tok
       |), totals AS (
       |  -- over ALL languages: a class with zero in-vocab tokens still gets
       |  -- smoothed 1/(0+V) cells instead of dropping out of the model
       |  SELECT l.lang, coalesce(sum(lt.c), 0) AS tl
       |  FROM (SELECT DISTINCT lang FROM documents) l
       |  LEFT JOIN langtok lt USING (lang) GROUP BY l.lang
       |), priors AS (
       |  SELECT lang, CAST(round(ln(CAST(count(*) AS DOUBLE) /
       |           CAST((SELECT count(*) FROM documents) AS DOUBLE)) * $Scale) AS BIGINT) AS prior_fp
       |  FROM documents GROUP BY lang
       |), model AS (
       |  SELECT t.lang, v.tok,
       |         CAST(round(ln(CAST(coalesce(lt.c, 0) + 1 AS DOUBLE) /
       |           CAST(t.tl + (SELECT count(*) FROM vocab) AS DOUBLE)) * $Scale) AS BIGINT) AS s_fp
       |  FROM totals t CROSS JOIN vocab v
       |  LEFT JOIN langtok lt ON lt.lang = t.lang AND lt.tok = v.tok
       |), scores AS (
       |  SELECT dt.doc_id, m.lang, sum(dt.n * m.s_fp) AS tok_fp
       |  FROM doctok dt JOIN model m USING (tok)
       |  GROUP BY dt.doc_id, m.lang
       |), scored AS (
       |  SELECT d.doc_id, d.lang AS actual, p.lang,
       |         coalesce(s.tok_fp, 0) + p.prior_fp AS score
       |  FROM documents d CROSS JOIN priors p
       |  LEFT JOIN scores s ON s.doc_id = d.doc_id AND s.lang = p.lang
       |), pred AS (
       |  SELECT doc_id, actual, lang,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
       |  FROM scored
       |)
       |SELECT actual AS lang, pred.lang AS pred_lang, count(*) AS n_docs
       |FROM pred WHERE rk = 1
       |GROUP BY actual, pred.lang
       |ORDER BY lang, pred_lang""".stripMargin
}
