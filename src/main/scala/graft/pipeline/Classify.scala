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
    * [[graft.streaming.StreamJobs.nbClassifyStream]]). Built canonically
    * (see [[nbLangConfusion]]) — identical cells, rep-sized work.
    */
  def nbModelAndPriors(documents: DataFrame): (DataFrame, DataFrame) = {
    val (repTok, repLang, docLang) = canonicalNbInputs(documents)
    nbModelFrom(repTok, repLang, docLang)
  }

  /** The canonical NB input relations ([[graft.pipeline.Dedup.canonicalTexts]]
    * applied to classification): per-REP token counts (token counts are
    * pure functions of the text), per-(rep, lang) member multiplicities
    * (labels are NOT functions of the text — two copies of one text may
    * carry different labels), and the raw (doc_id, lang) projection for
    * priors. Both rep relations are materialized once — model training
    * and scoring/confusion all read them.
    */
  private def canonicalNbInputs(documents: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val (_, members, reps) = Dedup.canonicalTexts(documents)
    val docLang = documents.select(col("doc_id"), col("lang"))
    val repLang = members.join(docLang, "doc_id")
      .groupBy(col("rep_id"), col("lang")).agg(count(lit(1)).as("glsz"))
      .localCheckpoint(eager = true)
    val repTok = docTokOf(reps).localCheckpoint(eager = true)
    (repTok, repLang, docLang)
  }

  /** Per-document predicted language + integer NB scores, then the L × L
    * confusion matrix (lang, pred_lang, n_docs). Docs with zero in-vocab
    * tokens still classify (prior-only argmax) — no row is dropped.
    *
    * CANONICAL over distinct texts: the occurrence stream, the scoring
    * join, and the argmax window all run once per distinct text; model
    * counts weight rep counts by the per-(rep, lang) multiplicities
    * (exactly the integers the naive per-copy streams produce), and the
    * confusion cells sum `glsz` over predicted reps instead of counting
    * expanded rows — so a duplicate-dense corpus pays rep-sized work end
    * to end (the ×100 replica priced the naive form at ~34 s).
    */
  def nbLangConfusion(documents: DataFrame): DataFrame = {
    val (repTok, repLang, docLang) = canonicalNbInputs(documents)
    val (model, priors) = nbModelFrom(repTok, repLang, docLang)
    val repScores = repTok
      .join(broadcast(model), "tok")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("n") * col("s_fp")).as("tok_fp"))
    val repPred = repLang.select(col("rep_id").as("doc_id")).distinct()
      .crossJoin(broadcast(priors))
      .join(repScores, Seq("doc_id", "lang"), "left_outer")
      .select(col("doc_id"), col("lang"),
        (coalesce(col("tok_fp"), lit(0L)) + col("prior_fp")).as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("doc_id").as("rep_id"), col("lang").as("pred_lang"))
    repLang.join(repPred, "rep_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(sum(col("glsz")).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Model construction from the canonical relations: V × L smoothed
    * log-likelihood cells + per-class log-priors, each log rounded ONCE
    * to fixed point. All counts are gsz/glsz-weighted rep counts —
    * identical integers to the per-copy sums, so every cell matches the
    * naive model bit for bit.
    */
  private def nbModelFrom(repTok: DataFrame, repLang: DataFrame,
      docLang: DataFrame): (DataFrame, DataFrame) = {
    val gsz = repLang.groupBy(col("rep_id")).agg(sum(col("glsz")).as("gsz"))
    val tokCnt = repTok
      .join(gsz.withColumnRenamed("rep_id", "doc_id"), "doc_id")
      .groupBy(col("tok")).agg(sum(col("n") * col("gsz")).as("cnt"))
    // global top-V via orderBy+limit = TakeOrdered (per-partition heaps +
    // a V-row driver merge), never a single-partition window sort
    val vocab = tokCnt.orderBy(col("cnt").desc, col("tok")).limit(VocabCap).select(col("tok"))
    // in-vocab per-(lang, token) counts, from the rep relation (never
    // re-exploding the corpus) weighted by the label multiplicities
    val langTok = repTok
      .join(vocab, "tok")
      .join(repLang.withColumnRenamed("rep_id", "doc_id"), "doc_id")
      .groupBy(col("lang"), col("tok"))
      .agg(sum(col("n") * col("glsz")).as("c"))
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

  /** DuckDB twin, mirroring the canonical chain: distinct-text reps, the
    * (rep, lang) multiplicity map, weighted model counts, rep-level
    * scoring/argmax, glsz-summed confusion cells. The null-safe gid
    * (non-hex sentinel) mirrors `C.textGid`.
    */
  val nbLangConfusionSql: String =
    s"""WITH docs_g AS MATERIALIZED (
       |  SELECT doc_id, lang, ${graft.C.textGidSql("text")} AS gid FROM documents
       |), grp AS MATERIALIZED (
       |  SELECT gid, min(doc_id) AS rep_id FROM docs_g GROUP BY gid
       |), replang AS MATERIALIZED (
       |  SELECT g.rep_id, d.lang, count(*) AS glsz
       |  FROM docs_g d JOIN grp g USING (gid) GROUP BY g.rep_id, d.lang
       |), reps AS MATERIALIZED (
       |  SELECT dd.doc_id, dd.text FROM documents dd JOIN grp ON dd.doc_id = grp.rep_id
       |), doctok AS MATERIALIZED (
       |  SELECT doc_id, u.tok AS tok, count(*) AS n
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM reps) t, unnest(toks) AS u(tok)
       |  GROUP BY doc_id, u.tok
       |), gsz AS (
       |  SELECT rep_id, sum(glsz) AS gsz FROM replang GROUP BY rep_id
       |), vocab AS (
       |  SELECT tok FROM (
       |    SELECT dt.tok, row_number() OVER (ORDER BY sum(dt.n * g.gsz) DESC, dt.tok) AS rk
       |    FROM doctok dt JOIN gsz g ON dt.doc_id = g.rep_id GROUP BY dt.tok
       |  ) WHERE rk <= $VocabCap
       |), langtok AS (
       |  SELECT rl.lang, dt.tok, sum(dt.n * rl.glsz) AS c
       |  FROM doctok dt JOIN vocab USING (tok) JOIN replang rl ON dt.doc_id = rl.rep_id
       |  GROUP BY rl.lang, dt.tok
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
       |  SELECT r.doc_id, p.lang,
       |         coalesce(s.tok_fp, 0) + p.prior_fp AS score
       |  FROM reps r CROSS JOIN priors p
       |  LEFT JOIN scores s ON s.doc_id = r.doc_id AND s.lang = p.lang
       |), pred AS (
       |  SELECT doc_id AS rep_id, lang AS pred_lang,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
       |  FROM scored
       |)
       |SELECT rl.lang, p.pred_lang, CAST(sum(rl.glsz) AS BIGINT) AS n_docs
       |FROM replang rl JOIN pred p ON rl.rep_id = p.rep_id AND p.rk = 1
       |GROUP BY rl.lang, p.pred_lang
       |ORDER BY lang, pred_lang""".stripMargin
}
