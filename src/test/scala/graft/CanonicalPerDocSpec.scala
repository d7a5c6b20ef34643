package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{TextAnalysis, Web}

/** Round-16 canonicalizations: each per-doc report is a pure function of
  * `text` (or, for the URL family, of `doc_id % UrlResidues`), so the
  * canonical rep-level plan must be row-set-equal to the naive per-doc
  * core. Pinned here on the real corpus AND an adversarial fixture
  * (duplicate texts under far-apart ids, NULL text, empty text, one-token
  * text) — the quotient identity every ×100 win rests on.
  */
class CanonicalPerDocSpec extends SparkSuite {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  private lazy val fixture: DataFrame = {
    import spark.implicits._
    val long = (0 until 40).map(i => f"the quick brown token$i%02d").mkString(" ")
    Seq(
      (1L, Option(long)), (987654321098L, Option(long)),
      (7L, Option.empty[String]), (8L, Option("")), (9L, Option("a")),
      (42L, Option(long + " tail tail tail tail"))
    ).toDF("doc_id", "text")
  }

  private def abEqual(name: String, canonical: DataFrame => DataFrame,
      naive: DataFrame => DataFrame): Unit = {
    for ((df, label) <- Seq((docs, "corpus"), (fixture, "fixture"))) {
      val a = canonical(df).collect().toSeq
      val b = naive(df).collect().toSeq
      assert(a == b, s"$name diverges on $label (${a.length} vs ${b.length} rows)")
    }
  }

  test("token_count canonical == per-doc") {
    abEqual("token_count", TextAnalysis.tokenCount,
      d => TextAnalysis.tokenCountCore(d).orderBy(col("doc_id")))
  }

  test("gopher_rules canonical == per-doc") {
    abEqual("gopher_rules", TextAnalysis.gopherRules,
      d => TextAnalysis.gopherRulesCore(d).orderBy(col("doc_id")))
  }

  test("doc_repetition canonical == per-doc") {
    abEqual("doc_repetition", d => TextAnalysis.docRepetition(d),
      d => TextAnalysis.docRepetitionCore(d).orderBy(col("doc_id")))
  }

  test("doc_entropy canonical == per-doc") {
    abEqual("doc_entropy", TextAnalysis.docEntropy,
      d => TextAnalysis.docEntropyCore(d).orderBy(col("doc_id")))
  }

  test("doc_chunks canonical == per-doc") {
    abEqual("doc_chunks", d => TextAnalysis.docChunks(d),
      d => TextAnalysis.docChunksCore(d).orderBy(col("doc_id"), col("chunk_idx")))
  }

  test("url_canonicalize residue lookup == per-doc regex battery") {
    abEqual("url_canonicalize", Web.urlCanonicalize,
      d => Web.urlCanonicalizeCore(Web.urlWrap(d)).orderBy(col("doc_id")))
  }

  test("decontam_overlap canonical == per-doc shingle split") {
    import graft.pipeline.{Curation, Dedup}
    def naive(d: DataFrame): DataFrame = {
      val sh = Dedup.shingleHashes(d)
      val evalSh = sh.filter(col("doc_id") % 53 === 0).select(col("h0")).distinct()
      val trainSh = sh.filter(col("doc_id") % 53 =!= 0)
      val sizes = trainSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_total"))
      trainSh.join(evalSh, Seq("h0"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .join(sizes, Seq("doc_id"))
        .select(col("doc_id"), col("n_shared"), col("n_total"),
          (col("n_shared").cast("double") / col("n_total")).as("contam_frac"))
        .orderBy(col("doc_id"))
    }
    abEqual("decontam_overlap", Curation.decontamOverlap, naive)
  }

  test("dedup_chunks canonical == per-doc aggregation") {
    import graft.pipeline.TextAnalysis
    def naive(d: DataFrame): DataFrame =
      TextAnalysis.docChunksCore(d)
        .groupBy(md5(col("chunk_text")).as("chunk_hash"))
        .agg(count(lit(1)).as("n_copies"),
          min(struct(col("doc_id"), col("chunk_idx"))).as("first"))
        .select(col("chunk_hash"), col("first.doc_id").as("keep_doc_id"),
          col("first.chunk_idx").as("keep_chunk_idx"), col("n_copies"))
        .orderBy(col("keep_doc_id"), col("keep_chunk_idx"))
    abEqual("dedup_chunks", TextAnalysis.dedupChunks, naive)
  }

  test("inverted_index / postings_delta_stats canonical tf == per-doc tf") {
    import graft.pipeline.{Search, TextAnalysis}
    // the canonical (term, doc, tf) derivation must match the naive
    // explode-all-docs one; the downstream aggs are shared, so comparing
    // the full query outputs pins the identity end-to-end
    def naiveTf(d: DataFrame): DataFrame = d
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    for ((df, label) <- Seq((docs, "corpus"), (fixture, "fixture"))) {
      val a = Search.invertedIndex(df).collect().toSeq
      val naive = naiveTf(df)
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
          graft.C.md5Long(
            array_join(
              transform(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
                x => concat(x.getField("doc_id").cast("string"), lit(":"),
                  x.getField("tf").cast("string"))), ",")).as("postings_hash"))
        .orderBy(col("term")).collect().toSeq
      assert(a == naive, s"inverted_index diverges on $label")
    }
  }

  test("dedup_url residue lookup == per-doc aggregation") {
    abEqual("dedup_url", Web.dedupUrl,
      d => Web.urlCanonicalizeCore(Web.urlWrap(d))
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_aliases"), min(col("doc_id")).as("keep_doc_id"))
        .orderBy(col("canon_url")))
  }
}
