package graft

import graft.functions.TextFunctions
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for the native [[graft.functions.CharHistogram]]-based docEntropy
  * against the exploded groupBy chain it replaced — on real documents and
  * edge fixtures (empty, null, non-ASCII, supergraph chars).
  */
class TextNativeSpec extends SparkSuite {

  /** The pre-native docEntropy, verbatim — the spec's ground truth. */
  private def legacyEntropy(documents: DataFrame): DataFrame = {
    val lnFp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => round(log(c.cast("double")) * TextAnalysis.EntScale).cast("long")
    val hist = documents
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("p"))
      .select(col("doc_id"), col("text").substr(col("p"), lit(1)).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val perDoc = hist
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), sum(col("c") * lnFp(col("c"))).as("clnc"))
      .select(col("doc_id"), col("n").as("n_chars_counted"),
        (col("n") * lnFp(col("n")) - col("clnc")).as("ent_fp"))
    documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_chars_counted"), lit(0L)).as("n_chars_counted"),
        coalesce(col("ent_fp"), lit(0L)).as("ent_fp"))
      .orderBy(col("doc_id"))
  }

  private def ab(docs: DataFrame): Unit = {
    val got = TextAnalysis.docEntropy(docs).collect()
    val want = legacyEntropy(docs).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"entropy diverges: $g vs $w") }
  }

  test("native docEntropy == exploded chain on sf0.001 documents") {
    ab(spark.read.parquet(s"${sf()}/documents.parquet"))
  }

  test("native docEntropy == exploded chain on edge fixtures") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "a"), (3L, "aaaa"), (4L, "abcd"),
      (5L, "the quick brown fox"), (6L, "café né"), (7L, "ααββγ"),
      (8L, "a\nb\tc d"), (9L, "😀x😀"), // surrogate pair twice
      (10L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    ab(docs)
  }

  test("char histogram multiset equals exploded counts on mixed text") {
    import spark.implicits._
    val docs = Seq((1L, "mississippi"), (2L, "αβα"), (3L, "😀a😀")).toDF("doc_id", "text")
    val nat = docs.select(col("doc_id"),
        explode(TextFunctions.charHistogram(col("text"))).as("e"))
      .select(col("doc_id"), col("e.ch"), col("e.c")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val old = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("p"))
      .select(col("doc_id"), col("text").substr(col("p"), lit(1)).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(nat == old)
  }
}
