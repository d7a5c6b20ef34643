package graft

import graft.functions.HtmlFunctions
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

/** Bit-equality A/B for the native [[graft.functions.HtmlBlockScores]]
  * against the legacy regexp-battery chain it replaced
  * ([[TextAnalysis.htmlBlockScoresLegacy]]) — on every wrapped real
  * document plus adversarial fragments targeting each regex-semantics
  * corner the hand scanner re-implements. PropertiesCheck adds a
  * generator-driven soup fuzz against a pure java.util.regex ground
  * truth.
  */
class HtmlNativeSpec extends SparkSuite {

  private def ab(htmls: Seq[String], label: String): Unit = {
    import spark.implicits._
    val df = htmls.toDF("html")
    val got = df.select(HtmlFunctions.htmlBlockScores(col("html")).as("s")).collect()
    val want = df.select(TextAnalysis.htmlBlockScoresLegacy(col("html")).as("s")).collect()
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"$label diverges on input #$i: ${htmls(i).take(120)}")
    }
  }

  test("native block scorer == legacy regexp chain on all wrapped sf0.001 documents") {
    val pages = TextAnalysis.htmlWrap(spark.read.parquet(s"${sf()}/documents.parquet"))
      .orderBy("doc_id")
    val got = pages.select(HtmlFunctions.htmlBlockScores(col("html")).as("s")).collect()
    val want = pages.select(TextAnalysis.htmlBlockScoresLegacy(col("html")).as("s")).collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("native block scorer == legacy regexp chain on adversarial fragments") {
    ab(Seq(
      "", "plain text with no tags at all",
      // tag-name boundaries: <pre> is not <p>, <heady> is no block tag,
      // <header> vs <head> vs <h1-6>, digits outside [1-6]
      "<pre>x</pre><p>in p</p>", "<heady>y</heady><head>z</head>",
      "<header>H</header><h1>one</h1><h6>six</h6><h7>seven</h7><h0>zero</h0>",
      "before<li$ x>after", "<html><body><title>T</title></body></html>",
      // case-insensitivity (ASCII): tags and close tags in caps
      "<DIV CLASS=\"A\">Caps</DIV><P>p</P>", "<ScRiPt>var x;</sCrIpT>visible",
      "<STYLE media=all>.x{}</style>tail",
      // unclosed script/style: the regex finds no close and matches nothing
      "<script>never closed... <p>inside looks like a block</p>",
      "<style>a{} <div>blocks still split</div>",
      // script with attributes, script whose body holds fake tags
      "<script src=\"a.js\" async>if (a<b) { run(); }</script><p>kept</p>",
      "<scripts>not a script tag but matches the open prefix</scripts>",
      // anchors: boundary, caps, attr-less, unclosed, nested inline tags,
      // multiple per block, close-tag lookalike </ab>
      "<p><a href=\"/x\">one</a> mid <A HREF=Y>two</A> <ab>not anchor</ab></p>",
      "<p><a>bare</a> and <a href=x>un closed", "<p><a href=x>keep <b>bold</b> text</a></p>",
      "<p><a x>first</a><a y>second</a></p>", "<p>text</ab></a></p>",
      // unmatched '<' stays literal; '< b >' IS a tag match for <[^>]*>
      "a < b and c > d", "5 < 6 but no close", "tail<",
      // entities incl the sequential-order trap &amp;lt;
      "<p>&lt;tag&gt; &quot;q&quot; &amp; &amp;lt; &amp;amp;</p>",
      // whitespace battery: tabs, newlines, VT, FF, CR runs
      "<p>a\t\tb\ncd\fe\rf   g</p>", "<p> \t\n </p>",
      // stopwords: case folding via lower, bare tokens only
      "<p>The cat OF a hat IS ON and in or</p>",
      "<p>their often online island</p>",
      // block tag with attributes and self-closing-ish slash
      "<div id=\"main\" data-x=\"1\">attrs</div><br/><td >cell</td >",
      // non-ASCII text and a Kelvin-sign lookalike for ASCII-only folding
      "<p>café Kelvin</p>",
      // split match at position 0 and at the very end
      "<p>lead</p>", "tail<p>", "<p>",
      // '>' before any '<'
      "> stray <p>block</p>"
    ), "adversarial")
  }

  test("canonical html_extract == per-doc html_extract (corpus + dup/null/huge-id fixture)") {
    import spark.implicits._
    // corpus A/B, both axes
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    for (axis <- Seq(false, true)) {
      val a = TextAnalysis.htmlExtractCanonical(docs, axis).collect().toSeq
      val b = TextAnalysis.htmlExtract(TextAnalysis.htmlWrap(docs), axis).collect().toSeq
      assert(a == b, s"corpus divergence (stopwordAxis=$axis)")
    }
    // fixture: duplicate texts under wildly different ids (the title block
    // "Doc <id>" must never flip a keep decision), NULL text, empty text
    val long = (0 until 30).map(i => f"the quick brown token$i%02d").mkString(" ")
    val fx = Seq(
      (1L, Option(long)), (999999999999L, Option(long)),
      (7L, Option.empty[String]), (8L, Option("")), (42L, Option(long + " extra"))
    ).toDF("doc_id", "text")
    for (axis <- Seq(false, true)) {
      val a = TextAnalysis.htmlExtractCanonical(fx, axis).collect().toSeq
      val b = TextAnalysis.htmlExtract(TextAnalysis.htmlWrap(fx), axis).collect().toSeq
      assert(a == b, s"fixture divergence (stopwordAxis=$axis)")
      assert(a.length == 5)
    }
  }

  test("hard-coded stopword mirror matches TextAnalysis.stopwords") {
    assert(HtmlFunctions.stopwordsMirror == TextAnalysis.stopwords.toSet)
  }

  test("html_extract output columns survive the native swap (plan smoke)") {
    val out = TextAnalysis.htmlExtract(
      TextAnalysis.htmlWrap(spark.read.parquet(s"${sf()}/documents.parquet")))
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_blocks", "n_kept", "clean_text", "n_clean_chars"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("regexp_replace"), "native path must carry no regexp battery")
  }
}
