package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass HTML block scorer — VALUE-IDENTICAL to the regexp
  * battery it replaces in [[graft.pipeline.TextAnalysis.htmlExtractCore]]:
  *
  * {{{
  * noScript = regexp_replace(regexp_replace(html,
  *   "(?is)<script[^>]*>.*?</script>", " "), "(?is)<style[^>]*>.*?</style>", " ")
  * transform(split(noScript, "(?i)</?(?:p|div|...)\\b[^>]*>"), b => struct(
  *   vis  = unesc(trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), "\\s+", " "))),
  *   n    = length(vis),
  *   ln   = length(unesc(trim(... concat_ws(" ",
  *            regexp_extract_all(b, "(?is)<a\\b[^>]*>(.*?)</a>", 1)) ...))),
  *   ns   = size(filter(split(lower(vis), " "), t => t.isin(stopwords)))))
  * }}}
  *
  * The DuckDB oracle ([[graft.pipeline.TextAnalysis.htmlExtractSql]]) keeps
  * its regexp form unchanged, so hashes at every SF are untouched; a spec
  * asserts bit-equality against the legacy Column chain on real documents
  * plus adversarial fragments.
  *
  * Exists because the expression form runs ~8 regexp passes per block × ~12
  * blocks per page (script/style strip, block split, two tag-strips, two
  * whitespace collapses, anchor extract, stopword filter), each allocating
  * intermediate UTF8Strings — measured as the html_extract[_stopword] ×100
  * Spark cliff (648/653 s, the two slowest map-only queries after
  * doc_winnow's fix). This loop makes ONE scan per stage with zero regex:
  * the patterns involved (literal-prefix tags, `[^>]*>` attribute tails,
  * non-greedy scans to a literal close tag, `\s+` runs) are all
  * constant-width-lookahead, so hand scanning reproduces the Java regex
  * semantics exactly — including `(?i)` as ASCII-only case folding (Java
  * CASE_INSENSITIVE without UNICODE_CASE), `\b` as a word/non-word ASCII
  * boundary, unmatched `<` kept literal, and an unclosed `<script>`
  * matching nothing (the engine finds no `</script>` and moves on).
  *
  * Reference scope: the HTML-extraction front of the curation funnel (the
  * step the reference's crawl jobs run before UserBehavior parsing; see
  * SURVEY.md §2 pipeline table).
  */
case class HtmlBlockScores(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"html_block_scores expects a string input, got ${child.dataType}")

  override def dataType: DataType = HtmlFunctions.scoresType

  override def nullSafeEval(s: Any): Any =
    HtmlFunctions.blockScores(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HtmlFunctions.blockScores($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HtmlFunctions {

  /** array<struct<vis,n,ln,ns>> — the shape the legacy `transform` built. */
  val scoresType: DataType = ArrayType(StructType(Seq(
    StructField("vis", StringType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("ln", IntegerType, nullable = false),
    StructField("ns", IntegerType, nullable = false))), containsNull = false)

  /** Block-tag alternation of `TextAnalysis.HtmlBlockSplitRe`, minus the
    * `h[1-6]` class (handled positionally). Each candidate is tried with
    * its own trailing-`\b` test, so list order is immaterial (`header` vs
    * `head` vs `h[1-6]` are disjoint once the boundary is required). */
  private val blockTags: Array[String] = Array(
    "p", "div", "nav", "footer", "header", "li", "ul", "ol", "table", "tr",
    "td", "th", "section", "article", "aside", "title", "body", "html", "head")

  private val stopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    // mirror of TextAnalysis.stopwords (asserted equal by HtmlNativeSpec)
    Seq("the", "a", "of", "and", "or", "in", "on", "is").foreach(s.add)
    s
  }

  /** The hard-coded stopword mirror, for the spec that pins it to
    * `TextAnalysis.stopwords`. */
  private[graft] def stopwordsMirror: Set[String] = {
    val it = stopwordSet.iterator()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  @inline private def fold(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** ASCII-only ignore-case literal match (Java `(?i)` without
    * UNICODE_CASE). `lit` must be lowercase ASCII. */
  private def matchesAt(s: String, pos: Int, lit: String): Boolean = {
    val ll = lit.length
    if (pos + ll > s.length) return false
    var i = 0
    while (i < ll) {
      if (fold(s.charAt(pos + i)) != lit.charAt(i)) return false
      i += 1
    }
    true
  }

  /** First case-insensitive occurrence of lowercase-ASCII `lit` at or after
    * `from`, or -1 — the non-greedy `.*?…</tag>` scan. */
  private def indexOfIgnoreCase(s: String, lit: String, from: Int): Int = {
    val n = s.length - lit.length
    var i = if (from < 0) 0 else from
    while (i <= n) {
      if (matchesAt(s, i, lit)) return i
      i += 1
    }
    -1
  }

  /** `regexp_replace(s, "(?is)<name[^>]*>.*?</name>", " ")` for a literal
    * element name: prefix-match the open tag (no `\b` in the source
    * pattern), scan `[^>]*` to the first `>`, then to the nearest
    * case-insensitive `</name>`. A failed attempt leaves the text alone
    * and resumes one char later, exactly like the regex engine. */
  private def removeElement(s: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name + ">"
    val len = s.length
    var sb: java.lang.StringBuilder = null
    var last = 0
    var i = s.indexOf('<')
    while (i >= 0 && i < len) {
      var next = i + 1
      if (matchesAt(s, i, open)) {
        var j = i + open.length
        while (j < len && s.charAt(j) != '>') j += 1
        if (j < len) {
          val k = indexOfIgnoreCase(s, close, j + 1)
          if (k >= 0) {
            if (sb == null) sb = new java.lang.StringBuilder(len)
            sb.append(s, last, i).append(' ')
            last = k + close.length
            next = last
          }
        }
      }
      i = if (next < len) s.indexOf('<', next) else -1
    }
    if (sb == null) s else sb.append(s, last, len).toString
  }

  /** Length of the block-tag name matched at `pos` (after `<` and the
    * optional `/`) with a satisfied trailing `\b`, or -1. */
  private def matchBlockTag(s: String, pos: Int): Int = {
    val len = s.length
    // h[1-6]
    if (pos + 1 < len && fold(s.charAt(pos)) == 'h') {
      val d = s.charAt(pos + 1)
      if (d >= '1' && d <= '6' && (pos + 2 >= len || !isWordChar(s.charAt(pos + 2))))
        return 2
    }
    var t = 0
    while (t < blockTags.length) {
      val name = blockTags(t)
      if (matchesAt(s, pos, name)) {
        val end = pos + name.length
        if (end >= len || !isWordChar(s.charAt(end))) return name.length
      }
      t += 1
    }
    -1
  }

  /** `split(s, "(?i)</?(?:TAGS)\b[^>]*>")` with Java's limit -1: every
    * piece, leading/trailing empties included. */
  private def splitBlocks(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](16)
    val len = s.length
    var last = 0
    var i = s.indexOf('<')
    while (i >= 0 && i < len) {
      var q = i + 1
      if (q < len && s.charAt(q) == '/') q += 1
      val nl = matchBlockTag(s, q)
      var advanced = false
      if (nl > 0) {
        var j = q + nl
        while (j < len && s.charAt(j) != '>') j += 1
        if (j < len) {
          out.add(s.substring(last, i))
          last = j + 1
          i = if (last < len) s.indexOf('<', last) else -1
          advanced = true
        }
      }
      if (!advanced) i = s.indexOf('<', i + 1)
    }
    out.add(s.substring(last))
    out
  }

  @inline private def isJavaSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One pass fusing `regexp_replace(b, "<[^>]*>", " ")` →
    * `regexp_replace(_, "\\s+", " ")` → `trim(_)`: tags become spaces,
    * whitespace runs collapse, edges trim. An unclosed `<` stays literal
    * (the regex finds no `>` to finish `[^>]*>`). */
  private def stripCollapse(b: String): String = {
    val len = b.length
    val sb = new java.lang.StringBuilder(len)
    var pendingSpace = false
    var i = 0
    while (i < len) {
      val c = b.charAt(i)
      if (c == '<') {
        val j = b.indexOf('>', i + 1)
        if (j >= 0) {
          if (sb.length > 0) pendingSpace = true
          i = j + 1
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
          i += 1
        }
      } else if (isJavaSpace(c)) {
        if (sb.length > 0) pendingSpace = true
        i += 1
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** The sequential entity decode the legacy chain applies AFTER collapse:
    * `&lt;` → `<`, `&gt;` → `>`, `&quot;` → `"`, `&amp;` → `&`, each a
    * full left-to-right literal pass (String.replace ≡ UTF8String.replace
    * for ASCII needles). */
  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")
  }

  /** `regexp_extract_all(b, "(?is)<a\b[^>]*>(.*?)</a>", 1)` joined with a
    * single space (`concat_ws(" ", …)`; empty array → ""). */
  private def anchorText(b: String): String = {
    val len = b.length
    var i = b.indexOf('<')
    var sb: java.lang.StringBuilder = null
    while (i >= 0 && i < len) {
      var next = i + 1
      if (i + 1 < len && fold(b.charAt(i + 1)) == 'a' &&
          (i + 2 >= len || !isWordChar(b.charAt(i + 2)))) {
        var j = i + 2
        while (j < len && b.charAt(j) != '>') j += 1
        if (j < len) {
          val k = indexOfIgnoreCase(b, "</a>", j + 1)
          if (k >= 0) {
            if (sb == null) sb = new java.lang.StringBuilder(32)
            else sb.append(' ')
            sb.append(b, j + 1, k)
            next = k + 4
          }
        }
      }
      i = b.indexOf('<', next)
    }
    if (sb == null) "" else sb.toString
  }

  /** `size(filter(split(lower(vis), " "), t => t.isin(stopwords)))` —
    * lower via UTF8String (Spark's Lower), tokens split on the single
    * space the collapse guarantees. */
  private def stopwordTokens(vis: UTF8String): Int = {
    val lowered = vis.toLowerCase.toString
    var count = 0
    var start = 0
    val len = lowered.length
    var i = 0
    while (i <= len) {
      if (i == len || lowered.charAt(i) == ' ') {
        if (stopwordSet.contains(lowered.substring(start, i))) count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }

  /** The full scored-block array for one page. Shared by the interpreted
    * and codegen paths. */
  def blockScores(html: UTF8String): ArrayData = {
    val noScript = removeElement(removeElement(html.toString, "script"), "style")
    val blocks = splitBlocks(noScript)
    val m = blocks.size()
    val rows = new Array[Any](m)
    var i = 0
    while (i < m) {
      val b = blocks.get(i)
      val vis = UTF8String.fromString(unescape(stripCollapse(b)))
      val n = vis.numChars()
      val ln =
        if (b.indexOf('<') < 0) 0 // no tags → no anchors
        else UTF8String.fromString(unescape(stripCollapse(anchorText(b)))).numChars()
      val ns = stopwordTokens(vis) // empty vis → the [""] token, never a stopword
      rows(i) = new GenericInternalRow(Array[Any](vis, n, ln, ns))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** `html_block_scores(html)` as a Column. */
  def htmlBlockScores(html: Column): Column =
    GraftColumnBridge.column(HtmlBlockScores(GraftColumnBridge.expression(html)))
}
