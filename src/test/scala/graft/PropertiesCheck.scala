package graft

import graft.model._
import graft.state.Machines
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import java.sql.Timestamp

/** ScalaCheck properties (SURVEY.md §5.4) — machine semantics against naive
  * reference folds (via TestGroupState, no Spark jobs), pane-membership
  * conservation, hash-mix injectivity, Bloom bounds.
  */
object PropertiesCheck extends Properties("graft") {

  private val genEvents: Gen[List[Event]] = Gen.listOf(for {
    id <- Gen.choose(0L, 1000L)
    sec <- Gen.choose(0L, 500L)
    typ <- Gen.oneOf("error", "click")
  } yield Event(id, new Timestamp(sec * 1000), 1L, typ))

  import org.apache.spark.api.java.Optional

  property("login machine == naive pairwise fold") = forAll(genEvents) { evs =>
    val state = TestGroupState.create[LoginState](
      Optional.empty[LoginState](), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long](), false)
    val machine = Machines.loginFailFn(gapSec = 60)(1L, evs.iterator, state).toList

    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    val naive = sorted.zip(sorted.drop(1)).collect {
      case (a, b) if a.event_type == "error" && b.event_type == "error"
        && (b.ts.getTime - a.ts.getTime) / 1000 <= 60 =>
        LoginWarning(1L, a.ts.getTime / 1000, b.ts.getTime / 1000)
    }
    machine == naive
  }

  property("every second lands in exactly size/slide sliding panes") =
    forAll(Gen.choose(0L, 10_000_000L)) { e =>
      val (size, slide) = (3600L, 600L)
      // pane starts aligned to slide with s <= e < s + size
      val starts = (e - size + 1 to e).filter(s => s >= 0 && s % slide == 0 && s <= e && e < s + size)
      e < size || starts.size == size / slide
    }

  property("rotate-xor minhash mix is injective") =
    forAll(Gen.listOf(Gen.choose(0L, (1L << 60) - 1))) { hs =>
      // mirror of Dedup.mixExpr for j=5
      val r = (5 * 7) % 59 + 1
      val m = 1L << (60 - r)
      val k = (0x9E3779B97F4A7C15L * 6) & ((1L << 60) - 1)
      def mix(h: Long) = ((h % m) * (1L << r) + h / m) ^ k
      hs.distinct.map(mix).distinct.size == hs.distinct.size
    }

  property("bloom-gated count: <= distinct, exact for small sets") =
    forAll(Gen.listOf(Gen.choose(0L, 100000L))) { vs =>
      val agg = new graft.agg.BloomDistinct(numBits = 1 << 16)
      val count = vs.foldLeft(agg.zero)(agg.reduce).count
      val distinct = vs.distinct.size
      count <= distinct && count >= (distinct * 0.9).toLong
    }

  property("union-find regression: lazy keysIterator entry drop") = {
    // the exact fuzz case that exposed resolving find() lazily over
    // keysIterator while path compression mutates the map: 2 of 11
    // vertices vanished from the output (25 and 31 here)
    val edges = Array((11L, 9L), (16L, 40L), (4L, 7L), (16L, 7L),
      (31L, 38L), (17L, 25L), (37L, 37L))
    val got = graft.pipeline.Graph.unionFind(edges).toMap
    org.scalacheck.Prop(got == Map(
      4L -> 4L, 7L -> 4L, 9L -> 9L, 11L -> 9L, 16L -> 4L, 40L -> 4L,
      17L -> 17L, 25L -> 17L, 31L -> 31L, 38L -> 31L, 37L -> 37L))
  }

  property("union-find == naive transitive closure with min labels") =
    forAll(Gen.listOf(for {
      a <- Gen.choose(0L, 40L); b <- Gen.choose(0L, 40L)
    } yield (a, b))) { edges =>
      val got = graft.pipeline.Graph.unionFind(edges.toArray).toMap
      // naive fixpoint: propagate mins over the adjacency until stable
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      var lbl = verts.map(v => v -> v).toMap
      var stable = false
      while (!stable) {
        val next = lbl.map { case (v, l) =>
          v -> (l +: adj.getOrElse(v, Nil).map(lbl)).min }
        stable = next == lbl; lbl = next
      }
      got == lbl
    }

  property("order machine: every signup resolved exactly once after flush") =
    forAll(genEvents.map(_.map(e =>
      e.copy(event_type = if (e.event_type == "error") "signup" else "purchase")))) { evs =>
      val state = TestGroupState.create[OrderState](
        Optional.empty[OrderState](), GroupStateTimeout.NoTimeout, 0L,
        Optional.empty[Long](), false)
      val live = Machines.orderTimeoutFn(timeoutSec = 60)(1L, evs.iterator, state).toList
      val flushed = state.getOption.toSeq.flatMap(s => Machines.orderFlush(1L, s))
      val results = live ++ flushed
      val signups = evs.count(_.event_type == "signup")
      results.size == signups &&
        results.map(_.order_id).sorted ==
          evs.filter(_.event_type == "signup").map(_.event_id).sorted
    }

  // ── HtmlBlockScores fuzz: hand scanner == java.util.regex ground truth ──
  // (Spark's regexp_* functions are thin wrappers over java.util.regex, so
  // the Pattern-based pipeline below IS the legacy chain's semantics; the
  // Spark-level A/B lives in HtmlNativeSpec.)

  private object HtmlTruth {
    import java.util.regex.Pattern
    import org.apache.spark.unsafe.types.UTF8String
    val scriptRe = Pattern.compile("(?is)<script[^>]*>.*?</script>")
    val styleRe = Pattern.compile("(?is)<style[^>]*>.*?</style>")
    val blockRe = Pattern.compile(
      "(?i)</?(?:p|div|nav|footer|header|h[1-6]|li|ul|ol|table|tr|td|th|" +
        "section|article|aside|title|body|html|head)\\b[^>]*>")
    val tagRe = Pattern.compile("<[^>]*>")
    val wsRe = Pattern.compile("\\s+")
    val anchorRe = Pattern.compile("(?is)<a\\b[^>]*>(.*?)</a>")
    val stop = Set("the", "a", "of", "and", "or", "in", "on", "is")

    private def vis(s: String): String = {
      val collapsed = wsRe.matcher(tagRe.matcher(s).replaceAll(" ")).replaceAll(" ")
      UTF8String.fromString(collapsed).trim().toString
        .replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&amp;", "&")
    }

    def score(html: String): Seq[(String, Int, Int, Int)] = {
      val nos = styleRe.matcher(scriptRe.matcher(html).replaceAll(" ")).replaceAll(" ")
      blockRe.split(nos, -1).toSeq.map { b =>
        val v = vis(b)
        val m = anchorRe.matcher(b)
        val parts = scala.collection.mutable.ArrayBuffer[String]()
        while (m.find()) parts += m.group(1)
        val lv = vis(parts.mkString(" "))
        val ns = UTF8String.fromString(v).toLowerCase.toString
          .split(" ", -1).count(stop.contains)
        (v, UTF8String.fromString(v).numChars(),
          UTF8String.fromString(lv).numChars(), ns)
      }
    }

    def native(html: String): Seq[(String, Int, Int, Int)] = {
      val ad = graft.functions.HtmlFunctions
        .blockScores(UTF8String.fromString(html))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until ad.numElements()).map { i =>
        val r = ad.getStruct(i, 4)
        (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3))
      }
    }
  }

  private val genSoup: Gen[String] = {
    val frag = Gen.frequency(
      8 -> Gen.oneOf(
        "<p>", "</p>", "<div class=\"x\">", "<DIV>", "<pre>", "<h2>", "<h7>",
        "<header>", "<head>", "<heady>", "<li>", "<td >", "<title>",
        "</body>", "<li$ x>", "<script>", "</script>", "<script src=a>",
        "<style>", "</style>", "<ScRiPt>", "</sCrIpT>",
        "<a href=\"/x\">", "</a>", "<a>", "<ab>", "<A HREF=X>", "</ab>",
        "&amp;", "&lt;", "&gt;", "&quot;", "&amp;lt;",
        "<", ">", "</", " ", "\t", "\n", "\u000B", "\f", "\r",
        "of", "the", "The", "IS", "on", "word", "a", "xyz", "café", "1_a"),
      2 -> Gen.alphaNumStr.map(_.take(6)))
    Gen.listOf(frag).map(_.mkString)
  }

  property("html block scorer == java.util.regex ground truth on tag soup") =
    forAll(genSoup) { html =>
      HtmlTruth.native(html) == HtmlTruth.score(html)
    }

  // ── TokenGramHashes fuzz: byte-level kernel == split/sliding/md5 truth ──

  private def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  private val genTokSoup: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.oneOf("word", "a", "of", "αβγ", "x1", "don't", "tab\there", "😀"),
    4 -> Gen.const(" "), 1 -> Gen.const("  "))).map(_.mkString)

  property("token gram hashes == split/sliding/md5 ground truth") =
    forAll(genTokSoup, Gen.choose(1, 4)) { (text, n) =>
      val toks = text.split(" ", -1).filter(_.nonEmpty).toSeq
      val want =
        if (toks.length < n) Seq.empty[Long]
        else toks.sliding(n).map(g => md5Long60(g.mkString(" "))).toSeq
      val got = graft.functions.TextFunctions
        .tokenGramHashes(org.apache.spark.unsafe.types.UTF8String.fromString(text), n)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      got == want
    }
}
