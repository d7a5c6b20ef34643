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

  test("native docEntropy lnFp parity across count magnitudes") {
    import spark.implicits._
    // single-char docs of length k: lnFp runs on exactly the count k —
    // sweeps the log/round interplay across magnitudes against the legacy
    // Column-expression form. k is capped: the LEGACY chain's
    // substr(text, p, 1) seeks code point p from the string start, so its
    // per-doc cost is O(n²) byte scans (the native fold is linear — this
    // cap is a legacy-side constraint, not a native one)
    val ks = Seq(1, 2, 3, 7, 10, 99, 100, 101, 1000, 4096, 16384,
      20000) ++ (1 to 150).map(_ * 97)
    val docs = ks.zipWithIndex
      .map { case (k, i) => (i.toLong, "a" * k + "b" * (k / 3) + "c") }
      .toDF("doc_id", "text")
    ab(docs)
  }

  /** The pre-native gopher battery, verbatim — the spec's ground truth. */
  private def legacyGopherStats(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
    documents
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_words"),
        aggregate(col("t"), lit(0L), (a, x) => a + length(x)).as("sum_len"),
        size(array_intersect(col("t"), stopArr)).cast("long").as("n_stop_types"),
        size(filter(col("t"), x => x.rlike("[a-zA-Z]"))).cast("long").as("n_alpha"),
        greatest(size(col("t")) - 1, lit(0)).cast("long").as("n_bg"),
        size(array_distinct(arrays_zip(
          slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))))
          .cast("long").as("n_bg_dist"))
  }

  private def gopherAb(docs: DataFrame): Unit = {
    val got = docs.select(col("doc_id"),
        graft.functions.TextFunctions.gopherStats(col("text")).as("s"))
      .select(col("doc_id"), col("s.n_words"), col("s.sum_len"),
        col("s.n_stop_types"), col("s.n_alpha"),
        // the production mapping in gopherRulesCore: legacy greatest(…, 0)
        // ignores nulls, so NULL text still reports n_bg = 0
        coalesce(col("s.n_bg"), lit(0L)).as("n_bg"), col("s.n_bg_dist"))
      .orderBy("doc_id").collect()
    val want = legacyGopherStats(docs).orderBy("doc_id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"gopher diverges: $g vs $w") }
  }

  test("native gopher stats == array-lambda battery on sf0.001 documents") {
    gopherAb(spark.read.parquet(s"${sf()}/documents.parquet"))
  }

  test("native gopher stats == array-lambda battery on adversarial fixtures") {
    import spark.implicits._
    gopherAb(Seq(
      (1L, ""), (2L, " "), (3L, "   a   b  "), (4L, "the the a of the"),
      (5L, "hello\tworld x"), // tab stays inside a token
      (6L, "αβ γ 123 !!!"), (7L, "solo"),
      (8L, "a b a b a"), // repeated bigrams
      (9L, "1:ab c 1:a bc"), // injective pair-encoding trap
      (10L, "The A Of"), // case-sensitive stopword match
      (11L, "x 😀 y 😀 x"), // code-point lengths
      (12L, null.asInstanceOf[String])
    ).toDF("doc_id", "text"))
  }

  test("native token-gram hashes == legacy shingle-string md5Long path") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionAll(Seq(
        (100001L, ""), (100002L, "one"), (100003L, "one two"),
        (100004L, "  padded   tokens  here and there  "),
        (100005L, "tab\tinside stays one token with more words"),
        (100006L, "αβ γ δε ζ η unicode tokens"),
        (100007L, "a a a a a repeated"),
        (100008L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    def multiset(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val legacy = multiset(pipeline.Dedup.shingles(docs)
      .select(col("doc_id"), C.md5Long(col("shingle")).as("h0")))
    val native = multiset(docs.select(col("doc_id"), explode(
      graft.functions.TextFunctions.tokenGramHashes(col("text"), 3)).as("h0")))
    assert(native == legacy)
    // and the dsir feature arity pair (1-grams + 2-grams)
    val legacyFeats = multiset(docs.select(col("doc_id"), explode(concat(
        TextAnalysis.tokens(col("text")),
        transform(TextAnalysis.bigramArray(col("text")),
          bg => concat_ws(" ", bg("w1"), bg("w2"))))).as("feat"))
      .select(col("doc_id"), C.md5Long(col("feat")).as("h0")))
    val nativeFeats = multiset(docs.select(col("doc_id"), explode(concat(
      graft.functions.TextFunctions.tokenGramHashes(col("text"), 1),
      graft.functions.TextFunctions.tokenGramHashes(col("text"), 2))).as("h0")))
    assert(nativeFeats == legacyFeats)
  }

  test("native docRepetition == legacy transform chain") {
    import spark.implicits._
    val legacyCore: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = docs => {
      val toks = TextAnalysis.tokens(col("text"))
      docs.select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1)))
            .as("bigrams"))
        .select(col("doc_id"),
          size(col("bigrams")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bigrams"))).cast("long").as("n_distinct_bigrams"))
        .withColumn("dup_frac",
          lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
        .withColumn("keep", when(col("dup_frac") <= TextAnalysis.RepetitionMax, 1L).otherwise(0L))
    }
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((100001L, ""), (100002L, "solo"), (100003L, "a b a b a"),
        (100004L, "x y"), (100005L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = TextAnalysis.docRepetitionCore(docs).orderBy("doc_id").collect()
    val want = legacyCore(docs).orderBy("doc_id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"repetition diverges: $g vs $w") }
  }

  test("native simhash == grouped vote form") {
    import spark.implicits._
    val SimBits = 48
    val legacy: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = docs => {
      val tokHash = docs
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("doc_id"), C.md5Long(col("tok")).as("h"))
      val voteAggs = (0 until SimBits).map { b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
      }
      val votes = tokHash.groupBy(col("doc_id")).agg(voteAggs.head, voteAggs.tail: _*)
      val sim = (0 until SimBits)
        .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      votes.select(col("doc_id"), sim.as("simhash"))
    }
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((200001L, ""), (200002L, "   "), (200003L, "one"),
        (200004L, "a a a b"), (200005L, "αβ γ tokens vote"),
        (200006L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = pipeline.Dedup.simhashCore(docs).orderBy("doc_id").collect()
    val want = legacy(docs).orderBy("doc_id").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"simhash diverges: $g vs $w") }
  }

  test("native marker counts == per-group filter lambdas (langId argmax inputs)") {
    import spark.implicits._
    val groups = Seq(
      Seq("the", "a", "of", "and"), Seq("der", "die", "das", "und"),
      Seq("el", "los", "una", "y"), Seq("le", "les", "une", "et"))
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionAll(Seq((300001L, ""), (300002L, "the und y et the"),
        (300003L, "no markers here"), (300004L, "a  a   a"),
        (300005L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val toks = TextAnalysis.tokens(col("text"))
    val want = docs.select(Seq(col("doc_id")) ++ groups.zipWithIndex.map { case (ms, i) =>
        size(filter(toks, t => t.isin(ms.map(lit): _*))).cast("long").as(s"s$i")
      }: _*).orderBy("doc_id").collect()
    val mc = graft.functions.TextFunctions.markerCounts(col("text"), groups)
    val got = docs.select(Seq(col("doc_id")) ++ groups.indices.map(i =>
        element_at(mc, i + 1).as(s"s$i")): _*).orderBy("doc_id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"markers diverge: $g vs $w") }
  }

  test("marker counts compiles under whole-stage codegen (no interpreted fallback)") {
    // pin the ADVICE-r14 fix: the reference-object cast must use the
    // erased raw HashMap type — a generic cast can fail Janino compilation
    // and silently fall back to the interpreted path. Generating the
    // unsafe projection directly makes a compile failure loud.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, codegen}
    import org.apache.spark.sql.types.StringType
    val expr = graft.functions.MarkerCounts(
      BoundReference(0, StringType, nullable = true),
      Seq(Seq("the", "a"), Seq("der", "und")))
    val proj = codegen.GenerateUnsafeProjection.generate(Seq(expr))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("the und the"))
    val out = proj(row).getArray(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 1L)
  }

  /** The pre-native bpeMergeApply merge + pair emission, verbatim — the
    * gaps-and-islands window algebra over (doc, token, char) rows. Ground
    * truth for [[graft.functions.BpeMergeAdjPairs]].
    */
  private def legacyMergePairs(docs: DataFrame, m1: String, m2: String): Set[(Long, String, String, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val occW = Window.partitionBy(col("doc_id"), col("tidx")).orderBy(col("p"))
    val chars = docs
      .select(col("doc_id"), posexplode(TextAnalysis.tokens(col("text"))).as(Seq("tidx", "w")))
      .select(col("doc_id"), col("tidx"), col("w"),
        explode(sequence(lit(1), length(col("w")))).as("p"))
      .withColumn("is_m",
        col("p") < length(col("w")) &&
          col("w").substr(col("p"), lit(1)) === lit(m1) &&
          col("w").substr(col("p") + 1, lit(1)) === lit(m2))
    val syms = chars
      .withColumn("run_start",
        coalesce(max(when(!col("is_m"), col("p"))).over(occW), lit(0)) + 1)
      .withColumn("selected", col("is_m") && (col("p") - col("run_start")) % 2 === 0)
      .withColumn("consumed", coalesce(lag(col("selected"), 1).over(occW), lit(false)))
      .filter(!col("consumed"))
      .select(col("doc_id"), col("tidx"), col("p"),
        when(col("selected"), col("w").substr(col("p"), lit(2)))
          .otherwise(col("w").substr(col("p"), lit(1))).as("sym"))
    syms
      .withColumn("s2", lead(col("sym"), 1).over(occW))
      .filter(col("s2").isNotNull)
      .groupBy(col("doc_id"), col("sym"), col("s2")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
  }

  private def nativeMergePairs(docs: DataFrame, m1: String, m2: String): Set[(Long, String, String, Long)] =
    docs.select(col("doc_id"),
        explode(TextFunctions.bpeMergeAdjPairs(col("text"), lit(m1), lit(m2))).as("pr"))
      .groupBy(col("doc_id"), col("pr.s1"), col("pr.s2")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  test("native BPE merge pairs == window algebra on sf0.001 documents") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    // the real elected pair at sf0.001 plus a self-pair to force overlaps
    Seq(("t", "h"), ("e", "e"), ("a", "a")).foreach { case (a, b) =>
      assert(nativeMergePairs(docs, a, b) == legacyMergePairs(docs, a, b), s"pair ($a,$b)")
    }
  }

  test("native BPE merge pairs == window algebra on edge fixtures") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa aaaa aaaaa"),          // overlap runs: even offsets only
      (2L, "ab abab ababab"),          // alternating matches
      (3L, "x y z"),                   // single-char tokens, no pairs
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "café née aée"),            // multibyte merge target
      (7L, "😀a😀a 😀😀"),              // 4-byte code points
      (8L, "  double  spaces  a  "),   // empty splits dropped
      (9L, "aab baa aba")
    ).toDF("doc_id", "text")
    Seq(("a", "a"), ("a", "b"), ("é", "e"), ("😀", "a"), ("😀", "😀")).foreach { case (a, b) =>
      assert(nativeMergePairs(docs, a, b) == legacyMergePairs(docs, a, b), s"pair ($a,$b)")
    }
    // multi-code-point merge operand never matches (substr(w,p,1) semantics)
    assert(nativeMergePairs(docs, "aa", "b") == legacyMergePairs(docs, "aa", "b"))
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
