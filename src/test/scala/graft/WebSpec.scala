package graft

import org.apache.spark.sql.functions.col
import graft.pipeline.Web

/** Unit fixtures for the crawl-frontier URL family: canonicalization edge
  * cases pinned pair-by-pair, alias collapse counts on the corpus fixture,
  * and the map-only / single-agg plan shapes.
  */
class WebSpec extends SparkSuite {
  import spark.implicits._

  private def canon(raws: String*): Seq[String] = {
    val df = raws.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "raw_url")
    Web.urlCanonicalizeCore(df).orderBy(col("doc_id"))
      .collect().map(_.getString(2)).toSeq
  }

  test("canonicalization: scheme/host fold, www, default port, fragment, slash") {
    assert(canon(
      "https://example.com/p/1",                    // already canonical
      "HTTPS://WWW.Example.COM/p/1/",               // case + www + slash
      "https://example.com:443/p/1#frag",           // default port + fragment
      "http://example.com:80/p/1",                  // http default port
      "http://example.com:8080/p/1",                // NON-default port kept
      "https://example.com",                        // empty path -> /
      "https://example.com/")                       // root slash stays
      == Seq(
        "https://example.com/p/1",
        "https://example.com/p/1",
        "https://example.com/p/1",
        "http://example.com/p/1",
        "http://example.com:8080/p/1",
        "https://example.com/",
        "https://example.com/"))
  }

  test("canonicalization: path case preserved, params filtered and sorted") {
    assert(canon(
      "https://example.com/Path/UPPER",             // path case untouched
      "https://example.com/p?utm_source=x&utm_campaign=y",  // all tracking -> none
      "https://example.com/p?b=2&a=1",              // sorted
      "https://example.com/p?a=1&fbclid=zz&b=2",    // tracking dropped, rest kept
      "https://example.com/p?ref=tw&gclid=1&msclkid=2")     // every tracked key
      == Seq(
        "https://example.com/Path/UPPER",
        "https://example.com/p",
        "https://example.com/p?a=1&b=2",
        "https://example.com/p?a=1&b=2",
        "https://example.com/p"))
  }

  test("corpus fixture: variants 0-3 and 4-5 collapse per (host,path) key") {
    val docs = Tables.documents(spark, sf())
    val d = Web.dedupUrl(docs).collect()
    // every canonical URL either carries a query (?a=1&b=2, variants 4-5)
    // or none (variants 0-3); aliasing is real (some n_aliases > 1)
    assert(d.nonEmpty && d.exists(_.getLong(1) > 1))
    assert(d.forall { r =>
      val u = r.getString(0)
      u.startsWith("https://example-") && !u.contains("#") &&
        !u.contains("www.") && !u.contains("utm_") && !u.contains("fbclid")
    })
    // keeper is the min doc_id of the alias class — spot-check via recompute
    val byCanon = Web.urlCanonicalizeCore(Web.urlWrap(docs))
      .groupBy(col("canon_url"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d.forall(r => byCanon(r.getString(0)) == r.getLong(2)))
  }

  test("plan shape: canonicalize rides the broadcast residue lookup, no doc-sized shuffle") {
    // round 16: the wrap is a pure function of doc_id % UrlResidues, so
    // the regex battery runs on a ≤120-row lookup that BROADCASTS onto the
    // corpus — the doc-sized stream must see a BroadcastHashJoin and no
    // hash exchange (the orderBy's rangepartitioning is presentation-only;
    // the lookup build itself may exchange its ≤120 rows)
    val canonPlan = SparkEntry.queries("url_canonicalize")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(canonPlan.contains("BroadcastHashJoin"),
      "url_canonicalize lost the residue broadcast")
    assert(!canonPlan.contains("text#"),
      "url_canonicalize reads the text column")
    val dedupPlan = SparkEntry.queries("dedup_url")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(dedupPlan.contains("BroadcastHashJoin"),
      "dedup_url lost the residue broadcast")
    // the aggregate over canon_url is the ONE doc-sized hash exchange;
    // the lookup build's tiny exchanges group ≤120-row relations
    assert(dedupPlan.contains("hashpartitioning"),
      "dedup_url lost its aggregate exchange")
  }
}
