package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-frontier URL operators — the step a web-scale training-data
  * pipeline runs BEFORE fetching (frontier dedup) and again after
  * crawling (alias collapse): canonicalize each URL, then dedup at the
  * canonical-URL level. The reference has no crawl layer (its sources are
  * fixed CSVs, `H/HotItemsAnalysis/HotItems.scala:40`); this module is
  * part of the beyond-reference training-data front alongside
  * [[TextAnalysis.htmlExtract]].
  *
  * Canonicalization rules (the standard crawl-dedup set): scheme and host
  * lowercase, leading `www.` stripped, default port stripped (`:443` for
  * https, `:80` for http), fragment dropped, trailing path slash stripped
  * (root stays `/`), tracking params dropped (`utm_*`, `fbclid`, `gclid`,
  * `msclkid`, `ref`), remaining query params sorted bytewise. Path CASE is
  * preserved (paths are case-sensitive; only scheme/host fold).
  *
  * Shape at 100 TB: canonicalization is pure expression code (regexp
  * extract/replace + array filter/sort inside whole-stage codegen) — a
  * map-only pass with NO shuffle, no explode, no UDF. The dedup is one
  * hash-agg over the canonical string with map-side combine: a hot URL
  * adds one row per map partition to the exchange, never a pair
  * explosion. Stateless core, so the identical plan runs under
  * Structured Streaming ([[graft.streaming.StreamJobs.urlCanonicalizeStream]]).
  */
object Web {

  /** Query-param keys dropped by canonicalization (shared with the SQL
    * twin; declared above every use — object-val init order). */
  private[graft] val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  /** Deterministic messy-URL synthesis over the documents table — six
    * alias classes of the SAME logical page (host keyed `doc_id % 40`,
    * path keyed `doc_id % 120`): bare, SHOUTED `WWW.` host + trailing
    * slash, explicit `:443`, fragment + tracking params, unsorted params,
    * `www.` + `fbclid` noise. Variants 0–3 collapse to one canonical URL
    * and 4–5 to its `?a=1&b=2` sibling, so [[dedupUrl]] has real aliasing
    * to resolve at every scale factor.
    */
  def urlWrap(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), urlWrapExpr(col("doc_id")).as("raw_url"))

  /** The wrap expression parameterized by the id column. Every component
    * is a mod of the id by a divisor of [[UrlResidues]], so the wrap (and
    * everything derived from it) is a pure function of `id % UrlResidues`.
    */
  private def urlWrapExpr(id: Column): Column = {
    val h = (id % 40).cast("string")
    val p = (id % 120).cast("string")
    val v = id % 6
    when(v === 0, concat(lit("https://example-"), h, lit(".com/p/"), p))
      .when(v === 1, concat(lit("HTTPS://WWW.EXAMPLE-"), h, lit(".COM/p/"), p, lit("/")))
      .when(v === 2, concat(lit("https://example-"), h, lit(".com:443/p/"), p, lit("#section-2")))
      .when(v === 3, concat(lit("https://example-"), h, lit(".com/p/"), p,
        lit("?utm_source=feed&utm_medium=rss")))
      .when(v === 4, concat(lit("https://example-"), h, lit(".com/p/"), p, lit("?b=2&a=1")))
      .otherwise(concat(lit("https://www.example-"), h, lit(".com/p/"), p,
        lit("?a=1&fbclid=abc123&b=2")))
  }

  /** lcm(40, 120, 6): the wrap's full period in doc_id. */
  private[graft] val UrlResidues = 120L

  /** (uk, raw_url, canon_url) for every doc_id residue present in the
    * corpus — at most [[UrlResidues]] rows, so the entire regex battery of
    * [[canonicalUrl]] runs a bounded number of times regardless of corpus
    * size and rides a broadcast hash join back onto the docs. Mirrored by
    * the residue CTEs in [[urlCtesSql]].
    */
  private def urlLookup(documents: DataFrame): DataFrame = {
    val wrapped = documents
      .select((col("doc_id") % UrlResidues).as("uk")).distinct()
      .select(col("uk"), urlWrapExpr(col("uk")).as("raw_url"))
    broadcast(wrapped.select(col("uk"), col("raw_url"),
      canonicalUrl(col("raw_url")).as("canon_url")))
  }

  /** raw_url → canonical URL column (the whole operator; everything else
    * in this module is packaging around it). */
  private[graft] def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val noFrag = regexp_replace(
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "#.*$", "")
    val hostportRaw = regexp_extract(noFrag, "^([^/?]*)", 1)
    val noWww = regexp_replace(lower(hostportRaw), "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val pathq = substring(noFrag, length(hostportRaw) + 1, lit(1 << 30))
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(rawPath === "" , lit("/"))
      .otherwise(regexp_replace(rawPath, "(.)/$", "$1"))
    val query = when(pathq.contains("?"),
      substring(pathq, length(rawPath) + 2, lit(1 << 30))).otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"),
      x => x =!= "" && !x.rlike(TrackingParamRe)))
    val canonQ = concat_ws("&", kept)
    concat(scheme, lit("://"), host, path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
  }

  /** Map-only core: (doc_id, raw_url, canon_url) — stateless, so the
    * identical plan serves batch and streaming. */
  def urlCanonicalizeCore(urls: DataFrame): DataFrame =
    urls.select(col("doc_id"), col("raw_url"),
      canonicalUrl(col("raw_url")).as("canon_url"))

  def urlCanonicalize(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), (col("doc_id") % UrlResidues).as("uk"))
      .join(urlLookup(documents), Seq("uk"))
      .select(col("doc_id"), col("raw_url"), col("canon_url"))
      .orderBy(col("doc_id"))

  /** Canonical-URL dedup — the residue lookup again, then one hash-agg
    * (map-side combine); min doc_id is the deterministic keeper, alias
    * count per canonical URL. */
  def dedupUrl(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), (col("doc_id") % UrlResidues).as("uk"))
      .join(urlLookup(documents), Seq("uk"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_aliases"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy(col("canon_url"))

  // ---- DuckDB twins ----

  /** Shared wrap + canonicalize CTEs (DuckDB dialect: `\\1` backrefs,
    * list_filter/list_sort, strpos). Same rules, same regexes. */
  private def urlCtesSql: String =
    s"""u AS (
       |  -- residue quotient: the wrap is a pure function of doc_id % $UrlResidues
       |  -- (every alias key divides it), so the regex chain below runs once
       |  -- per residue and the x CTE expands back onto the docs
       |  SELECT DISTINCT doc_id % $UrlResidues AS uk FROM documents
       |), w AS (
       |  SELECT uk,
       |         CASE uk % 6
       |           WHEN 0 THEN 'https://example-' || (uk % 40) || '.com/p/' || (uk % 120)
       |           WHEN 1 THEN 'HTTPS://WWW.EXAMPLE-' || (uk % 40) || '.COM/p/' || (uk % 120) || '/'
       |           WHEN 2 THEN 'https://example-' || (uk % 40) || '.com:443/p/' || (uk % 120) || '#section-2'
       |           WHEN 3 THEN 'https://example-' || (uk % 40) || '.com/p/' || (uk % 120) || '?utm_source=feed&utm_medium=rss'
       |           WHEN 4 THEN 'https://example-' || (uk % 40) || '.com/p/' || (uk % 120) || '?b=2&a=1'
       |           ELSE 'https://www.example-' || (uk % 40) || '.com/p/' || (uk % 120) || '?a=1&fbclid=abc123&b=2'
       |         END AS raw_url
       |  FROM u
       |), p1 AS (
       |  SELECT uk, raw_url,
       |         lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |         regexp_replace(regexp_replace(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$$', '') AS nofrag
       |  FROM w
       |), p2 AS (
       |  SELECT *, regexp_extract(nofrag, '^([^/?]*)', 1) AS hostport_raw FROM p1
       |), p3 AS (
       |  SELECT *,
       |         CASE scheme
       |           WHEN 'https' THEN regexp_replace(regexp_replace(lower(hostport_raw), '^www\\.', ''), ':443$$', '')
       |           WHEN 'http'  THEN regexp_replace(regexp_replace(lower(hostport_raw), '^www\\.', ''), ':80$$', '')
       |           ELSE regexp_replace(lower(hostport_raw), '^www\\.', '')
       |         END AS host,
       |         substr(nofrag, length(hostport_raw) + 1) AS pathq
       |  FROM p2
       |), p4 AS (
       |  SELECT *, regexp_extract(pathq, '^([^?]*)', 1) AS raw_path FROM p3
       |), p5 AS (
       |  SELECT *,
       |         CASE WHEN raw_path = '' THEN '/'
       |              ELSE regexp_replace(raw_path, '(.)/$$', '\\1') END AS path,
       |         CASE WHEN strpos(pathq, '?') > 0
       |              THEN substr(pathq, length(raw_path) + 2) ELSE '' END AS query
       |  FROM p4
       |), c AS MATERIALIZED (
       |  SELECT uk, raw_url,
       |         scheme || '://' || host || path ||
       |         CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canon_url
       |  FROM (
       |    -- DuckDB's array_to_string is NULL on an empty list (Spark's
       |    -- concat_ws is ''): coalesce to keep the twins identical
       |    SELECT *, coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
       |             x -> x <> '' AND NOT regexp_matches(x, '$TrackingParamRe'))), '&'), '') AS cq
       |    FROM p5
       |  )
       |), x AS (
       |  SELECT d.doc_id, c.raw_url, c.canon_url
       |  FROM documents d JOIN c ON d.doc_id % $UrlResidues = c.uk
       |)""".stripMargin

  val urlCanonicalizeSql: String =
    s"""WITH $urlCtesSql
       |SELECT doc_id, raw_url, canon_url FROM x ORDER BY doc_id""".stripMargin

  val dedupUrlSql: String =
    s"""WITH $urlCtesSql
       |SELECT canon_url, CAST(count(*) AS BIGINT) AS n_aliases,
       |       min(doc_id) AS keep_doc_id
       |FROM x GROUP BY canon_url ORDER BY canon_url""".stripMargin
}
