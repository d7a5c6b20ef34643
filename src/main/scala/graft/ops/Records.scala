package graft.ops

import graft.C
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured-record curation operators — the row-shaped complement of the
  * text/vector dedup families: record linkage (blocked pairwise
  * edit-distance matching), a k-anonymity audit over a generalization
  * lattice, and market-basket co-occurrence mining. All three are
  * single-digit-shuffle constructions whose pair/group blowups are bounded
  * by construction (block caps, basket sizes), so the shapes hold at
  * 100 TB. (The reference has no structured-record surface; these are
  * training-pipeline additions alongside the document dedup families.)
  */
object Records {

  // ---- record linkage (entity matching) ----

  /** Matched pairs must have name edit distance at most this. */
  private[graft] val MaxEditDist = 2L

  /** Blocks larger than this are dropped before pairing — the standard
    * record-linkage guard against a degenerate blocking key turning the
    * within-block self-join quadratic. Mirrored in the oracle, so the cap
    * is part of the operator's definition, not an approximation.
    */
  private[graft] val BlockCap = 64L

  /** Record linkage over the customer file: near-duplicate customer
    * records found by exact-dedup + blocking + pairwise scoring — the
    * classical entity-resolution shape (Fellegi–Sunter style blocking,
    * deterministic decision rule), QUOTIENT-FACTORIZED like the text dedup
    * families: records identical on every match-relevant field (name,
    * segment, balance) collapse to one representative with a multiplicity,
    * and all pairing runs at rep level. A crawl/replica corpus whose
    * records repeat verbatim costs the same as its distinct core — the cap
    * never sees duplication-induced mega-blocks, and the result carries
    * the full record-pair counts via multiplicities.
    *
    * Blocking key: the name minus its last character (a prefix block —
    * cheap, order-preserving, bounded for suffix-serial identifiers).
    * Within a block, every id-ordered rep pair is scored: a match has name
    * edit distance ≤ [[MaxEditDist]] (Spark's codegen'd `levenshtein`,
    * DuckDB's `levenshtein` — same classical DP, identical integers) AND
    * the same market segment; the account-balance gap is reported as a
    * match feature, not a criterion. A rep with multiplicity m ≥ 2 also
    * emits its within-group row — C(m,2) exact-duplicate record pairs at
    * distance 0.
    *
    * Scale shape: the rep build is one hash-agg over the match fields; one
    * exchange on the block key serves both the block-size window and the
    * self-join (same partitioning); blocks are capped at [[BlockCap]]
    * REPS, so pair work is ≤ C(cap,2) per block — linear in blocks, never
    * quadratic in the table, and invariant under record duplication. No
    * global structure, no driver state.
    *
    * Output: (custkey_a, custkey_b, segment, name_dist, bal_gap, n_pairs)
    * — rep ids (min custkey of each group), a ≤ b, id-ordered; a = b is
    * the within-group exact-duplicate row; `n_pairs` is the number of
    * underlying record pairs (m_a·m_b cross, C(m,2) within).
    */
  def entityMatch(customer: DataFrame): DataFrame = {
    // a 0/1-char name cannot take a prefix block (and NULL keys would
    // silently fall out of the equi-join in Spark but not the oracle's)
    val reps = customer
      .filter(col("c_name").isNotNull && length(col("c_name")) > 1)
      .groupBy(col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .agg(min(col("c_custkey")).as("rep"), count(lit(1)).as("m"))
      .withColumn("blk",
        col("c_name").substr(lit(1), length(col("c_name")) - 1))
    val kept = reps
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("bsz") <= BlockCap)
      .localCheckpoint(eager = true) // both join sides + within rows read it
    val a = kept.select(col("blk"), col("rep").as("custkey_a"),
      col("c_name").as("na"), col("c_mktsegment").as("sa"),
      col("c_acctbal").as("ba"), col("m").as("ma"))
    val b = kept.select(col("blk"), col("rep").as("custkey_b"),
      col("c_name").as("nb"), col("c_mktsegment").as("sb"),
      col("c_acctbal").as("bb"), col("m").as("mb"))
    val cross = a.join(b, Seq("blk"))
      .filter(col("custkey_a") < col("custkey_b"))
      .withColumn("name_dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("name_dist") <= MaxEditDist && col("sa") === col("sb"))
      .select(col("custkey_a"), col("custkey_b"), col("sa").as("segment"),
        col("name_dist"),
        // malformed-measure contract: a NaN/Inf balance makes the gap
        // non-finite -> NULL (the oracle's DECIMAL cast would hard-error)
        C.dec(C.nanNull(abs(col("ba") - col("bb")))).as("bal_gap"),
        (col("ma") * col("mb")).as("n_pairs"))
    val within = kept.filter(col("m") >= 2)
      .select(col("rep").as("custkey_a"), col("rep").as("custkey_b"),
        col("c_mktsegment").as("segment"), lit(0L).as("name_dist"),
        C.dec(lit(0.0)).as("bal_gap"),
        expr("(m * (m - 1)) div 2").as("n_pairs"))
    cross.unionAll(within).orderBy(col("custkey_a"), col("custkey_b"))
  }

  val entityMatchSql: String =
    s"""WITH reps AS (
       |  SELECT c_name, c_mktsegment, c_acctbal,
       |         min(c_custkey) AS rep, count(*) AS m,
       |         substr(c_name, 1, CAST(length(c_name) AS INTEGER) - 1) AS blk
       |  FROM customer
       |  WHERE c_name IS NOT NULL AND length(c_name) > 1
       |  GROUP BY c_name, c_mktsegment, c_acctbal
       |), kept AS (
       |  SELECT * FROM reps
       |  QUALIFY count(*) OVER (PARTITION BY blk) <= $BlockCap
       |)
       |SELECT a.rep AS custkey_a, b.rep AS custkey_b,
       |       a.c_mktsegment AS segment,
       |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist,
       |       CAST(${C.nanNullSql("abs(a.c_acctbal - b.c_acctbal)")} AS DECIMAL(18,2)) AS bal_gap,
       |       a.m * b.m AS n_pairs
       |FROM kept a JOIN kept b ON a.blk = b.blk AND a.rep < b.rep
       |WHERE levenshtein(a.c_name, b.c_name) <= $MaxEditDist
       |  AND a.c_mktsegment = b.c_mktsegment
       |UNION ALL
       |SELECT rep AS custkey_a, rep AS custkey_b, c_mktsegment AS segment,
       |       CAST(0 AS BIGINT) AS name_dist,
       |       CAST(0.0 AS DECIMAL(18,2)) AS bal_gap,
       |       (m * (m - 1)) // 2 AS n_pairs
       |FROM kept WHERE m >= 2
       |ORDER BY custkey_a, custkey_b""".stripMargin

  /** Batch split for [[entityMatchIncremental]] — deterministic ~6 % of
    * the records (the same residue convention as the text/vector
    * incremental twins). */
  private[graft] val IncrMod = 17
  private[graft] val IncrResidue = 3

  /** Incremental record linkage — the nightly-ingest shape completing the
    * incremental family (text `dedup_incremental`, vector
    * `knn_incremental`, records here): a deterministic ~6 % "new batch"
    * of customer records probed against the STATIC rep/block structure of
    * the rest of the corpus. Both sides quotient to (name, segment,
    * balance) reps with multiplicities; the block cap applies to CORPUS
    * reps only (production caps the index — a probe is never dropped for
    * the index's skew), and every batch rep probes its prefix block for
    * cross matches under the same decision rule as [[entityMatch]].
    *
    * Scale shape: the corpus side is index-build work (one agg + one
    * block-keyed window, both linear); each batch rep touches exactly its
    * own block — probe work ∝ batch size × capped block width, never
    * corpus-quadratic. Identical BIGINTs/DECIMALs to expanding every
    * record pair by construction (multiplicities are exact).
    *
    * Output: (batch_key, corpus_key, segment, name_dist, bal_gap,
    * n_pairs) — rep ids (min custkey per side), id-ordered.
    */
  def entityMatchIncremental(customer: DataFrame): DataFrame = {
    val isBatch = col("c_custkey") % IncrMod === IncrResidue
    // groups must not mix sides: each (name, seg, bal, side) gets its own
    // rep, so batch multiplicities never leak into the corpus index
    val reps = customer
      .filter(col("c_name").isNotNull && length(col("c_name")) > 1)
      .groupBy(col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        isBatch.as("b"))
      .agg(min(col("c_custkey")).as("rep"), count(lit(1)).as("m"))
      .withColumn("blk",
        col("c_name").substr(lit(1), length(col("c_name")) - 1))
      .localCheckpoint(eager = true) // index + probe sides read it
    val idx = reps.filter(!col("b"))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("bsz") <= BlockCap)
    val probe = reps.filter(col("b"))
    probe.select(col("blk"), col("rep").as("batch_key"),
        col("c_name").as("na"), col("c_mktsegment").as("sa"),
        col("c_acctbal").as("ba"), col("m").as("ma"))
      .join(idx.select(col("blk"), col("rep").as("corpus_key"),
        col("c_name").as("nb"), col("c_mktsegment").as("sb"),
        col("c_acctbal").as("bb"), col("m").as("mb")), Seq("blk"))
      .withColumn("name_dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("name_dist") <= MaxEditDist && col("sa") === col("sb"))
      .select(col("batch_key"), col("corpus_key"), col("sa").as("segment"),
        col("name_dist"),
        C.dec(C.nanNull(abs(col("ba") - col("bb")))).as("bal_gap"),
        (col("ma") * col("mb")).as("n_pairs"))
      .orderBy(col("batch_key"), col("corpus_key"))
  }

  val entityMatchIncrementalSql: String =
    s"""WITH reps AS (
       |  SELECT c_name, c_mktsegment, c_acctbal,
       |         c_custkey % $IncrMod = $IncrResidue AS b,
       |         min(c_custkey) AS rep, count(*) AS m,
       |         substr(c_name, 1, CAST(length(c_name) AS INTEGER) - 1) AS blk
       |  FROM customer
       |  WHERE c_name IS NOT NULL AND length(c_name) > 1
       |  GROUP BY c_name, c_mktsegment, c_acctbal, b
       |), idx AS (
       |  SELECT * FROM (SELECT * FROM reps WHERE NOT b)
       |  QUALIFY count(*) OVER (PARTITION BY blk) <= $BlockCap
       |)
       |SELECT p.rep AS batch_key, i.rep AS corpus_key,
       |       p.c_mktsegment AS segment,
       |       CAST(levenshtein(p.c_name, i.c_name) AS BIGINT) AS name_dist,
       |       CAST(${C.nanNullSql("abs(p.c_acctbal - i.c_acctbal)")} AS DECIMAL(18,2)) AS bal_gap,
       |       p.m * i.m AS n_pairs
       |FROM (SELECT * FROM reps WHERE b) p
       |JOIN idx i ON p.blk = i.blk
       |WHERE levenshtein(p.c_name, i.c_name) <= $MaxEditDist
       |  AND p.c_mktsegment = i.c_mktsegment
       |ORDER BY batch_key, corpus_key""".stripMargin

  // ---- k-anonymity audit ----

  /** k-anonymity group-size class — bucketed so the audit's output is a
    * fixed-size report, not a group list. */
  private def kClass(k: Column): Column =
    when(k >= 25, "k25plus").when(k >= 10, "k10_24")
      .when(k >= 5, "k5_9").when(k >= 2, "k2_4").otherwise("k1")

  /** k-anonymity audit over the customer quasi-identifiers
    * (nation, market segment, account-balance band): for EVERY level of
    * the generalization lattice — (all three), (nation, segment),
    * (nation), () — the distribution of equivalence-class sizes k, as
    * (level, k_class, n_groups, n_rows). A release is k-anonymous at a
    * level iff that level has no rows below the k threshold; `n_rows`
    * in the small classes is exactly the count needing suppression.
    *
    * The whole lattice is ONE pass: `rollup` evaluates all four levels in
    * a single aggregation (Catalyst expands to one Expand + hash-agg —
    * one shuffle of the QI projection, map-side partials), `grouping_id`
    * names the level (bitmask, first column = most significant bit —
    * DuckDB's `GROUPING(a,b,c)` emits the identical mask). The second agg
    * is over group rows (≤ distinct QI combos), negligible.
    *
    * Output: (level, k_class, n_groups, n_rows), level ∈ {0,1,3,7}.
    */
  def kAnonymity(customer: DataFrame): DataFrame = {
    // malformed-measure contract: a non-finite balance has no band — NULL
    // bucket (the raw floor(Inf) would throw in Spark's BIGINT cast and
    // group differently in DuckDB)
    val qi = customer.select(col("c_nationkey"), col("c_mktsegment"),
      floor(C.nanNull(col("c_acctbal")) / 1000.0).cast("long").as("bal_kbucket"))
    val groups = qi
      .rollup(col("c_nationkey"), col("c_mktsegment"), col("bal_kbucket"))
      .agg(grouping_id().cast("long").as("level"), count(lit(1)).as("k"))
    groups.groupBy(col("level"), kClass(col("k")).as("k_class"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .orderBy(col("level"), col("k_class"))
  }

  val kAnonymitySql: String =
    s"""WITH qi AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         CAST(floor(${C.nanNullSql("c_acctbal")} / 1000.0) AS BIGINT) AS bal_kbucket
      |  FROM customer
      |), groups AS (
      |  SELECT CAST(GROUPING(c_nationkey, c_mktsegment, bal_kbucket) AS BIGINT)
      |           AS level,
      |         count(*) AS k
      |  FROM qi GROUP BY ROLLUP (c_nationkey, c_mktsegment, bal_kbucket)
      |)
      |SELECT level,
      |       CASE WHEN k >= 25 THEN 'k25plus' WHEN k >= 10 THEN 'k10_24'
      |            WHEN k >= 5 THEN 'k5_9' WHEN k >= 2 THEN 'k2_4'
      |            ELSE 'k1' END AS k_class,
      |       count(*) AS n_groups, CAST(sum(k) AS BIGINT) AS n_rows
      |FROM groups GROUP BY 1, 2 ORDER BY level, k_class""".stripMargin

  // ---- market-basket co-occurrence ----

  /** Minimum co-occurrence count for a reported pair. */
  private[graft] val MinSupport = 2L

  /** Fixed-point scale (1e-6) for confidence and lift. */
  private[graft] val SupScale = 1000000L

  /** Market-basket co-occurrence over the order file: for every part pair
    * appearing together in ≥ [[MinSupport]] orders, the association-rule
    * statistics — support count, each side's basket count, confidence
    * P(b|a) and lift P(a,b)/(P(a)P(b)) at [[SupScale]] fixed point. The
    * A-Priori L2 stage as one declarative plan; frequent-pair mining is
    * the curation primitive behind co-occurrence features and
    * template/boilerplate detection on structured logs.
    *
    * All arithmetic is integral: counts are exact BIGINTs; `conf_ab_fp =
    * (pair·1e6) div cnt_a`; `lift_fp = (conf_ab_fp·n_baskets) div cnt_b`
    * — the two-step form keeps every intermediate under 2^63 at any
    * corpus size (conf ≤ 1e6, baskets ≤ ~1e12), where the one-shot
    * `pair·n_baskets·1e6` would overflow. Both divisions truncate toward
    * zero in both engines, so the fixed points are bit-identical.
    *
    * Scale shape: the corpus shuffles ONCE — a single order-keyed
    * `collect_set` folds each order to its sorted distinct part array
    * (bounded by basket size, ≤ tens of items), and that basket relation
    * (orders-sized, materialized) feeds everything downstream map-side:
    * pair generation is an array-lambda explode of C(n,2) per basket
    * (never table-quadratic, and never a 60 M-row sort-merge self-join —
    * the ×100 replica priced the self-join form at 56 s vs single-digit
    * for this), item counts explode the same arrays, the basket count is
    * a one-row relation broadcast onto the pairs. Pair and item aggs are
    * linear hash-aggs with map-side partials. No global structure.
    *
    * Output: (part_a, part_b, pair_cnt, cnt_a, cnt_b, conf_ab_fp,
    * lift_fp), pair-ordered.
    */
  def basketPairs(lineitem: DataFrame): DataFrame = {
    // distinct (order, part) — a part twice in one order is one basket
    // item. Materialized once: all four consumers (both self-join sides,
    // item counts, basket count) re-shuffle this SKINNY two-long relation
    // from memory instead of re-deriving the distinct from parquet.
    val items = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
      .localCheckpoint(eager = true) // 4 consumers read it
    val nBaskets = items.agg(count_distinct(col("okey")).as("n_baskets"))
    val itemCnt = items.groupBy(col("pkey")).agg(count(lit(1)).as("cnt"))
    // the within-order self-join as a SHUFFLED HASH join: both sides hint
    // shuffle_hash, because the default sort-merge pays two 60 M-row sorts
    // for a join whose per-key match lists are basket-bounded (the ×100
    // replica priced SMJ at ~33 s vs ~? for the hash form); partition
    // build sides are |items|/shuffle-partitions rows — executor-sized
    val pairs = items.hint("shuffle_hash")
      .select(col("okey"), col("pkey").as("part_a"))
      .join(items.hint("shuffle_hash")
        .select(col("okey"), col("pkey").as("part_b")), Seq("okey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= MinSupport)
    pairs
      .join(itemCnt.select(col("pkey").as("part_a"), col("cnt").as("cnt_a")), Seq("part_a"))
      .join(itemCnt.select(col("pkey").as("part_b"), col("cnt").as("cnt_b")), Seq("part_b"))
      .crossJoin(broadcast(nBaskets))
      .withColumn("conf_ab_fp", expr(s"(pair_cnt * $SupScale) div cnt_a"))
      .withColumn("lift_fp", expr("(conf_ab_fp * n_baskets) div cnt_b"))
      .select(col("part_a"), col("part_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"), col("conf_ab_fp"), col("lift_fp"))
      .orderBy(col("part_a"), col("part_b"))
  }

  val basketPairsSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
       |), n AS (
       |  SELECT count(DISTINCT okey) AS n_baskets FROM items
       |), item_cnt AS (
       |  SELECT pkey, count(*) AS cnt FROM items GROUP BY pkey
       |), pairs AS (
       |  SELECT a.pkey AS part_a, b.pkey AS part_b, count(*) AS pair_cnt
       |  FROM items a JOIN items b
       |    ON a.okey = b.okey AND a.pkey < b.pkey
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $MinSupport
       |)
       |SELECT p.part_a, p.part_b, p.pair_cnt,
       |       ca.cnt AS cnt_a, cb.cnt AS cnt_b,
       |       (p.pair_cnt * $SupScale) // ca.cnt AS conf_ab_fp,
       |       (((p.pair_cnt * $SupScale) // ca.cnt) * n.n_baskets) // cb.cnt
       |         AS lift_fp
       |FROM pairs p
       |JOIN item_cnt ca ON ca.pkey = p.part_a
       |JOIN item_cnt cb ON cb.pkey = p.part_b
       |CROSS JOIN n
       |ORDER BY part_a, part_b""".stripMargin
}
