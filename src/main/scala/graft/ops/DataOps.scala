package graft.ops

import graft.C
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-scale data-movement and data-management operators: the
  * bloom-prefiltered semi-join (shuffle reduction), the Z-order layout key
  * (multi-dimensional scan locality), and one-pass table profiling — the
  * operational surface around the analytics queries.
  */
object DataOps {

  /** Bloom-bucket count for [[bloomSemiJoin]] — 2^16 single-hash buckets.
    * With |keys| ≪ m the false-positive rate is ≈ |keys|/m; FPs cost one
    * extra row through the exact join, never a wrong result.
    */
  private[graft] val BloomBuckets = 65536L

  /** Purchase-count threshold defining the key set. */
  private[graft] val BuyerMinPurchases = 5L

  /** Per-user activity rollup for heavy buyers (≥ [[BuyerMinPurchases]]
    * purchases), computed as a bloom-prefiltered semi-join: the key set's
    * hash-bucket SET (a 1-hash Bloom filter materialized as a relation)
    * broadcasts onto the event stream and drops non-member rows BEFORE the
    * exact semi-join — the runtime-filter pattern (Spark's own AQE bloom
    * runtime filter, Delta dynamic file pruning) written as an explicit
    * operator. False positives pass the bucket probe and die in the exact
    * join, so the result is hash-identical to the plain semi-join the
    * oracle runs.
    *
    * Shape at 100 TB: the bucket set is at most [[BloomBuckets]] longs —
    * broadcastable by construction regardless of corpus size — so the
    * only full shuffle left is over the PRE-FILTERED event stream
    * (selectivity × corpus), not the corpus itself. Exactly the plan you
    * want when the key side is too big to broadcast raw but its bucket
    * projection is not.
    * Output: (user_id, n_events, total_value).
    */
  def bloomSemiJoin(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("value"))
    // two consumers (bucket build + exact join) — materialize the key set
    val keys = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_purch"))
      .filter(col("n_purch") >= BuyerMinPurchases)
      .select(col("user_id"))
      .localCheckpoint(eager = true)
    val bucketOf = C.md5Long(col("user_id").cast("string")) % BloomBuckets
    val buckets = keys.select(bucketOf.as("bucket")).distinct()
    // the exact stage is an INNER join against the (already one-row-per-user)
    // key set, not a left-semi: Catalyst's PushDownLeftSemiAntiJoin hoists a
    // semi join below the bucket probe (verified in the plan), un-doing the
    // prefilter — inner joins keep syntactic order with CBO off, so the
    // probe stays FIRST and the exact join sees only probe survivors
    ev.withColumn("bucket", bucketOf)
      .join(broadcast(buckets), "bucket") // bloom pass: membership by bucket
      .join(keys, "user_id") // exact: kill false positives
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(C.dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("user_id"))
  }

  def bloomSemiJoinSql: String =
    s"""WITH keys AS (
       |  SELECT user_id FROM events WHERE event_type = 'purchase'
       |  GROUP BY user_id HAVING count(*) >= $BuyerMinPurchases
       |)
       |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(CAST(sum(CAST(${C.nanNullSql("e.value")} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
       |FROM events e SEMI JOIN keys k ON e.user_id = k.user_id
       |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin

  /** Bits per dimension of the Z-order key (4 → a 16×16 grid, 8-bit key). */
  private[graft] val ZBits = 4

  /** Z-order (Morton) layout key over (user bucket × 2-hour-of-day bucket),
    * with the per-cell occupancy report — the multi-dimensional clustering
    * key behind Delta/Iceberg `OPTIMIZE ZORDER BY`: writing a 100 TB fact
    * table range-partitioned by this key gives every query filtering on
    * EITHER dimension (or both) a contiguous scan range, because the
    * interleaved bits keep both dimensions' localities in one sort order.
    * The interleave is pure integer arithmetic (codegen'd, map-only); the
    * report aggregates per cell to show what each z-range would contain.
    * Output: (zorder, user_bucket, hour_bucket, n_events, n_users).
    */
  def zorderLayout(events: DataFrame): DataFrame = {
    val x = (col("user_id") % (1L << ZBits)).as("user_bucket")
    val y = expr("hour(ts) div 2").cast("long").as("hour_bucket")
    val z = (0 until ZBits).map { i =>
      expr(s"(user_bucket div ${1 << i}) % 2") * (1L << (2 * i)) +
        expr(s"(hour_bucket div ${1 << i}) % 2") * (1L << (2 * i + 1))
    }.reduce(_ + _)
    events
      .select(x, y, col("user_id"))
      .withColumn("zorder", z)
      .groupBy(col("zorder"), col("user_bucket"), col("hour_bucket"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("zorder"))
  }

  def zorderLayoutSql: String = {
    val z = (0 until ZBits).map { i =>
      s"(user_bucket // ${1 << i}) % 2 * ${1L << (2 * i)}" +
        s" + (hour_bucket // ${1 << i}) % 2 * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT user_id % ${1L << ZBits} AS user_bucket,
       |         CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 7200 AS hour_bucket,
       |         user_id
       |  FROM events
       |)
       |SELECT CAST($z AS BIGINT) AS zorder, user_bucket, hour_bucket,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM b GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  }

  /** Price tiers for [[rangeJoinTiers]] — (name, lo, hi), [lo, hi). */
  private[graft] val ValueTiers: Seq[(String, Double, Double)] = Seq(
    ("micro", 0.0, 10.0), ("small", 10.0, 100.0),
    ("mid", 100.0, 1000.0), ("large", 1000.0, 1e15))

  /** Range join: purchases banded into value tiers by a non-equi
    * `[lo, hi)` predicate against a tier dimension — the band-join
    * operator (the as-of join's interval sibling). The dimension side is
    * tiny, so the RIGHT plan is a broadcast nested-loop join with the
    * range predicate — each event tests 4 rows in place, no shuffle; a
    * LARGE band dimension would instead equi-join on a coarse bucket key
    * (`floor(log10 v)` here) with the residual range predicate after —
    * same results, shuffle on the bucket key only. Revenue totals run in
    * DECIMAL and cast once, so the per-tier sums hash-check.
    * Output: (tier, lo, n_events, n_users, total_value).
    */
  def rangeJoinTiers(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val tiers = ValueTiers.toDF("tier", "lo", "hi")
    events
      .filter(col("event_type") === "purchase")
      .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("tier"), col("lo"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(C.dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("lo"))
  }

  def rangeJoinTiersSql: String = {
    val tierRows = ValueTiers.map { case (n, lo, hi) =>
      s"('$n', $lo, $hi)"
    }.mkString(", ")
    s"""WITH tiers(tier, lo, hi) AS (VALUES $tierRows)
       |SELECT t.tier, t.lo, CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       |       CAST(CAST(sum(CAST(${C.nanNullSql("e.value")} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
       |FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
       |WHERE e.event_type = 'purchase'
       |GROUP BY t.tier, t.lo ORDER BY t.lo""".stripMargin
  }

  /** One-pass data profile of the `documents` table — per column: row
    * count, null count, distinct count, lexicographic min/max (columns
    * rendered as strings so one schema fits every type). The
    * ingest-validation report a pipeline runs on every new drop before
    * anything downstream trusts it.
    *
    * Single scan: all per-column aggregates compute in ONE aggregation
    * (count/approx-free exact distincts expand to per-column hash aggs
    * under the hood, still one pass over the parquet), then a `stack`
    * unpivots the 5-column row into the per-column relation — versus the
    * naive 5-scan union. Output: (column_name, n_rows, n_null, n_distinct,
    * min_str, max_str).
    */
  def tableProfile(documents: DataFrame): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        count_distinct(col(c)).as(s"${c}_dist"),
        min(col(c).cast("string")).as(s"${c}_min"),
        max(col(c).cast("string")).as(s"${c}_max"))
    } :+ count(lit(1)).as("n_rows")
    val one = documents.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}_nulls, ${c}_dist, ${c}_min, ${c}_max"
    }.mkString(", ")
    one.select(col("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_str, max_str)"))
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
      .orderBy(col("column_name"))
  }

  def tableProfileSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       min(CAST($c AS VARCHAR)) AS min_str,
         |       max(CAST($c AS VARCHAR)) AS max_str
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY column_name"
  }

  // ---- zone-map data-skipping estimator ----

  /** Rows per zone — the modelled file/row-group granularity. */
  private[graft] val ZoneRows = 128L

  /** The three audit predicates (shared literals, both engines): a
    * timestamp day slice, a value floor, an event-type equality. */
  private[graft] val ZoneDayLo = 1704844800L // 2024-01-10 00:00:00 UTC
  private[graft] val ZoneDayHi = 1704931200L // exclusive
  private[graft] val ZoneValFloor = 200.0
  private[graft] val ZoneType = "purchase"

  /** Zone-map pruning audit — the data-skipping arithmetic behind every
    * lakehouse scan at 100 TB (parquet row-group stats, Delta/Iceberg
    * file min-max, zone maps): events are modelled as [[ZoneRows]]-row
    * zones (`event_id div N` — the write-order file layout), each zone
    * keeps min/max of the timestamp, the (finite-or-null contracted)
    * value, and the event type, and for three representative predicates
    * the report gives zones/rows that a stats-driven planner would scan
    * vs the rows that actually match — skip ratio and false-positive
    * volume per predicate. Read next to `zorder_layout`: THIS is the
    * measurement that justifies re-clustering.
    *
    * Contract notes: a NaN/Inf value neither enters a zone's min/max nor
    * matches the value predicate (malformed measures never satisfy a
    * range — mirrored by the oracle's `isfinite` CASE); a NULL
    * timestamp/type can never match its predicate, so a zone whose
    * bounds are all-NULL is safely skippable (NULL-comparison zones
    * aggregate as non-matching in both engines).
    *
    * Scale shape: ONE corpus shuffle (the zone aggregation, map-side
    * partials) carrying per-zone predicate match counts computed in the
    * same pass; the audit itself is a one-row aggregate over the
    * zones-sized relation, unpivoted to three rows with `stack`. No
    * joins, no second corpus pass.
    *
    * Output: (pred, zones_total, zones_scanned, rows_total, rows_scanned,
    * rows_matched, prune_ppm, fp_rows), pred-ordered.
    */
  def zoneMapPrune(events: DataFrame): DataFrame = {
    val base = events.select(
      expr(s"event_id div $ZoneRows").as("zone"),
      C.epochSec(col("ts")).as("e"),
      C.nanNull(col("value")).as("v"),
      col("event_type").as("t"))
    val p1 = col("e") >= ZoneDayLo && col("e") < ZoneDayHi
    val p2 = col("v") >= ZoneValFloor
    val p3 = col("t") === ZoneType
    val zones = base.groupBy(col("zone")).agg(
      count(lit(1)).as("cnt"),
      min(col("e")).as("e_lo"), max(col("e")).as("e_hi"),
      min(col("v")).as("v_lo"), max(col("v")).as("v_hi"),
      min(col("t")).as("t_lo"), max(col("t")).as("t_hi"),
      sum(when(p1, 1L).otherwise(0L)).as("m1"),
      sum(when(p2, 1L).otherwise(0L)).as("m2"),
      sum(when(p3, 1L).otherwise(0L)).as("m3"))
    // zone-level maybe: the planner scans a zone iff its stats range
    // overlaps the predicate (three-valued NULL collapses to "skip" via
    // the ELSE 0 — an all-NULL-bounds zone cannot contain a match)
    val maybe1 = col("e_hi") >= ZoneDayLo && col("e_lo") < ZoneDayHi
    val maybe2 = col("v_hi") >= ZoneValFloor
    val maybe3 = col("t_lo") <= ZoneType && col("t_hi") >= ZoneType
    def scanCols(i: Int, maybe: Column) = Seq(
      sum(when(maybe, 1L).otherwise(0L)).as(s"z$i"),
      sum(when(maybe, col("cnt")).otherwise(0L)).as(s"s$i"),
      sum(col(s"m$i")).as(s"t$i"))
    val aggs = Seq(count(lit(1)).as("zones_total"), sum(col("cnt")).as("rows_total")) ++
      scanCols(1, maybe1) ++ scanCols(2, maybe2) ++ scanCols(3, maybe3)
    val one = zones.agg(aggs.head, aggs.tail: _*)
    val stackArgs = Seq(("ts_day", 1), ("value_floor", 2), ("type_eq", 3))
      .map { case (n, i) => s"'$n', z$i, s$i, t$i" }.mkString(", ")
    one.select(col("zones_total"), col("rows_total"), expr(
        s"stack(3, $stackArgs) AS (pred, zones_scanned, rows_scanned, rows_matched)"))
      .select(col("pred"), col("zones_total"), col("zones_scanned"),
        col("rows_total"), col("rows_scanned"), col("rows_matched"),
        expr("((rows_total - rows_scanned) * 1000000) div rows_total").as("prune_ppm"),
        (col("rows_scanned") - col("rows_matched")).as("fp_rows"))
      .orderBy(col("pred"))
  }

  val zoneMapPruneSql: String = {
    val p = Seq(
      ("ts_day", s"e >= $ZoneDayLo AND e < $ZoneDayHi",
        s"e_hi >= $ZoneDayLo AND e_lo < $ZoneDayHi"),
      ("value_floor", s"v >= $ZoneValFloor", s"v_hi >= $ZoneValFloor"),
      ("type_eq", s"t = '$ZoneType'", s"t_lo <= '$ZoneType' AND t_hi >= '$ZoneType'"))
    val mCols = p.zipWithIndex.map { case ((_, rowP, _), i) =>
      s"sum(CASE WHEN $rowP THEN 1 ELSE 0 END) AS m${i + 1}"
    }.mkString(",\n|         ")
    // every sum CAST back to BIGINT — DuckDB widens BIGINT sums to
    // HUGEINT, which pandas renders as float64 and the dtype gate flags
    val sCols = p.zipWithIndex.map { case ((_, _, zoneP), i) =>
      s"""CAST(sum(CASE WHEN $zoneP THEN 1 ELSE 0 END) AS BIGINT) AS z${i + 1},
         |         CAST(sum(CASE WHEN $zoneP THEN cnt ELSE 0 END) AS BIGINT) AS s${i + 1},
         |         CAST(sum(m${i + 1}) AS BIGINT) AS t${i + 1}""".stripMargin
    }.mkString(",\n         ")
    val rows = p.zipWithIndex.map { case ((name, _, _), i) =>
      s"""SELECT '$name' AS pred, zones_total, z${i + 1} AS zones_scanned,
         |       rows_total, s${i + 1} AS rows_scanned, t${i + 1} AS rows_matched,
         |       ((rows_total - s${i + 1}) * 1000000) // rows_total AS prune_ppm,
         |       s${i + 1} - t${i + 1} AS fp_rows
         |FROM one""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT event_id // $ZoneRows AS zone, ${C.epochSecSql} AS e,
       |         ${C.nanNullSql("value")} AS v, event_type AS t
       |  FROM events
       |), zones AS (
       |  SELECT zone, CAST(count(*) AS BIGINT) AS cnt,
       |         min(e) AS e_lo, max(e) AS e_hi,
       |         min(v) AS v_lo, max(v) AS v_hi,
       |         min(t) AS t_lo, max(t) AS t_hi,
       |         $mCols
       |  FROM base GROUP BY zone
       |), one AS (
       |  SELECT CAST(count(*) AS BIGINT) AS zones_total,
       |         CAST(sum(cnt) AS BIGINT) AS rows_total,
       |         $sCols
       |  FROM zones
       |)
       |$rows
       |ORDER BY pred""".stripMargin
  }
}
