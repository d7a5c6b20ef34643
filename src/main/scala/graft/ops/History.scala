package graft.ops

import graft.C
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-history operators over the event log: slowly-changing-
  * dimension (SCD type-2) interval construction and rolling time-range
  * feature windows. Both are single-exchange window constructions — the
  * partitioning is the entity key, per-key state is bounded by one
  * entity's history, and there is no self-join — so the shapes hold at
  * any corpus size (the reference has no temporal-history surface; these
  * are training-pipeline additions alongside [[AsOf]]).
  */
object History {

  /** SCD type-2 history build — the change-capture layout a feature
    * store / dimension table derives from an event log: per user, each
    * maximal run of a repeated `event_type` becomes one validity interval
    * `[valid_from, valid_to)`, with `valid_to` open (NULL) on the current
    * state and a per-user `version` sequence.
    *
    * Construction: one window partitioning (`user_id`, ordered by
    * `(epoch, event_id)` — the id tie-break makes same-second events
    * total-order deterministic, so run boundaries are identical in both
    * engines): `lag` marks run starts, a filter keeps them, `lead` closes
    * each interval, `row_number` versions it. Catalyst plans the three
    * window functions over ONE exchange + sort (same partitioning/order),
    * so the whole build is a single shuffle of the event log; per-key
    * memory is one user's history. No joins, no global windows — the
    * shape survives 100 TB of events unchanged.
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    // event-time contract: a timestamp-less row cannot take a position in
    // a validity timeline (and Spark orders NULL e FIRST where DuckDB
    // orders it LAST — keeping it would make `is_current` engine-dependent)
    val base = events.where(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        col("event_type"), C.epochSec(col("ts")).as("e"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("e"), col("event_id"))
    val runs = base
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val wr = Window.partitionBy(col("user_id"))
      .orderBy(col("e"), col("event_id"))
    runs
      .withColumn("valid_to", lead(col("e"), 1).over(wr))
      .withColumn("version", row_number().over(wr).cast("long"))
      .select(col("user_id"), col("event_type").as("state"),
        col("e").as("valid_from"), col("valid_to"), col("version"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val scd2IntervalsSql: String =
    s"""WITH base AS (
       |  SELECT user_id, event_id, event_type, ${C.epochSecSql} AS e FROM events
       |  WHERE ts IS NOT NULL
       |), marked AS (
       |  SELECT user_id, event_id, event_type, e,
       |         lag(event_type) OVER (PARTITION BY user_id
       |                               ORDER BY e, event_id) AS prev_type
       |  FROM base
       |), runs AS (
       |  SELECT user_id, event_id, event_type, e FROM marked
       |  WHERE prev_type IS NULL OR prev_type <> event_type
       |)
       |SELECT user_id, event_type AS state, e AS valid_from,
       |       lead(e) OVER w AS valid_to,
       |       CAST(row_number() OVER w AS BIGINT) AS version,
       |       CAST(CASE WHEN lead(e) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT)
       |         AS is_current
       |FROM runs
       |WINDOW w AS (PARTITION BY user_id ORDER BY e, event_id)
       |ORDER BY user_id, version""".stripMargin

  /** Rolling time-range features — the per-event feature vector a
    * training pipeline derives from an activity log: for every event, the
    * user's event count and spend over the trailing 1-day and 7-day
    * windows (inclusive of the current instant).
    *
    * The frames are true time-RANGE windows over epoch seconds (not row
    * counts), so burst days weigh correctly; equal-timestamp events are
    * RANGE peers and see identical frames in both engines, making the
    * result order-independent and exactly oracle-able. Spend is summed in
    * integer cents (`round(value*100)` — `value` is 2-decimal, so the
    * double is within one ulp of an integer and never at a rounding
    * midpoint) to keep the accumulation associative and bit-identical
    * across engines and partitionings.
    *
    * Scale shape: all three frames share one `(user_id)` partitioning and
    * `(e)` ordering — ONE exchange + sort for the whole query; the range
    * frame is evaluated with a sliding two-pointer over each user's
    * sorted events (work ∝ events, memory ∝ max events per user per
    * window), never a per-row rescan.
    */
  def rollingUserFeatures(events: DataFrame): DataFrame = {
    val base = events.where(col("ts").isNotNull) // event-time contract
      .select(col("user_id"), col("event_id"),
        C.epochSec(col("ts")).as("e"),
        // NaN measure → NULL cents (C.nanNull contract): the bare cast is
        // an ANSI CAST_OVERFLOW job-killer on one corrupt row
        round(C.nanNull(col("value")) * 100).cast("long").as("cents"))
    def rng(secs: Long) = Window.partitionBy(col("user_id"))
      .orderBy(col("e")).rangeBetween(-secs, 0)
    base
      .withColumn("cnt_1d", count(lit(1)).over(rng(86400L)).cast("long"))
      .withColumn("cnt_7d", count(lit(1)).over(rng(7L * 86400)).cast("long"))
      .withColumn("cents_7d", sum(col("cents")).over(rng(7L * 86400)))
      .select(col("event_id"), col("user_id"), col("e"),
        col("cnt_1d"), col("cnt_7d"), col("cents_7d"))
      .orderBy(col("event_id"))
  }

  val rollingUserFeaturesSql: String =
    s"""WITH base AS (
       |  SELECT user_id, event_id, ${C.epochSecSql} AS e,
       |         CAST(round(${C.nanNullSql("value")} * 100) AS BIGINT) AS cents
       |  FROM events WHERE ts IS NOT NULL
       |)
       |SELECT event_id, user_id, e,
       |       CAST(count(*) OVER w1 AS BIGINT) AS cnt_1d,
       |       CAST(count(*) OVER w7 AS BIGINT) AS cnt_7d,
       |       CAST(sum(cents) OVER w7 AS BIGINT) AS cents_7d
       |FROM base
       |WINDOW
       |  w1 AS (PARTITION BY user_id ORDER BY e
       |         RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
       |  w7 AS (PARTITION BY user_id ORDER BY e
       |         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin
}
