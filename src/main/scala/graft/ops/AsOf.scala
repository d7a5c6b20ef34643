package graft.ops

import graft.C
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row at or
  * before it per key. Spark has no native ASOF operator; the naive form
  * (range self-join + per-left-row max) re-shuffles the pair blowup. This
  * is the composed single-shuffle form (build-brief preference (a)): tag
  * both sides, union, one per-key ordered window with
  * `last(_, ignoreNulls)` carrying the right side's attributes forward,
  * then keep the left rows. One exchange on the key, zero self-joins,
  * work ∝ rows log(rows-per-key) — the shape survives any corpus size.
  *
  * Tie rule: a right row at exactly the left row's timestamp matches
  * (right sorts before left at equal ts); among equal-ts right rows the
  * greatest id wins. Both rules are explicit in the sort, so the result
  * is total-order deterministic and the oracle mirrors it exactly.
  */
object AsOf {

  /** Generic as-of: left (key, ts, id) rows pick up `latest_id` /
    * `latest_ts` from the right (key, ts, id) rows with right.ts <=
    * left.ts. Columns are passed by name; output keeps the left columns.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, id: String): DataFrame = {
    val l = left.select(col(key), col(ts), col(id), lit(1).as("is_left"),
      lit(null).cast("long").as("r_id"), lit(null).cast("long").as("r_ts"))
    val r = right.select(col(key), col(ts), col(id), lit(0).as("is_left"),
      col(id).as("r_id"), col(ts).as("r_ts"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("is_left"), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("asof_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col(key), col(ts), col(id), col("asof_id"), col("asof_ts"))
  }

  /** Last-touch attribution over the events table: every purchase joined
    * as-of to the user's most recent click at or before it.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    // event-time contract: an as-of match needs an orderable instant on
    // both sides (a NULL-ts click sorts FIRST in Spark and LAST in DuckDB
    // — it would win or lose the "latest preceding" race by engine)
    val base = events.where(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        col("event_type"), C.epochSec(col("ts")).as("e"))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("e"), col("event_id"))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("e"), col("event_id"))
    asOfJoin(purchases, clicks, "user_id", "e", "event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("e").as("purchase_ts"),
        col("asof_id").as("click_id"), col("asof_ts").as("click_ts"))
      .orderBy(col("purchase_id"))
  }

  val purchaseAttributionSql: String =
    s"""WITH base AS (
       |  SELECT user_id, event_id, event_type, ${C.epochSecSql} AS e FROM events
       |  WHERE ts IS NOT NULL
       |), tagged AS (
       |  SELECT user_id, e, event_id, 1 AS is_left,
       |         CAST(NULL AS BIGINT) AS r_id, CAST(NULL AS BIGINT) AS r_ts
       |  FROM base WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT user_id, e, event_id, 0 AS is_left, event_id, e
       |  FROM base WHERE event_type = 'click'
       |), carried AS (
       |  SELECT user_id, e, event_id, is_left,
       |         last_value(r_id IGNORE NULLS) OVER w AS asof_id,
       |         last_value(r_ts IGNORE NULLS) OVER w AS asof_ts
       |  FROM tagged
       |  WINDOW w AS (PARTITION BY user_id ORDER BY e, is_left, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_id AS purchase_id, user_id, e AS purchase_ts,
       |       asof_id AS click_id, asof_ts AS click_ts
       |FROM carried WHERE is_left = 1
       |ORDER BY purchase_id""".stripMargin
}
