package graft.ops

import graft.C
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized CEP-style pattern matching over per-key event sequences —
  * the generalization of the reference's two fixed CEP usages
  * (`H/LoginFailDetect/LoginFailWithCep.scala:56-60` — `fail next fail
  * within(t)` — and `H/OrderTimeoutDetect/OrderTimeoutWithCep.scala:45-48`
  * — `create followedBy pay within(t)`): an arbitrary sequence of predicate
  * steps with strict (`next`) or relaxed (`followedBy`) contiguity and a
  * within-window, instead of one bespoke operator per pattern.
  *
  * Scale shape: one shuffle on the key + one ordered window pass per key —
  * the same plan the fixed detections compile to. Per-row lookback state is
  * bounded: the previous N−1 events (strict) or one running aggregate
  * (relaxed) — never an unbounded match buffer.
  */
object Cep {

  /** One pattern step. `pred` sees an event struct with fields
    * (event_id, event_type, e — epoch seconds); the step's matched event
    * time is emitted as an output column named `name`.
    */
  final case class Step(name: String, pred: Column => Column)

  /** Step matching a fixed `event_type`. */
  def typeIs(name: String, t: String): Step =
    Step(name, ev => ev.getField("event_type") === t)

  private def evStruct: Column =
    struct(col("event_id"), col("event_type"), C.epochSec(col("ts")).as("e"))

  /** Strict contiguity — `s1 next s2 next … within withinSec`, keyed by
    * `user_id`: `steps.length` *consecutive* events of one user satisfy the
    * step predicates in order, with first→last gap ≤ `withinSec`. Emits
    * one row per match: (user_id, <step name> = matched epoch sec …),
    * ordered by (user_id, last step).
    *
    * `login_fail_cep` is this operator instantiated with
    * (error, error) within 3600 — hash-checked against the lag-based
    * oracle, proving strict contiguity ≡ consecutive-pair semantics.
    */
  def nextPattern(events: DataFrame, steps: Seq[Step], withinSec: Long): DataFrame = {
    require(steps.length >= 2, "a pattern needs at least 2 steps")
    val n = steps.length
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val base = events.select(col("user_id"), col("ts"), col("event_id"), evStruct.as("ev"))
    // ev_i := the event (n-1-i) rows back, so ev_{n-1} is the current row
    // and ev_0 the pattern start — one lag column per step, O(n) state
    val lagged = (0 until n - 1).foldLeft(base) { (d, i) =>
      d.withColumn(s"ev$i", lag(col("ev"), n - 1 - i).over(w))
    }.withColumn(s"ev${n - 1}", col("ev"))
    val conds = steps.zipWithIndex.map { case (s, i) => s.pred(col(s"ev$i")) }
    val within =
      col(s"ev${n - 1}").getField("e") - col("ev0").getField("e") <= withinSec
    lagged
      .filter(conds.reduce(_ && _) && within)
      .select(col("user_id") +: steps.zipWithIndex.map { case (s, i) =>
        col(s"ev$i").getField("e").as(s.name) }: _*)
      .orderBy(col("user_id"), col(steps.last.name))
  }

  /** Relaxed contiguity — `a followedBy b within withinSec`, keyed by
    * `user_id`: for every event matching `b`, the latest strictly-preceding
    * event matching `a` with gap ≤ `withinSec` (events between them are
    * skipped). INTENTIONAL divergence from Flink CEP's followedBy, which
    * keeps a partial match per pending a-event (so k preceding a's × one b
    * = k matches); here each b matches at most once. The reference's only
    * followedBy use (`OrderTimeoutWithCep.scala:45-48`) keys by order id,
    * where at most one `create` precedes a `pay` — the two semantics
    * coincide there. Latest-a keeps per-key state O(1) instead of O(#a).
    * Implemented as a running `max(matching e)` over the
    * preceding frame — event time is non-decreasing along the frame, so
    * max ≡ latest, and the same one-line form runs in any SQL engine (no
    * IGNORE NULLS needed). Emits (user_id, <a.name>, <b.name>).
    */
  def followedBy(events: DataFrame, a: Step, b: Step, withinSec: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(col("user_id"), col("ts"), col("event_id"), evStruct.as("ev"))
    base
      .withColumn("a_e",
        max(when(a.pred(col("ev")), col("ev").getField("e"))).over(w))
      .filter(b.pred(col("ev")) && col("a_e").isNotNull
        && col("ev").getField("e") - col("a_e") <= withinSec)
      .select(col("user_id"), col("a_e").as(a.name),
        col("ev").getField("e").as(b.name))
      .orderBy(col("user_id"), col(b.name), col(a.name))
  }

  /** The reference's order-flow CEP pattern (`OrderTimeoutWithCep.scala:
    * 45-48`) as a [[followedBy]] instantiation: signup (order create)
    * followed by that user's purchase (pay) within `withinSec`. The
    * timeout side-output half of that job lives in
    * [[OrderFlow.orderTimeout]] (state machine, 3 outcomes).
    */
  def signupThenPurchase(events: DataFrame, withinSec: Long = 7200): DataFrame =
    followedBy(events,
      typeIs("signup_e", "signup"), typeIs("purchase_e", "purchase"), withinSec)

  val signupThenPurchaseSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type, ${C.epochSecSql} AS e,
       |         max(CASE WHEN event_type = 'signup' THEN ${C.epochSecSql} END)
       |           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a_e
       |  FROM events
       |)
       |SELECT user_id, a_e AS signup_e, e AS purchase_e
       |FROM seq
       |WHERE event_type = 'purchase' AND a_e IS NOT NULL AND e - a_e <= 7200
       |ORDER BY user_id, purchase_e, signup_e""".stripMargin

  /** Flink CEP's TRUE multi-partial-match `followedBy` semantics
    * (`OrderTimeoutWithOutCep.scala:45-48`): every event matching `a`
    * starts its own partial match, and — under the default
    * skip-till-next-match contiguity — completes at the FIRST subsequent
    * event matching `b` within `withinSec`. So k pending a-events before
    * one b produce k matches (all sharing that b), where [[followedBy]]
    * would emit only the latest a. This closes the one place the generic
    * operator was narrower than Flink CEP.
    *
    * Shape: one shuffle on the key + ONE ordered window pass. "First b
    * after each a" is a running min of b-times scanned from the END of
    * the partition, so the frame is ordered DESCENDING with an
    * unbounded-PRECEDING frame — Spark evaluates that incrementally in
    * O(rows), whereas the equivalent ascending unbounded-FOLLOWING frame
    * re-scans the tail per row (O(rows²) on a hot key). Per-key state is
    * one running aggregate, never a pending-match buffer, so a key with
    * a million pending a's costs O(1) memory. Emits one row per matched
    * a-event: (user_id, <a.name>, <b.name>).
    */
  def followedByEach(events: DataFrame, a: Step, b: Step, withinSec: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(col("user_id"), col("ts"), col("event_id"), evStruct.as("ev"))
    base
      // min over the rows AFTER this one (descending order ⇒ the preceding
      // frame holds the later events) = earliest subsequent b-time
      .withColumn("b_e",
        min(when(b.pred(col("ev")), col("ev").getField("e"))).over(w))
      .filter(a.pred(col("ev")) && col("b_e").isNotNull
        && col("b_e") - col("ev").getField("e") <= withinSec)
      .select(col("user_id"), col("ev").getField("e").as(a.name),
        col("b_e").as(b.name))
      .orderBy(col("user_id"), col(a.name), col(b.name))
  }

  /** [[signupThenPurchase]] under [[followedByEach]] — the Flink-CEP-exact
    * variant where several signups pending before one purchase each match.
    */
  def signupThenPurchaseEach(events: DataFrame, withinSec: Long = 7200): DataFrame =
    followedByEach(events,
      typeIs("signup_e", "signup"), typeIs("purchase_e", "purchase"), withinSec)

  /** Absence pattern — `a notFollowedBy b within withinSec`, keyed by
    * `user_id`: every a-event with NO subsequent b-event inside the window
    * (Flink expresses this as the `within` timeout side-output of the
    * matched pattern — `OrderTimeoutWithOutCep.scala:53-58`'s
    * `orderTimeOutputTag`; [[OrderFlow.orderTimeout]] is the bespoke
    * state-machine form of the same detection). The complement of
    * [[followedByEach]] over the same running-min scan, so both sides of
    * the reference's select/side-output split come from ONE window pass
    * shape. Emits (user_id, <a.name>, deadline = a + within).
    */
  def notFollowedBy(events: DataFrame, a: Step, b: Step, withinSec: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events.select(col("user_id"), col("ts"), col("event_id"), evStruct.as("ev"))
    base
      .withColumn("b_e",
        min(when(b.pred(col("ev")), col("ev").getField("e"))).over(w))
      .filter(a.pred(col("ev")) &&
        (col("b_e").isNull || col("b_e") - col("ev").getField("e") > withinSec))
      .select(col("user_id"), col("ev").getField("e").as(a.name),
        (col("ev").getField("e") + withinSec).as("deadline"))
      .orderBy(col("user_id"), col(a.name))
  }

  /** Signups never followed by a purchase within the window — the
    * abandoned-funnel twin of [[signupThenPurchaseEach]]; together they
    * partition the signup events exactly like Flink CEP's
    * select(timeoutTag, timeoutFn, matchFn) two-sided output.
    */
  def abandonedSignup(events: DataFrame, withinSec: Long = 7200): DataFrame =
    notFollowedBy(events,
      typeIs("signup_e", "signup"), typeIs("purchase_e", "purchase"), withinSec)

  val abandonedSignupSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type, ${C.epochSecSql} AS e,
       |         min(CASE WHEN event_type = 'purchase' THEN ${C.epochSecSql} END)
       |           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b_e
       |  FROM events
       |)
       |SELECT user_id, e AS signup_e, e + 7200 AS deadline
       |FROM seq
       |WHERE event_type = 'signup' AND (b_e IS NULL OR b_e - e > 7200)
       |ORDER BY user_id, signup_e""".stripMargin

  val signupThenPurchaseEachSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type, ${C.epochSecSql} AS e,
       |         min(CASE WHEN event_type = 'purchase' THEN ${C.epochSecSql} END)
       |           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b_e
       |  FROM events
       |)
       |SELECT user_id, e AS signup_e, b_e AS purchase_e
       |FROM seq
       |WHERE event_type = 'signup' AND b_e IS NOT NULL AND b_e - e <= 7200
       |ORDER BY user_id, signup_e, purchase_e""".stripMargin
}
