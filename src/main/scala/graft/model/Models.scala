package graft.model

/** Typed views of the event stream used by the stateful streaming machines
  * (SURVEY.md §1.1 — the reference's per-job case classes, mapped onto the
  * testdata `events` schema per FIXTURES.md §B).
  */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String)

/** Warning emitted for two consecutive login failures within the gap
  * (H/LoginFailDetect/LoginFailTwo.scala:74-79).
  */
case class LoginWarning(user_id: Long, first_fail: Long, second_fail: Long)

/** State for the consecutive-failure machine: the last event seen per user.
  * The reference keeps the last failure in ListState/ValueState
  * (LoginFailTwo.scala:63); a success clears it.
  */
case class LoginState(lastFailTs: Option[Long])

/** Warning for >=2 failures within the span of a failure run
  * (H/LoginFailDetect/LoginFailOne.scala:96-101).
  */
case class BurstWarning(user_id: Long, first_fail: Long, last_fail: Long, n_fails: Long)

/** State for the burst machine: the current failure run (first fail + all
  * fail timestamps), and whether this run already emitted/expired —
  * the reference's ListState plus the timer flag it encodes implicitly
  * (LoginFailOne.scala:65,72-74).
  */
case class BurstState(firstFail: Option[Long], fails: List[Long], exhausted: Boolean)

/** Order lifecycle result (H/OrderTimeoutDetect/OrderTimeout.scala:24). */
case class OrderResult(
    order_id: Long,
    user_id: Long,
    create_ts: Long,
    pay_ts: Option[Long],
    result_msg: String)

/** State for the create→pay machine: open (unpaid) creates per user, as
  * (order_id, create_ts) pairs in event-time order.
  */
case class OrderState(open: List[(Long, Long)])

/** Blacklist machine output row (pass-through click or one-time warning —
  * H/MarketAnalysis/AdAnalysisByProvinceBlack.scala:86-100).
  */
case class BlacklistRow(side: String, user_id: Long, ad_id: Long, day: Long, click_ts: Long)

/** Blacklist state: current event-time day, clicks so far, warned flag. */
case class BlacklistState(day: Long, count: Long, warned: Boolean)

/** Last-touch attribution row — the streaming image of the batch as-of join
  * ([[graft.ops.AsOf.purchaseAttribution]]): a purchase with the user's most
  * recent click at or before it (None when no click preceded).
  */
case class AttributionRow(
    purchase_id: Long,
    user_id: Long,
    purchase_ts: Long,
    click_id: Option[Long],
    click_ts: Option[Long])

/** State for the last-touch machine: the user's latest click — O(1) per key,
  * the as-of join's carry-forward column as explicit state.
  */
case class AsOfState(lastClickId: Option[Long], lastClickTs: Option[Long])

/** Generic CEP machine output: one match with each step's event time (epoch
  * seconds) in pattern order — the typed twin of [[graft.ops.Cep]]'s
  * per-step columns.
  */
case class CepMatch(user_id: Long, step_ts: Seq[Long])

/** State for the strict-contiguity CEP machine: the last pattern-length−1
  * events per key — O(pattern) state, never a match buffer.
  */
case class CepNextState(recent: List[Event])

/** State for the relaxed-contiguity (followedBy) CEP machine: the latest
  * a-event time per key — O(1), the design choice documented on
  * [[graft.ops.Cep.followedBy]].
  */
case class CepFollowState(lastA: Option[Long])

/** Funnel progression row: emitted the moment a user completes a step —
  * the streaming image of [[graft.ops.EventWindows.eventFunnel]]'s
  * per-step cohorts (`step` 1=view, 2=click, 3=purchase).
  */
case class FunnelAdvance(user_id: Long, step: Long, at_ts: Long)

/** State for the funnel machine: the first qualifying time of each step —
  * O(1) per user, monotone (steps only ever fill in, never reopen).
  */
case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])

/** Streaming retention: one row per newly-credited (user, active week) —
  * the per-user stream the cohort triangle aggregates.
  */
case class CohortHit(user_id: Long, cohort_week: Long, week_offset: Long)

/** Retention machine state: the user's cohort week plus weeks already
  * credited — CALENDAR-bounded (52 entries/year), not event-bounded.
  */
case class RetentionState(cohort: Long, seen: List[Long])

/** Streaming path transition: one row per consecutive event-type pair in a
  * user's journey.
  */
case class Transition(user_id: Long, prev_type: String, next_type: String)

/** Transition machine state: the user's last event — O(1) per user. */
case class PathState(lastTs: Long, lastId: Long, lastType: String)

/** Streaming CEP followedBy-each match: a pending signup completed by the
  * first subsequent purchase inside the window (epoch seconds).
  */
case class CepPair(user_id: Long, signup_e: Long, purchase_e: Long)

/** Streaming CEP absence alert: a signup whose first subsequent purchase
  * was absent or past the deadline (epoch seconds).
  */
case class CepTimeout(user_id: Long, signup_e: Long, deadline: Long)

/** CEP signup machine state: signup times still awaiting their first
  * subsequent purchase — drains to empty at EVERY purchase (each pending
  * signup either matches it or is decided late), so it is bounded by one
  * purchase-free stretch, never the stream.
  */
case class PendingSignups(pending: List[Long])

/** Streaming SCD2: one CLOSED validity interval, emitted the moment the
  * user's state changes — the streaming image of
  * [[graft.ops.History.scd2Intervals]] restricted to `is_current = 0`
  * (an append stream cannot retract, so the open interval lives in state
  * until its closing change arrives).
  */
case class Scd2Closed(
    user_id: Long, state: String, valid_from: Long, valid_to: Long, version: Long)

/** SCD2 machine state: the user's open run — type, start, and the next
  * version number. O(1) per user.
  */
case class Scd2State(runType: String, runStart: Long, version: Long)

/** Streaming rolling features: the per-event trailing-window feature row —
  * identical schema to [[graft.ops.History.rollingUserFeatures]].
  */
case class RollingRow(
    event_id: Long, user_id: Long, e: Long,
    cnt_1d: Long, cnt_7d: Long, cents_7d: Long)

/** Rolling-features machine state: the user's events inside the trailing
  * 7-day horizon of the LAST event seen, as (sec, cents) pairs — bounded
  * by one user's 7-day activity, the same bound the batch RANGE frame's
  * per-partition two-pointer holds.
  */
case class RollingState(entries: List[(Long, Long)])

/** Typed event view carrying the spend in integer cents (rounded once at
  * the source select, so the machine is integer-only like the batch twin).
  */
case class Spend(event_id: Long, ts: java.sql.Timestamp, user_id: Long, cents: Long)
