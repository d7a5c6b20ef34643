package graft

import graft.model._
import graft.state.Machines
import graft.streaming.StreamJobs
import java.sql.Timestamp

/** Edge-case tests for the stateful machines, encoding the reference's
  * corner cases (SURVEY.md §5.2). flatMapGroupsWithState runs in batch mode
  * here — same function, transient state.
  */
class MachinesSpec extends SparkSuite {

  private def ev(id: Long, sec: Long, user: Long, typ: String): Event =
    Event(id, new Timestamp(sec * 1000), user, typ)

  private def loginWarnings(events: Seq[Event], gap: Long = 10): Seq[LoginWarning] = {
    import spark.implicits._
    StreamJobs.loginFailStream(spark.createDataset(events), gap)
      .collect().toSeq.sortBy(w => (w.user_id, w.second_fail))
  }

  test("login-fail: two consecutive failures within gap warn") {
    val out = loginWarnings(Seq(ev(1, 100, 7, "error"), ev(2, 105, 7, "error")))
    assert(out == Seq(LoginWarning(7, 100, 105)))
  }

  test("login-fail: success between failures resets state (LoginFailTwo.scala:86-89)") {
    val out = loginWarnings(Seq(
      ev(1, 100, 7, "error"), ev(2, 102, 7, "click"), ev(3, 104, 7, "error")))
    assert(out.isEmpty)
  }

  test("login-fail: gap boundary is inclusive") {
    assert(loginWarnings(Seq(ev(1, 100, 7, "error"), ev(2, 110, 7, "error"))).nonEmpty)
    assert(loginWarnings(Seq(ev(1, 100, 7, "error"), ev(2, 111, 7, "error"))).isEmpty)
  }

  test("login-fail: three failures emit two pairwise warnings") {
    val out = loginWarnings(Seq(
      ev(1, 100, 7, "error"), ev(2, 103, 7, "error"), ev(3, 106, 7, "error")))
    assert(out == Seq(LoginWarning(7, 100, 103), LoginWarning(7, 103, 106)))
  }

  private def orderResults(events: Seq[Event], timeout: Long = 100): Seq[OrderResult] = {
    import spark.implicits._
    val live = StreamJobs.orderTimeoutStream(spark.createDataset(events), timeout).collect().toSeq
    // end-of-stream flush of still-open orders, mirroring what a finite
    // replay produces: recompute final state per user
    val byUser = events.groupBy(_.user_id)
    val flushed = byUser.toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val open = sorted.foldLeft(List.empty[(Long, Long)]) { (acc, e) =>
        e.event_type match {
          case "signup" => acc :+ (e.event_id -> e.ts.getTime / 1000)
          case "purchase" => Nil
          case _ => acc
        }
      }
      Machines.orderFlush(uid, OrderState(open))
    }
    (live ++ flushed).sortBy(_.order_id)
  }

  test("order-timeout: pay within timeout succeeds; boundary inclusive (OrderTimeout.scala:104)") {
    val out = orderResults(Seq(ev(1, 100, 7, "signup"), ev(2, 200, 7, "purchase")))
    assert(out == Seq(OrderResult(1, 7, 100, Some(200), "payed successfully")))
  }

  test("order-timeout: pay after timeout flags 'payed but already timeout'") {
    val out = orderResults(Seq(ev(1, 100, 7, "signup"), ev(2, 201, 7, "purchase")))
    assert(out == Seq(OrderResult(1, 7, 100, Some(201), "payed but already timeout")))
  }

  test("order-timeout: never-paid order times out") {
    val out = orderResults(Seq(ev(1, 100, 7, "signup")))
    assert(out == Seq(OrderResult(1, 7, 100, None, "order timeout")))
  }

  test("order-timeout: pay before any create emits nothing (OrderTimeout.scala:116-123 analog)") {
    assert(orderResults(Seq(ev(1, 100, 7, "purchase"))).isEmpty)
  }

  private def blacklist(rows: Seq[(Event, Long)], threshold: Long = 2): Seq[BlacklistRow] = {
    import spark.implicits._
    StreamJobs.blacklistStream(spark.createDataset(rows), threshold)
      .collect().toSeq.sortBy(r => (r.user_id, r.ad_id, r.click_ts, r.side))
  }

  test("blacklist: threshold strict — N pass, N+1 warns once, rest dropped (AdAnalysisByProvinceBlack.scala:86)") {
    val rows = (1 to 5).map(i => (ev(i, 100 + i, 7, "click"), 1L))
    val out = blacklist(rows)
    assert(out.count(_.side == "pass") == 2)
    assert(out.count(_.side == "warn") == 1)
    assert(out.find(_.side == "warn").get.click_ts == 103)
  }

  test("blacklist: event-time day advance resets the counter") {
    val day2 = 86400L
    val rows = Seq(
      (ev(1, 10, 7, "click"), 1L), (ev(2, 20, 7, "click"), 1L), (ev(3, 30, 7, "click"), 1L),
      (ev(4, day2 + 10, 7, "click"), 1L))
    val out = blacklist(rows)
    assert(out.filter(_.day == 0).map(_.side) == Seq("pass", "pass", "warn"))
    assert(out.filter(_.day == day2).map(_.side) == Seq("pass"))
  }

  private def cepMulti(events: Seq[Event], within: Long = 100): Seq[CepPair] = {
    import spark.implicits._
    StreamJobs.signupPurchaseEachStream(spark.createDataset(events), within)
      .collect().toSeq.sortBy(p => (p.user_id, p.signup_e, p.purchase_e))
  }

  private def cepAbandoned(events: Seq[Event], within: Long = 100): Seq[CepTimeout] = {
    import spark.implicits._
    StreamJobs.abandonedSignupStream(spark.createDataset(events), within)
      .collect().toSeq.sortBy(t => (t.user_id, t.signup_e))
  }

  test("cep multi-match: k pending signups all match the first purchase; boundary inclusive") {
    val out = cepMulti(Seq(
      ev(1, 100, 7, "signup"), ev(2, 150, 7, "signup"), ev(3, 200, 7, "purchase")))
    assert(out == Seq(CepPair(7, 100, 200), CepPair(7, 150, 200)))
    assert(cepMulti(Seq(ev(1, 100, 7, "signup"), ev(2, 201, 7, "purchase"))).isEmpty)
  }

  test("cep multi-match: the first purchase decides — a late signup can't match a later one") {
    // signup at 100 misses purchase at 250 (gap 150 > 100); it must NOT
    // match the in-window purchase at 300 (first-b semantics)
    val out = cepMulti(Seq(
      ev(1, 100, 7, "signup"), ev(2, 250, 7, "purchase"), ev(3, 300, 7, "purchase")))
    assert(out.isEmpty)
  }

  test("cep absence: proved-late alert fires at the purchase; unanswered signups flush") {
    // purchase at 250 proves signup 100 abandoned (deadline 200)
    val out = cepAbandoned(Seq(
      ev(1, 100, 7, "signup"), ev(2, 250, 7, "purchase")))
    assert(out == Seq(CepTimeout(7, 100, 200)))
    // no purchase at all: only the flush can decide
    assert(cepAbandoned(Seq(ev(1, 100, 7, "signup"))).isEmpty)
    assert(Machines.abandonedFlush(7, PendingSignups(List(100L)), 100)
      == Seq(CepTimeout(7, 100, 200)))
  }

  test("cep multi-match and absence partition every decided signup") {
    // mixed run: s@100 matches p@150; s@160 and s@170 decided by p@300
    // (both late); s@310 stays pending (neither side emits)
    val evs = Seq(ev(1, 100, 7, "signup"), ev(2, 150, 7, "purchase"),
      ev(3, 160, 7, "signup"), ev(4, 170, 7, "signup"),
      ev(5, 300, 7, "purchase"), ev(6, 310, 7, "signup"))
    val matched = cepMulti(evs).map(_.signup_e).toSet
    val abandoned = cepAbandoned(evs).map(_.signup_e).toSet
    assert(matched == Set(100L))
    assert(abandoned == Set(160L, 170L))
    assert((matched & abandoned).isEmpty)
  }
}
