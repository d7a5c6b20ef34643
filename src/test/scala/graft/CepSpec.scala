package graft

import graft.model.Event
import graft.ops.{Cep, FraudDetect}
import graft.ops.Cep.typeIs
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame

/** Unit + parity tests for the generic CEP operator (SURVEY.md §2.9):
  * strict contiguity (`nextPattern` — reference
  * H/LoginFailDetect/LoginFailWithCep.scala:56-60) and relaxed contiguity
  * (`followedBy` — H/OrderTimeoutDetect/OrderTimeoutWithCep.scala:45-48).
  */
class CepSpec extends SparkSuite {

  private def events(rows: (Long, Long, Long, String)*): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, sec, user, typ) =>
      Event(id, new Timestamp(sec * 1000), user, typ)
    }).toDF()
  }

  private def failPair(df: DataFrame, gap: Long = 3600): Seq[(Long, Long, Long)] =
    Cep.nextPattern(df,
      Seq(typeIs("first_fail", "error"), typeIs("second_fail", "error")), gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("nextPattern (error,error) ≡ loginFailConsecutive on real data") {
    val df = Tables.events(spark, sf())
    val cep = Cep.nextPattern(df,
      Seq(typeIs("first_fail", "error"), typeIs("second_fail", "error")), 3600)
    val fixed = FraudDetect.loginFailConsecutive(df, 3600)
    assert(cep.columns.toSeq == fixed.columns.toSeq)
    val a = cep.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = fixed.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a.nonEmpty && a == b)
  }

  test("nextPattern: strict contiguity — an intervening event kills the match") {
    val df = events((1, 100, 7, "error"), (2, 105, 7, "click"), (3, 110, 7, "error"))
    assert(failPair(df).isEmpty)
  }

  test("nextPattern: within is inclusive on the first→last gap") {
    assert(failPair(events((1, 100, 7, "error"), (2, 3700, 7, "error")))
      == Seq((7L, 100L, 3700L)))
    assert(failPair(events((1, 100, 7, "error"), (2, 3701, 7, "error"))).isEmpty)
  }

  test("nextPattern: matches never cross keys") {
    val df = events((1, 100, 7, "error"), (2, 105, 8, "error"))
    assert(failPair(df).isEmpty)
  }

  test("nextPattern: 3-step pattern binds each step's event time in order") {
    val df = events(
      (1, 100, 7, "view"), (2, 110, 7, "click"), (3, 120, 7, "purchase"),
      // second candidate broken by strict contiguity
      (4, 200, 7, "view"), (5, 210, 7, "error"), (6, 220, 7, "click"))
    val out = Cep.nextPattern(df,
      Seq(typeIs("v", "view"), typeIs("c", "click"), typeIs("p", "purchase")), 3600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((7L, 100L, 110L, 120L)))
  }

  test("followedBy: intervening non-matching events are skipped") {
    val df = events(
      (1, 100, 7, "signup"), (2, 150, 7, "view"), (3, 200, 7, "purchase"))
    val out = Cep.signupThenPurchase(df, 7200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((7L, 100L, 200L)))
  }

  test("followedBy: each b matches only the LATEST preceding a (documented divergence)") {
    val df = events(
      (1, 100, 7, "signup"), (2, 200, 7, "signup"), (3, 300, 7, "purchase"))
    val out = Cep.signupThenPurchase(df, 7200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((7L, 200L, 300L)))
  }

  test("followedBy: within bound excludes stale a-events") {
    val df = events((1, 100, 7, "signup"), (2, 100 + 7201, 7, "purchase"))
    assert(Cep.signupThenPurchase(df, 7200).collect().isEmpty)
  }

  private def eachMatches(df: DataFrame): Seq[(Long, Long, Long)] =
    Cep.signupThenPurchaseEach(df, 7200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("followedByEach: k pending a's before one b ALL match (Flink CEP semantics)") {
    val df = events(
      (1, 100, 7, "signup"), (2, 200, 7, "signup"), (3, 250, 7, "view"),
      (4, 300, 7, "purchase"))
    assert(eachMatches(df) == Seq((7L, 100L, 300L), (7L, 200L, 300L)))
  }

  test("followedByEach: each a completes at its FIRST subsequent b (skip-till-next-match)") {
    val df = events(
      (1, 100, 7, "signup"), (2, 200, 7, "purchase"),
      (3, 300, 7, "signup"), (4, 400, 7, "purchase"))
    // a@100 → b@200 (not b@400); a@300 → b@400
    assert(eachMatches(df) == Seq((7L, 100L, 200L), (7L, 300L, 400L)))
  }

  test("followedByEach: within prunes a's whose first b is too late; keys don't mix") {
    val df = events(
      (1, 100, 7, "signup"), (2, 100 + 7201, 7, "purchase"),
      (3, 500, 8, "signup"), (4, 600, 9, "purchase"))
    assert(eachMatches(df).isEmpty)
  }

  test("notFollowedBy: matches and timeouts PARTITION the a-events (Flink's two-sided select)") {
    val df = events(
      (1, 100, 7, "signup"), (2, 200, 7, "purchase"),   // matched
      (3, 500, 7, "signup"),                            // no purchase ever
      (4, 900, 8, "signup"), (5, 900 + 7201, 8, "purchase")) // purchase too late
    val timedOut = Cep.abandonedSignup(df, 7200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(timedOut == Seq((7L, 500L, 7700L), (8L, 900L, 8100L)))
    // union of matched a-times and timed-out a-times == all a-events, disjoint
    val matched = eachMatches(df).map { case (u, a, _) => (u, a) }.toSet
    val timed = timedOut.map { case (u, a, _) => (u, a) }.toSet
    assert((matched & timed).isEmpty)
    assert(matched ++ timed == Set((7L, 100L), (7L, 500L), (8L, 900L)))
  }

  test("followedByEach ⊇ followedBy on real data; extra rows are earlier pending a's") {
    val df = Tables.events(spark, sf())
    val each = eachMatches(df).toSet
    val latest = Cep.signupThenPurchase(df, 7200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every latest-a match whose b is that a's first subsequent purchase
    // appears in the multi-match set; multi-match can only add rows for
    // EARLIER pending a's of the same (user, b)
    val eachAB = each.map { case (u, a, b) => (u, b) -> a }
      .groupBy(_._1).view.mapValues(_.map(_._2))
    latest.foreach { case (u, a, b) =>
      eachAB.get((u, b)).foreach(as => assert(as.forall(_ <= a)))
    }
    assert(each.nonEmpty && latest.nonEmpty)
  }
}
