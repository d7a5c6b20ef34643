package graft

import graft.ops.Records
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unit fixtures for the structured-record operators ([[ops.Records]]):
  * hand-built tables with known answers, covering the decision rules and
  * the fixed-point arithmetic the oracles mirror.
  */
class RecordsSpec extends SparkSuite {

  private def customers(rows: Seq[(Long, String, Int, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
  }

  private def lineitems(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }

  test("entityMatch: prefix blocks pair, distance and segment rules decide") {
    // block "name0": 3 members -> 3 id-ordered pairs; only (1,2) shares a
    // segment. block "solo0": 1 member -> no pairs. name "x" is too short.
    val out = Records.entityMatch(customers(Seq(
      (1L, "name01", 0, "AUTO", 10.0),
      (2L, "name02", 5, "AUTO", 11.5),
      (3L, "name03", 0, "SHIP", 10.0),
      (4L, "solo01", 0, "AUTO", 10.0),
      (5L, "x", 0, "AUTO", 10.0)))).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(out(0).getString(2) == "AUTO")
    assert(out(0).getLong(3) == 1L) // name01 vs name02: one substitution
    assert(out(0).getDecimal(4).toString == "1.50")
    assert(out(0).getLong(5) == 1L) // singleton reps: one record pair
  }

  test("entityMatch: verbatim duplication quotients — reps, multiplicities, within rows") {
    // the sf0.1->x100 replica shape: every record repeated verbatim. The
    // rep build collapses copies, the block sees the DISTINCT core (2 reps,
    // far under the cap), and multiplicities carry the record-pair counts.
    val core = Seq(
      (1L, "name01", 0, "AUTO", 10.0),
      (2L, "name02", 5, "AUTO", 11.5))
    val copies = (0 until 100).flatMap(i =>
      core.map { case (k, nm, nk, seg, bal) => (k + 1000L * i, nm, nk, seg, bal) })
    val out = Records.entityMatch(customers(copies)).collect()
    // cross row: reps (1,2), 100x100 record pairs; within rows: C(100,2) each
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq ==
      Seq((1L, 1L, 4950L), (1L, 2L, 10000L), (2L, 2L, 4950L)))
    assert(out.filter(r => r.getLong(0) == r.getLong(1))
      .forall(r => r.getLong(3) == 0L && r.getDecimal(4).toString == "0.00"))
  }

  test("entityMatch: nation differs but names match -> still a match (field, not block)") {
    // the blocking key is the name prefix only; nation is neither a block
    // nor a criterion, so a cross-nation same-segment pair matches
    val out = Records.entityMatch(customers(Seq(
      (1L, "name01", 0, "AUTO", 10.0),
      (2L, "name02", 24, "AUTO", 10.0)))).collect()
    assert(out.length == 1)
  }

  test("entityMatch: an over-cap block is dropped whole") {
    // BlockCap+1 DISTINCT names share the prefix "stem0" (only the last
    // char varies), so the rep-level block is one over the cap and must
    // vanish whole
    val shared = (0L until (Records.BlockCap + 1)).map(i =>
      (i, "stem0" + ('0' + i).toChar, 0, "AUTO", 1.0))
    val okBlock = Seq((1000L, "okblk1", 0, "AUTO", 1.0), (1001L, "okblk2", 0, "AUTO", 1.0))
    val out = Records.entityMatch(customers(shared ++ okBlock)).collect()
    // 65 members share prefix "stem0" -> over cap -> dropped; only the ok
    // 2-member block survives
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1000L, 1001L)))
  }

  test("entityMatchIncremental: batch probes corpus only; cap is index-side") {
    // custkey % 17 == 3 selects the batch. key 3 is batch; 0,1,2 corpus.
    // batch "name03" must match corpus name01/name02 (same segment), must
    // NOT match the other batch record (key 20, also residue 3), and a
    // probe is never dropped for the INDEX cap (cap applies to corpus
    // reps per block only).
    val out = Records.entityMatchIncremental(customers(Seq(
      (1L, "name01", 0, "AUTO", 10.0),
      (2L, "name02", 0, "AUTO", 12.0),
      (4L, "name05", 0, "SHIP", 10.0), // corpus, wrong segment
      (3L, "name03", 0, "AUTO", 11.0), // batch
      (20L, "name04", 0, "AUTO", 11.0)))) // batch too (20 % 17 == 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((3L, 1L), (3L, 2L), (20L, 1L), (20L, 2L)))
  }

  test("entityMatchIncremental: corpus duplication quotients to rep pairs with multiplicities") {
    // 100 verbatim copies of one corpus record + 1 batch record: one rep
    // pair with n_pairs = 1 x 100, and the block holds ONE corpus rep.
    // Keys 100 + 17i all have residue 100 % 17 = 15, never the batch's 3.
    val corpusRows = (0 until 100).map(i => (100L + i * 17L, "name01", 0, "AUTO", 10.0))
    val out = Records.entityMatchIncremental(customers(
      corpusRows :+ (3L, "name02", 0, "AUTO", 12.0)))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 3L)
    assert(out(0).getLong(5) == corpusRows.length.toLong) // 1 x m_corpus
  }

  test("kAnonymity: lattice levels, masks, and class buckets") {
    // 6 rows: nation 0 segment A bucket 0 x2; nation 0 segment A bucket 1 x1;
    // nation 0 segment B bucket 0 x3
    val rows = Seq.fill(2)((0L, "n", 0, "A", 100.0)) ++
      Seq((1L, "n", 0, "A", 1100.0)) ++
      Seq.fill(3)((2L, "n", 0, "B", 100.0))
    val out = Records.kAnonymity(customers(rows.zipWithIndex.map {
      case ((_, nm, nk, seg, bal), i) => (i.toLong, nm, nk, seg, bal)
    })).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // level 0 (full QI): groups of 2,1,3 -> k2_4 x2 (5 rows), k1 x1 (1 row)
    assert(out.toSet.contains((0L, "k2_4", 2L, 5L)))
    assert(out.toSet.contains((0L, "k1", 1L, 1L)))
    // level 1 (nation, segment): groups 3 (A) and 3 (B) -> k2_4 x2
    assert(out.toSet.contains((1L, "k2_4", 2L, 6L)))
    // level 3 (nation): one group of 6 -> k5_9
    assert(out.toSet.contains((3L, "k5_9", 1L, 6L)))
    // level 7 (all): one group of 6
    assert(out.toSet.contains((7L, "k5_9", 1L, 6L)))
    // every level's n_rows sums to the table size
    val byLevel = out.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    assert(byLevel.toMap == Map(0L -> 6L, 1L -> 6L, 3L -> 6L, 7L -> 6L))
  }

  test("basketPairs: support threshold, duplicate items, fixed-point conf/lift") {
    // baskets: o1={1,2,3}, o2={1,2}, o3={1,2}, o4={3} (3 listed twice -> once)
    val out = Records.basketPairs(lineitems(Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L)))).collect()
    // pair (1,2) cnt 3 passes; (1,3) and (2,3) cnt 1 fail MinSupport
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 2L, 3L))
    assert((r.getLong(3), r.getLong(4)) == (3L, 3L)) // part 1 in 3 baskets, part 2 in 3
    // conf = (3 * 1e6) div 3 = 1e6; lift = (1e6 * 4 baskets) div 3 = 1333333
    assert(r.getLong(5) == 1000000L)
    assert(r.getLong(6) == 1333333L)
  }

  test("basketPairs: truncating division matches the oracle's // semantics") {
    // o1={1,2}, o2={1,2}, o3={1}: pair cnt 2, cnt_a 3 -> conf = 2e6 div 3
    val out = Records.basketPairs(lineitems(Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L)))).collect()
    assert(out.length == 1)
    assert(out(0).getLong(5) == 666666L) // floor(2000000/3)
    // lift = (666666 * 3) div 2 = 999999 (truncation compounds, by design)
    assert(out(0).getLong(6) == 999999L)
  }
}
