package graft

import org.apache.spark.sql.functions._
import graft.ops.Tpch

/** The synthesized partsupp relation and the five partsupp-dependent TPC-H
  * shapes (Q2/Q9/Q11/Q16/Q20). The relation is a closed-form function of
  * (p_partkey, j, |supplier|) — these tests pin the structural invariants
  * the cross-engine determinism argument rests on (see Tpch.partsupp doc):
  * 4 distinct suppliers per part, keys in range, cost = integer cents.
  */
class PartsuppSpec extends SparkSuite {
  private lazy val d = sf()
  private lazy val part = Tables.part(spark, d)
  private lazy val supplier = Tables.supplier(spark, d)

  test("partsupp: exactly 4 distinct suppliers per part, all keys valid") {
    val ps = Tpch.partsupp(part, supplier).cache()
    val nPart = part.count()
    assert(ps.count() === nPart * 4)
    // (ps_partkey, ps_suppkey) unique — the injectivity of j -> (p+3j) mod S
    assert(ps.select("ps_partkey", "ps_suppkey").distinct().count() === nPart * 4)
    val nSupp = supplier.count()
    val bad = ps.filter(col("ps_suppkey") < 0 || col("ps_suppkey") >= nSupp)
    assert(bad.count() === 0)
    // every ps_suppkey resolves to a real supplier row
    val dangling = ps.join(supplier, col("ps_suppkey") === col("s_suppkey"), "left_anti")
    assert(dangling.count() === 0)
    ps.unpersist()
  }

  test("partsupp: supplycost rounds exactly back to its integer cents") {
    val ps = Tpch.partsupp(part, supplier)
    // cents/100.0 is not on the binary cent grid (0.01 is inexact), but the
    // double must sit close enough that DECIMAL(18,2) rounding (C.dec)
    // recovers the generating integer — that is the cross-engine contract.
    val offGrid = ps.filter(
      abs(col("ps_supplycost") * 100 - round(col("ps_supplycost") * 100)) > 1e-6
        || col("ps_supplycost") < 1.0 || col("ps_supplycost") >= 1001.0)
    assert(offGrid.count() === 0)
    val badQty = ps.filter(col("ps_availqty") < 1 || col("ps_availqty") > 9999)
    assert(badQty.count() === 0)
  }

  test("q2: every emitted row carries its part's minimum eligible cost") {
    val out = Tpch.q2MinCostSupplier(part, supplier,
      Tables.nation(spark, d), Tables.region(spark, d)).collect()
    assert(out.nonEmpty)
    // per part, all emitted costs equal (ties allowed, one cost value)
    val byPart = out.groupBy(_.getAs[Long]("p_partkey"))
    byPart.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Double]("ps_supplycost")).distinct.length === 1)
    }
    // sorted by acctbal desc
    val bals = out.map(_.getAs[Double]("s_acctbal"))
    assert(bals.sameElements(bals.sortBy(-_)))
  }

  test("q9: profit equals revenue minus supply cost, per (nation, year)") {
    val out = Tpch.q9ProductProfit(Tables.lineitem(spark, d),
      Tables.orders(spark, d), part, supplier, Tables.nation(spark, d))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // grouping key is unique
    assert(rows.map(r => (r.getString(0), r.getInt(1))).distinct.length === rows.length)
  }

  test("q11: every kept part value exceeds the threshold fraction of total") {
    val out = Tpch.q11ImportantStock(part, supplier, Tables.nation(spark, d))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getAs[Double]("value"))
    assert(values.sameElements(values.sortBy(-(_: Double))))
  }

  test("q16: supplier counts bounded by 4 per part and groups are distinct") {
    val rows = Tpch.q16PartsSupplierRelation(part, supplier).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .distinct.length === rows.length)
  }

  test("q20: emitted suppliers all sit in the ASIA region") {
    val out = Tpch.q20PotentialPromotion(part, supplier,
      Tables.nation(spark, d), Tables.region(spark, d), Tables.lineitem(spark, d))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val asiaNations = Tables.nation(spark, d)
      .join(Tables.region(spark, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => asiaNations.contains(r.getAs[String]("n_name"))))
  }
}
