package graft

import graft.jobs.ReferenceJobs
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The reference-replay layer on the reference's OWN bundled inputs
  * (read-only at /root/reference/src/main/resources) with the reference's
  * parameters — the "switch engines, keep your data and jobs" claim,
  * checked against independently-computed expectations on the collected
  * rows.
  */
class ReferenceJobsSpec extends SparkSuite {

  private val res = "/root/reference/src/main/resources"
  private lazy val all = ReferenceJobs.runAll(spark, res)

  test("every file-driven reference job returns rows on its bundled input") {
    all.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("login fail: pairs match a hand-rolled scan of LoginLog") {
    val rows = graft.sources.ReferenceData
      .readCsv(spark, s"$res/LoginLog.csv", graft.sources.ReferenceData.loginSchema)
      .select("userId", "eventType", "ts_sec", "ip").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      evs.toSeq.sortBy(e => (e._3, e._4)).sliding(2).collect {
        case Seq((_, "fail", e1, _), (_, "fail", e2, _)) if e2 - e1 <= 2 =>
          (uid, e1, e2)
      }
    }.toSet
    val got = all("login_fail").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("order timeout: every created order gets exactly one outcome") {
    val out = all("order_timeout")
    val creates = graft.sources.ReferenceData
      .readCsv(spark, s"$res/OrderLog.csv", graft.sources.ReferenceData.orderSchema)
      .filter(col("eventType") === "create").count()
    assert(out.count() == creates)
    val msgs = out.groupBy("result_msg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(msgs.keySet.subsetOf(
      Set("payed successfully", "payed but already timeout", "order timeout")))
    assert(msgs.getOrElse("payed successfully", 0L) > 0)
  }

  test("tx match: matched + unmatched_pay partitions the pay events") {
    val out = all("tx_match")
    val pays = graft.sources.ReferenceData
      .readCsv(spark, s"$res/OrderLog.csv", graft.sources.ReferenceData.orderSchema)
      .filter(col("eventType") === "pay" && col("txId") =!= "").count()
    val sides = out.groupBy("side").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.getOrElse("matched", 0L) + sides.getOrElse("unmatched_pay", 0L) == pays)
    assert(sides.getOrElse("matched", 0L) > 0)
  }

  test("network flow ranks URLs within each 10min/5s window") {
    val nf = all("network_flow")
    assert(nf.filter(col("rnk") > 5).count() == 0)
    assert(nf.filter(col("rnk") === 1).count() > 0)
  }

  test("HotItemsWithSql: SQL surface == DataFrame surface row-for-row") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2017-11-26 09:00:00").getTime / 1000
    val ub = (0 until 400).map { i =>
      (i.toLong % 40, i.toLong % 11, 1, if (i % 7 == 0) "cart" else "pv", t0 + i * 17)
    }.toDF("userId", "itemId", "categoryId", "behavior", "ts_sec")
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
    val df = ReferenceJobs.hotItems(ub).collect().toSeq
    val sql = ReferenceJobs.hotItemsSql(spark, ub).collect().toSeq
    assert(df == sql)
    assert(df.nonEmpty)
  }

  test("hot items + page view + UV on a synthetic UserBehavior frame") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2017-11-26 09:00:00").getTime / 1000
    val rows = (0 until 600).map { i =>
      (i.toLong % 50, i.toLong % 7, 1, if (i % 5 == 0) "buy" else "pv", t0 + i * 13)
    }
    val ub = rows.toDF("userId", "itemId", "categoryId", "behavior", "ts_sec")
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
    val hot = ReferenceJobs.hotItems(ub)
    assert(hot.filter(col("rnk") > 3).count() == 0 && hot.count() > 0)
    val pv = ReferenceJobs.pageView(ub).agg(sum("pv_count")).collect()(0).getLong(0)
    assert(pv == rows.count(_._4 == "pv"))
    val uv = ReferenceJobs.uniqueVisitor(ub)
    assert(uv.agg(max("uv_count")).collect()(0).getLong(0) <= 50)
    val uva = ReferenceJobs.uniqueVisitorApprox(ub)
    assert(uva.count() == uv.count())
  }
}
