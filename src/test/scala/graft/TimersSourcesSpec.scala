package graft

import graft.model._
import graft.ops.{FraudDetect, TopN}
import graft.sources.ReferenceData
import graft.streaming.StreamJobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

/** Event-time-timer machine parity, streaming top-N, and the reference
  * file-format readers.
  */
class TimersSourcesSpec extends SparkSuite {

  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def sentinel(id: Long): Event =
    Event(id, Timestamp.valueOf("2024-06-01 00:00:00"), -1L, "click")

  test("burst machine (EventTimeTimeout): streaming == batch run semantics") {
    val full = Tables.events(spark, sf())
      .selectExpr("event_id", "ts", "user_id", "event_type").as[Event].collect().toSeq
    val ms = MemoryStream[Event]
    val q = StreamJobs.loginBurstStream(ms.toDS(), spanSec = 7L * 86400, delay = "1 minute")
      .writeStream.format("memory").queryName("burst_parity").outputMode("append").start()
    val (b1, b2) = full.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(full.size / 2)
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    ms.addData(Seq(sentinel(-1))); q.processAllAvailable()
    ms.addData(Seq(sentinel(-2))); q.processAllAvailable()
    q.stop()
    val stream = spark.table("burst_parity").as[BurstWarning].collect()
      .filter(_.user_id >= 0).toSet
    val batch = FraudDetect.loginFailBurst(full.toDF(), spanSec = 7L * 86400)
      .as[BurstWarning].collect().toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("hot items: streaming counts + foreachBatch-style rank == batch top-N") {
    val sample = Tables.events(spark, sf())
      .filter("ts < timestamp'2024-01-08 00:00:00'")
      .selectExpr("event_id", "ts", "user_id", "event_type", "props")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSeq
    val ms = MemoryStream[(Long, Timestamp, Long, String, String)]
    val stream = ms.toDS().toDF("event_id", "ts", "user_id", "event_type", "props")
    val q = StreamJobs.hotItemCountsStream(stream)
      .writeStream.format("memory").queryName("hot_counts").outputMode("append").start()
    ms.addData(sample); q.processAllAvailable()
    val s = Timestamp.valueOf("2024-06-01 00:00:00")
    ms.addData(Seq((-1L, s, -1L, "click", """{"k": 1}"""))); q.processAllAvailable()
    ms.addData(Seq((-2L, s, -1L, "click", """{"k": 1}"""))); q.processAllAvailable()
    q.stop()
    val finalized = spark.table("hot_counts").filter("window_start < 1717000000")
    val streamTop = TopN.rankWindowCounts(finalized, "item_id", 3)
      .select("window_start", "item_id", "cnt", "rnk").collect().toSet
    val batchTop = TopN.hotItems(
      Tables.events(spark, sf()).filter("ts < timestamp'2024-01-08 00:00:00'"))
      .select("window_start", "item_id", "cnt", "rnk").collect().toSet
    assert(streamTop == batchTop)
    assert(batchTop.nonEmpty)
  }

  test("blacklist machine: cross-batch state and day reset over a real stream") {
    val full = Tables.events(spark, sf())
      .filter("event_type = 'click'")
      .selectExpr("event_id", "ts", "user_id", "event_type").as[Event].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    val withAd = full.map(e => (e, e.user_id % 3)) // synthetic ad id
    val ms = MemoryStream[(Event, Long)]
    val q = StreamJobs.blacklistStream(ms.toDS(), threshold = 2)
      .writeStream.format("memory").queryName("bl_parity").outputMode("append").start()
    val (b1, b2) = withAd.splitAt(withAd.size / 2)
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val stream = spark.table("bl_parity")
      .select("side", "user_id", "ad_id", "day", "click_ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // batch twin on the same (event, ad) rows via window functions
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = withAd.map { case (e, ad) =>
      (e.user_id, ad, e.ts.getTime / 1000, e.event_id) }
      .toDF("user_id", "ad_id", "e", "event_id")
      .withColumn("day", (col("e") / 86400).cast("long") * 86400)
    val w = Window.partitionBy(col("user_id"), col("ad_id"), col("day"))
      .orderBy(col("e"), col("event_id"))
    val batch = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(
        when(col("rn") <= 2, lit("pass")).otherwise(lit("warn")).as("side"),
        col("user_id"), col("ad_id"), col("day"), col("e").as("click_ts"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(stream == batch)
    assert(batch.exists(_._1 == "warn"))
  }

  test("apache log parser extracts the reference's columns") {
    val line = "83.149.9.216 - - 17/05/2015:10:05:03 +0000 GET /presentations/logstash/plugin.png"
    val out = ReferenceData.parseApacheLog(Seq(line).toDF("value")).collect()(0)
    assert(out.getString(0) == "83.149.9.216")
    assert(out.getString(1) == "-")
    assert(out.getTimestamp(2) == Timestamp.valueOf("2015-05-17 10:05:03"))
    assert(out.getString(3) == "GET")
    assert(out.getString(4) == "/presentations/logstash/plugin.png")
  }

  test("reference CSV schemas parse with trim and epoch-second timestamps") {
    val login = ReferenceData.parseCsvLines(
      Seq("5402, 83.149.11.115 ,fail,1558430815").toDF("value"), ReferenceData.loginSchema)
    val r = login.collect()(0)
    assert(r.getAs[Long]("userId") == 5402L)
    assert(r.getAs[String]("ip") == "83.149.11.115")
    assert(r.getAs[String]("eventType") == "fail")
    assert(r.getAs[Timestamp]("ts").getTime == 1558430815000L)

    val order = ReferenceData.parseCsvLines(
      Seq("34729,create,,1558430842").toDF("value"), ReferenceData.orderSchema)
    assert(order.select(col("orderId"), col("eventType")).collect()(0).toSeq
      == Seq(34729L, "create"))
  }
}
