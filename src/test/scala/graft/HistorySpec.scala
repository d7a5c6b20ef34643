package graft

import graft.ops.History
import graft.pipeline.Curation
import org.apache.spark.sql.functions._

/** Invariants for the temporal-history operators ([[graft.ops.History]])
  * and the leakage-free split manifest ([[Curation.splitAssign]]).
  */
class HistorySpec extends SparkSuite {

  private lazy val events = Tables.events(spark, sf())
  private lazy val docs = Tables.documents(spark, sf())

  test("scd2: intervals tile each user's timeline with no gaps or overlaps") {
    val iv = History.scd2Intervals(events).cache()
    try {
      // exactly one open (current) interval per user
      val open = iv.filter(col("is_current") === 1)
        .groupBy("user_id").count().filter(col("count") =!= 1)
      assert(open.count() == 0)
      // consecutive versions abut exactly: valid_to(v) == valid_from(v+1)
      val gaps = iv.as("a").join(iv.as("b"),
        col("a.user_id") === col("b.user_id") &&
          (col("a.version") + 1) === col("b.version") &&
          (col("a.valid_to").isNull || col("a.valid_to") =!= col("b.valid_from")))
      assert(gaps.count() == 0)
      // adjacent intervals always change state (maximal runs)
      val same = iv.as("a").join(iv.as("b"),
        col("a.user_id") === col("b.user_id") &&
          (col("a.version") + 1) === col("b.version") &&
          col("a.state") === col("b.state"))
      assert(same.count() == 0)
    } finally iv.unpersist()
  }

  test("scd2: interval count equals the lag-change count of the raw log") {
    // independent recount: number of (prev != cur) boundaries + first rows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("e"), col("event_id"))
    val changes = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("e"))
      .withColumn("p", lag("event_type", 1).over(w))
      .filter(col("p").isNull || col("p") =!= col("event_type")).count()
    assert(History.scd2Intervals(events).count() == changes)
  }

  test("rolling features: frame counts match a brute-force per-user rescan") {
    val out = History.rollingUserFeatures(events)
    val base = events.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("e"),
      round(col("value") * 100).cast("long").as("cents"))
    // brute force via a self-join on a small SF: all pairs within range
    val brute = base.as("l").join(base.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.e").between(col("l.e") - 604800L, col("l.e")))
      .groupBy(col("l.event_id").as("event_id"))
      .agg(count(lit(1)).as("b_cnt_7d"), sum(col("r.cents")).as("b_cents_7d"))
    val bad = out.join(brute, Seq("event_id"))
      .filter(col("cnt_7d") =!= col("b_cnt_7d") ||
        col("cents_7d") =!= col("b_cents_7d"))
    assert(bad.count() == 0)
    // 1d frame is a subset of the 7d frame
    assert(out.filter(col("cnt_1d") > col("cnt_7d")).count() == 0)
  }

  test("split_assign: sources are disjoint across splits and counts conserve") {
    val m = Curation.splitAssign(docs).collect()
    val totalDocs = m.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == docs.count())
    val totalSources = m.map(_.getAs[Long]("n_sources")).sum
    val distinctSources =
      docs.select(coalesce(col("source"), lit(""))).distinct().count()
    // disjointness: per-split distinct sources sum to the global distinct
    // count iff no source appears in two splits
    assert(totalSources == distinctSources)
    // all three splits materialize at this SF and train dominates
    val bySplit = m.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"))
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
  }
}
