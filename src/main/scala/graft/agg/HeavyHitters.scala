package graft.agg

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch heavy hitters — the sub-linear-memory path for "top
  * items" when exact per-key counts no longer fit (the reference's Bloom
  * jobs answer set-membership at 1e8 keys; CMS answers frequency at the
  * same scale). Spark's `count_min_sketch` aggregate builds the sketch
  * distributed: partial sketches merge associatively, so the shuffled
  * bytes are one sketch per partition — eps/confidence-sized, independent
  * of key cardinality and row count.
  *
  * Approximate ⇒ no SQL oracle; the CMS guarantee (estimate ≥ true count,
  * overshoot ≤ eps·N with prob 1−δ) is property-tested against exact
  * counts ([[graft.BloomMultimodalSpec]]).
  */
object HeavyHitters {

  private val Eps = 0.001 // width 2718 counters/row
  private val Conf = 0.99 // depth 5 rows
  private val Seed = 42

  /** The CMS aggregate expression with this module's eps/confidence/seed —
    * shared by the batch builder and the streaming windowed twin so both
    * construct byte-identical sketches. */
  private[graft] def cmsAgg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    count_min_sketch(c, lit(Eps), lit(Conf), lit(Seed))

  /** Build the CMS over click item-ids (one distributed aggregate). */
  def sketchClicks(events: DataFrame): CountMinSketch = {
    val bytes = clickItems(events)
      .agg(cmsAgg(col("item_id")).as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  private def clickItems(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(graft.C.propsK(col("props")).as("item_id"))
      .filter(col("item_id").isNotNull)

  /** Validation view: exact top-K items (distributed count + top-k) with
    * each item's CMS estimate alongside. The sketch probe runs on the
    * driver over the K result rows only — result consumption, not a
    * distributed loop; at production scale the exact column is what the
    * sketch REPLACES, and candidates come from per-partition top-k.
    */
  def hotItemsSketchScored(events: DataFrame, topK: Int = 20): DataFrame = {
    val spark = events.sparkSession
    val cms = sketchClicks(events)
    val top = clickItems(events)
      .groupBy(col("item_id")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item_id"))
      .limit(topK)
      .collect() // K rows: the query result, scored below
    val scored = top.map(r =>
      Row(r.getLong(0), r.getLong(1), cms.estimateCount(r.getLong(0))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(scored.toSeq, 1),
      StructType(Seq(
        StructField("item_id", LongType, nullable = false),
        StructField("exact_cnt", LongType, nullable = false),
        StructField("cms_cnt", LongType, nullable = false))))
  }

  /** [[hotItemsSketchScored]] graded for the driver's DuckDB gate: the CMS
    * estimate column is replaced by the 0/1 verdict of the sketch's own
    * guarantee — `exact ≤ est ≤ exact + 2·eps·N + 8` (CMS never
    * under-counts; overshoot is ≤ eps·N per depth row w.h.p., graded at 2×
    * plus absolute slack; N = the sketch's totalCount). The oracle
    * recomputes the exact top-K from parquet and emits literal 1, so a
    * sketch drifting out of its envelope breaks the hash.
    */
  def hotItemsSketch(events: DataFrame, topK: Int = 20): DataFrame = {
    val spark = events.sparkSession
    val cms = sketchClicks(events)
    val overshoot = 2.0 * Eps * cms.totalCount() + 8.0 // 2·eps·N + slack
    val top = clickItems(events)
      .groupBy(col("item_id")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("item_id"))
      .limit(topK)
      .collect()
    val graded = top.map { r =>
      val (item, exact) = (r.getLong(0), r.getLong(1))
      val est = cms.estimateCount(item)
      Row(item, exact, if (est >= exact && est <= exact + overshoot) 1L else 0L)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(graded.toSeq, 1),
      StructType(Seq(
        StructField("item_id", LongType, nullable = false),
        StructField("exact_cnt", LongType, nullable = false),
        StructField("within_bound", LongType, nullable = false))))
  }

  /** DuckDB twin of [[hotItemsSketch]]: exact top-K + literal verdict. */
  val hotItemsSketchSql: String =
    s"""SELECT item_id, exact_cnt, CAST(1 AS BIGINT) AS within_bound
       |FROM (
       |  SELECT item_id, count(*) AS exact_cnt
       |  FROM (SELECT ${graft.C.propsKSql} AS item_id
       |        FROM events WHERE event_type = 'click')
       |  WHERE item_id IS NOT NULL
       |  GROUP BY item_id
       |  ORDER BY exact_cnt DESC, item_id
       |  LIMIT 20
       |)""".stripMargin
}
