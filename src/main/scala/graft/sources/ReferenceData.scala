package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference project's own input formats (FIXTURES.md §A),
  * so data produced for the reference runs through this engine unchanged.
  * Batch (`spark.read`) and file-streaming (`spark.readStream`) share each
  * schema — the reference replays these files as streams
  * (`env.readTextFile`, e.g. H/HotItemsAnalysis/HotItems.scala:41).
  *
  * All reference timestamps are epoch **seconds** (scaled ×1000 at its
  * watermark assignment, HotItems.scala:49); here they become proper
  * TimestampType columns via `timestamp_seconds`.
  */
object ReferenceData {

  /** UserBehavior.csv: userId,itemId,categoryId,behavior,ts
    * (H/HotItemsAnalysis/HotItems.scala:28,43-47).
    */
  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("itemId", LongType),
    StructField("categoryId", IntegerType), StructField("behavior", StringType),
    StructField("ts_sec", LongType)))

  /** AdClickLog.csv: userId,adId,province,city,ts
    * (H/MarketAnalysis/AdStatisticsByGeo.scala:34-38).
    */
  val adClickSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("adId", LongType),
    StructField("province", StringType), StructField("city", StringType),
    StructField("ts_sec", LongType)))

  /** LoginLog.csv: userId,ip,eventType,ts (H/LoginFailDetect/LoginFailOne.scala:40-44). */
  val loginSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("ip", StringType),
    StructField("eventType", StringType), StructField("ts_sec", LongType)))

  /** OrderLog.csv: orderId,eventType,txId,ts (H/OrderTimeoutDetect/OrderPayTxMatch.scala:33-37). */
  val orderSchema: StructType = StructType(Seq(
    StructField("orderId", LongType), StructField("eventType", StringType),
    StructField("txId", StringType), StructField("ts_sec", LongType)))

  /** ReceiptLog.csv: txId,payChannel,ts (H/OrderTimeoutDetect/OrderPayTxMatch.scala:46-50). */
  val receiptSchema: StructType = StructType(Seq(
    StructField("txId", StringType), StructField("payChannel", StringType),
    StructField("ts_sec", LongType)))

  private def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_seconds(col("ts_sec")))

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    withTs(spark.read.schema(schema).csv(path))

  def readCsvStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    withTs(spark.readStream.schema(schema).csv(dir))

  /** Parse already-loaded CSV lines (e.g. from Kafka values) with a
    * reference schema — `from_csv` with trimmed fields, the expression
    * twin of the reference's split/trim/cast maps (HotItems.scala:43-47).
    */
  def parseCsvLines(lines: DataFrame, schema: StructType, lineCol: String = "value"): DataFrame =
    withTs(lines
      .select(from_csv(col(lineCol), schema,
        Map("ignoreLeadingWhiteSpace" -> "true", "ignoreTrailingWhiteSpace" -> "true")).as("r"))
      .select(col("r.*")))

  /** Apache access log parse (H/NetworkFlowAnalysis/NetworkFlow.scala:47-55):
    * space-separated, columns 0=ip, 1=userId, 3=datetime
    * (`dd/MM/yyyy:HH:mm:ss`), 5=method, 6=url. Pure expressions —
    * `to_timestamp` replaces the per-record SimpleDateFormat.
    */
  def parseApacheLog(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines
      .select(split(col(lineCol), " ").as("f"))
      .select(
        element_at(col("f"), 1).as("ip"),
        element_at(col("f"), 2).as("userId"),
        to_timestamp(element_at(col("f"), 4), "dd/MM/yyyy:HH:mm:ss").as("ts"),
        element_at(col("f"), 6).as("method"),
        element_at(col("f"), 7).as("url"))
}
