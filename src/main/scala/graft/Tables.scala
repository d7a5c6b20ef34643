package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * Every query goes through these so that column pruning / predicate
  * pushdown reach the parquet scan (Catalyst prunes based on the final
  * plan, the loader stays a bare scan). At 100 TB these would be
  * partitioned tables behind a catalog; the API surface is the same.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType. Read it as a long (legacy nanosAsLong) and truncate
    * nanos→micros (`div 1000`, exact integer floor) — the same truncation
    * DuckDB applies when it loads nano timestamps, so both engines see
    * identical microsecond instants.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(p(dir, "events"))
    raw.schema("ts").dataType match {
      // nanos (driver testdata): truncate to micros
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // TIMESTAMP_NTZ (parquet micros without UTC-adjust flag) or real
      // timestamp: normalize to one canonical TimestampType so encoders,
      // Row.getTimestamp and watermarks all see the same type. Under the
      // UTC session TZ the NTZ→TZ cast is value-identical, and casting an
      // already-TimestampType column is a no-op Catalyst folds away.
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def orders(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "orders"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "part"))
  def nation(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "nation"))
  def region(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "region"))
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))
}
