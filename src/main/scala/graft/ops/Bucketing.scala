package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join strategy for cluster scale
  * (SURVEY.md: "bucketing for co-located joins"). Writing a fact table
  * bucketed (and sorted) by its join key lets every subsequent equi-join or
  * aggregation on that key run shuffle-free: each bucket pair joins locally.
  * At 100 TB this converts the dominant repeated cost (re-shuffling the
  * fact table per query) into a one-time write-side cost.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
