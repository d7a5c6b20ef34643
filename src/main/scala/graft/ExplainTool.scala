package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more queries.
  * Usage: tools/run.sh graft.ExplainTool <sfDir> <query> [query...]
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
