package graft.pipeline

/** Dev tool: dump the formatted physical plan of registered queries so
  * shuffle/pushdown/codegen shapes are auditable without a notebook.
  * Usage:
  *   tools/run.sh graft.pipeline.ExplainTool <sfDir> [query ...]
  * No names → every query. Look for: PushedFilters/ReadSchema on scans,
  * WholeStageCodegen spans, WindowGroupLimit before window shuffles,
  * BroadcastHashJoin vs SortMergeJoin, absence of CartesianProduct.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = graft.GraftSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      if (only.isEmpty || only(name)) {
        println(s"\n========== $name ==========")
        try q(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    }
    spark.stop()
  }
}
