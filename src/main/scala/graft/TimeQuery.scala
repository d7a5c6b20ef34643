package graft

/** Dev tool: time ONE [[SparkEntry.queries]] entry in isolation, same
  * session config as [[Bench]]. Usage:
  *   tools/run.sh graft.TimeQuery <query> [sfDir] [passes]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeQuery <query> [sfDir] [passes]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to passes).foreach { p =>
      C.reclaimBlocks(spark)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[time] $name pass=$p rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
