package graft.pipeline

/** Dev tool: wall-clock the knn_ivf_pq DAG (training vs full query) so
  * perf work targets the measured hot spot. The round-7 investigation this
  * drove: the per-candidate ADC projection fused with the probe join blew
  * Janino's 64 KB method limit, silently dropping the scan stage to
  * interpreted execution (~4 s of a 5 s query at sf0.1); the fix is the
  * per-query ADC lookup table in [[Knn.knnIvfPq]].
  * Usage: tools/run.sh graft.pipeline.PqProfile [sfDir] [passes]
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit =
      (1 to passes).foreach { p =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        println(f"[pq] $label%-32s pass=$p rows=$n%8d ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }

    val emb = graft.Tables.embeddings(spark, sfDir)
    emb.count()
    time("trainPqCodebooks")(Knn.trainPqCodebooks(emb).count())
    time("full knnIvfPq")(Knn.knnIvfPq(emb).count())
    spark.stop()
  }
}
