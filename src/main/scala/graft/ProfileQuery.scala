package graft

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool: run ONE [[SparkEntry.queries]] entry and report the job/stage/
  * task shape a wall-clock number hides — how many Spark jobs the query
  * launches (each costs fixed driver latency at local scale), how many
  * stages (= exchanges + materializations), task count, summed task time
  * (CPU actually used) and shuffle bytes. Wall-clock far above
  * task-time/cores means the query is paying scheduling/planning overhead,
  * not compute — the guide §1 "where is the time going" question for a
  * local bench without the UI. Usage:
  *   tools/run.sh graft.ProfileQuery <query> [sfDir] [passes]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileQuery <query> [sfDir] [passes]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup pass at the smallest SF (codegen + JIT), mirroring Bench
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir).getParent
      val small = if (p != null) p.resolve("sf0.001") else null
      if (small != null && java.nio.file.Files.exists(small)) small.toString else sfDir
    }
    try SparkEntry.queries(name)(spark, warmDir).count()
    catch { case e: Throwable => println(s"[profile] warmup failed: $e") }

    // listener events are async; a short quiesce keeps pass attribution clean
    def quiesce(): Unit = Thread.sleep(300)

    (1 to passes).foreach { p =>
      C.reclaimBlocks(spark)
      quiesce()
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0); shuffleRead.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      quiesce()
      println(f"[profile] $name pass=$p rows=$n wall=$wall%.3f s " +
        f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
        f"taskTime=${taskTimeMs.get / 1e3}%.2f s " +
        f"shufRead=${shuffleRead.get / 1e6}%.1f MB shufWrite=${shuffleWrite.get / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
