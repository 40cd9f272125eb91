package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: runs one named query repeatedly and reports wall time plus
  * Spark job/stage/task counts and shuffle bytes — separates fixed scheduling
  * overhead (jobs × latency) from real work when tuning operators.
  *
  * Usage: `runMain graft.TimeQuery <sfDir> <queryName> [reps]`
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <queryName> [reps]")
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 3
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shuffleBytes = 0L
    // TIMEQUERY_STAGES=1: per-stage taskSum/cpu lines for everything over
    // 100 ms — pinpoints the hot stage (wall ≈ taskSum on few tasks = a
    // serialized stage; taskSum ≫ wall = per-task overhead). This is how the
    // r5 tokenize-per-output-row plan bug was isolated before jstack
    // confirmed it (see Lexical.tokensWithDl).
    val stageDetail = sys.env.contains("TIMEQUERY_STAGES")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (stageDetail && s.stageInfo.taskMetrics.executorRunTime > 100)
          println(f"  [stage ${s.stageInfo.stageId}%4d] tasks=${s.stageInfo.numTasks}%-4d " +
            f"runMs=${s.stageInfo.taskMetrics.executorRunTime}%-6d " +
            f"cpuMs=${s.stageInfo.taskMetrics.executorCpuTime / 1000000}%-6d")
      }
    })

    // warmup
    spark.range(100000).groupBy(org.apache.spark.sql.functions.col("id") % 7).count().collect()
    (1 to reps).foreach { i =>
      jobs = 0; stages = 0; tasks = 0; shuffleBytes = 0
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; give them a beat before reading
      Thread.sleep(300)
      println(f"[timequery] $name rep$i: $sec%.2fs rows=$n jobs=$jobs stages=$stages tasks=$tasks shuffleMB=${shuffleBytes / 1e6}%.1f")
    }
    spark.stop()
  }
}
