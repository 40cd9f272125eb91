package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Throwaway profiling harness (not part of the library): breaks a hot bench
  * query into stages and reports wall / job count / task-time / GC per stage.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val taskMs = new AtomicLong(0)
    val verbose = sys.env.contains("PROF_STAGES")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStartNs.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobStartNs.remove(j.jobId)
        if (verbose && st != null) {
          val ms = (System.nanoTime() - st._1) / 1000000
          if (ms > 80) System.err.println(f"  [job ${j.jobId}%4d] wallMs=$ms%-6d ${st._2}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        if (verbose && s.stageInfo.taskMetrics.executorRunTime > 200)
          System.err.println(f"  [stage ${s.stageInfo.stageId}%4d] tasks=${s.stageInfo.numTasks}%-4d runMs=${s.stageInfo.taskMetrics.executorRunTime}%-6d cpuMs=${s.stageInfo.taskMetrics.executorCpuTime/1000000}%-6d ${s.stageInfo.name.take(80)}")
      }
    })
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def step[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); val g0 = gcMs; val tm0 = taskMs.get()
      val r = f
      Thread.sleep(50) // let listener drain
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2fs jobs=${jobs.get()-j0}%-3d taskSum=${(taskMs.get()-tm0)/1e3}%7.1fs gc=${gcMs-g0}%5dms")
      r
    }
    // warmup identical to Bench
    spark.range(1000000).groupBy((col("id") % 10)).count().collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def ld(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

    if (sys.env.contains("PROF_LOOP")) {
      import graft.operators.Lexical
      val docs2 = ld("documents")
      val queries = docs2.filter(col("doc_id") < 10).select(col("doc_id").as("qid"), col("text"))
      val qterms0 = queries.select(col("qid").cast("long").as("query_id"),
        explode(array_distinct(Lexical.terms(col("text")))).as("term")).localCheckpoint(true)
      val qset0 = qterms0.select("term").distinct().localCheckpoint(true)
      val tokens = docs2.select(
        col("doc_id").cast("long").as("doc_id"),
        size(Lexical.terms(col("text"))).cast("double").as("dl"),
        explode(Lexical.terms(col("text"))).as("term"))
      def dDf0 = tokens.join(broadcast(qset0), Seq("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      for (i <- 1 to 60) {
        val h = step(s"loop$i lckpt")(dDf0.localCheckpoint(true))
        h.unpersist(true)
      }
      spark.stop(); return
    }

    for (round <- 1 to 2) {
      System.err.println(s"=== round $round ===")
      val docs = step("read documents")(ld("documents").localCheckpoint(true))
      docs.unpersist(true)
      val docs2 = ld("documents")
      val queries = docs2.filter(col("doc_id") < 10).select(col("doc_id").as("qid"), col("text"))

      {
        import graft.operators.Lexical
        val qterms0 = queries.select(col("qid").cast("long").as("query_id"),
          explode(array_distinct(Lexical.terms(col("text")))).as("term")).localCheckpoint(true)
        val qset0 = qterms0.select("term").distinct().localCheckpoint(true)
        val tokens = docs2.select(
          col("doc_id").cast("long").as("doc_id"),
          size(Lexical.terms(col("text"))).cast("double").as("dl"),
          explode(Lexical.terms(col("text"))).as("term"))
        step("A explode only count")(tokens.count())
        step("B explode+bjoin count")(tokens.join(broadcast(qset0), Seq("term")).count())
        step("C B+groupBy count only") {
          tokens.join(broadcast(qset0), Seq("term"))
            .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).count()
        }
        step("D C+first(dl)") {
          tokens.join(broadcast(qset0), Seq("term"))
            .groupBy("doc_id", "term")
            .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl")).count()
        }
        step("E explode only, no dl") {
          docs2.select(col("doc_id").cast("long").as("doc_id"),
            explode(Lexical.terms(col("text"))).as("term")).count()
        }
        step("F E+bjoin+agg+first(dl=lit)") {
          docs2.select(col("doc_id").cast("long").as("doc_id"),
            explode(Lexical.terms(col("text"))).as("term"))
            .join(broadcast(qset0), Seq("term"))
            .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).count()
        }
        step("G repart(32) then D") {
          docs2.repartition(32).select(
            col("doc_id").cast("long").as("doc_id"),
            size(Lexical.terms(col("text"))).cast("double").as("dl"),
            explode(Lexical.terms(col("text"))).as("term"))
            .join(broadcast(qset0), Seq("term"))
            .groupBy("doc_id", "term")
            .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl")).count()
        }
        val dDf = tokens.join(broadcast(qset0), Seq("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
        val h = step("H D.localCheckpoint(true)")(dDf.localCheckpoint(true))
        step("H2 count from checkpoint")(h.count())
        h.unpersist(true)
        step("H3 D.persist+count") {
          val p = dDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count(); p.unpersist(true)
        }
        step("H4 D.rdd.count")(dDf.rdd.count())
        step("H5 D.toRdd.copy.count")(dDf.queryExecution.toRdd.map(_.copy()).count())
        step("NOCKPT full bm25 shape") {
          // bm25TopK without any localCheckpoint: rely on ReuseExchange
          val qt = queries.select(col("qid").cast("long").as("query_id"),
            explode(array_distinct(Lexical.terms(col("text")))).as("term"))
          val qs = qt.select("term").distinct()
          val toks = docs2.select(
            col("doc_id").cast("long").as("doc_id"),
            size(Lexical.terms(col("text"))).cast("double").as("dl"),
            explode(Lexical.terms(col("text"))).as("term"))
          val tf2 = toks.join(broadcast(qs), Seq("term"))
            .groupBy("doc_id", "term")
            .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
          val stats2 = docs2.agg(count(lit(1)).cast("double").as("n_docs"),
            avg(size(Lexical.terms(col("text"))).cast("double")).as("avgdl"))
          val dfCounts = tf2.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
          val contrib = tf2
            .join(broadcast(qt), Seq("term"))
            .join(broadcast(dfCounts), Seq("term"))
            .crossJoin(broadcast(stats2))
            .withColumn("idf",
              log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
            .withColumn("contrib",
              col("idf") * col("tf") * lit(2.2) /
                (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          val scored = contrib.groupBy("query_id", "doc_id")
            .agg(sort_array(collect_list(struct(col("term"), col("contrib")))).as("__cs"))
            .withColumn("score",
              aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("contrib")))
          scored.groupBy("query_id")
            .agg(graft.functions.VecExpressions.topK(5, col("score"), col("doc_id")).as("__t"))
            .select(col("query_id"), posexplode(col("__t"))).count()
        }
        step("ROWS tf count")(System.err.println("tf rows = " + dDf.count()))
        step("L repart32+lckpt(false)") {
          val p = dDf.repartition(32).localCheckpoint(false)
          p.count(); p.unpersist(true)
        }
        step("M repart32+lckpt(true)") {
          val p = dDf.repartition(32).localCheckpoint(true)
          p.count(); p.unpersist(true)
        }
        step("N aqe minPartitionSize=16k full bm25") {
          spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
          try SparkEntry.queries("q_bm25")(spark, sfDir).count()
          finally spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        }
        step("I repart(4) then D") {
          docs2.repartition(4).select(
            col("doc_id").cast("long").as("doc_id"),
            size(Lexical.terms(col("text"))).cast("double").as("dl"),
            explode(Lexical.terms(col("text"))).as("term"))
            .join(broadcast(qset0), Seq("term"))
            .groupBy("doc_id", "term")
            .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl")).count()
        }
        step("J repart(32) explode count") {
          docs2.repartition(32).select(col("doc_id").cast("long").as("doc_id"),
            explode(Lexical.terms(col("text"))).as("term")).count()
        }
        step("K repart(32) noexplode") {
          docs2.repartition(32).select(col("doc_id").cast("long").as("doc_id"),
            size(Lexical.terms(col("text"))).as("n")).agg(sum(col("n"))).count()
        }
      }

      // piecewise bm25
      import graft.operators.Lexical
      val qterms = step("qterms checkpoint") {
        val q = queries.select(col("qid").cast("long").as("query_id"),
          explode(array_distinct(Lexical.terms(col("text")))).as("term")).localCheckpoint(true)
        q
      }
      val qset = step("qset distinct collect")(qterms.select("term").distinct().localCheckpoint(true))
      val tf = step("tf agg checkpoint") {
        val tokens = docs2.select(
          col("doc_id").cast("long").as("doc_id"),
          size(Lexical.terms(col("text"))).cast("double").as("dl"),
          explode(Lexical.terms(col("text"))).as("term"))
        tokens.join(broadcast(qset), Seq("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
          .localCheckpoint(true)
      }
      val stats = step("stats agg") {
        docs2.agg(count(lit(1)).cast("double").as("n_docs"),
          avg(size(Lexical.terms(col("text"))).cast("double")).as("avgdl")).localCheckpoint(true)
      }
      step("score+topk count") {
        val dfCounts = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
        val contrib = tf
          .join(broadcast(qterms), Seq("term"))
          .join(broadcast(dfCounts), Seq("term"))
          .crossJoin(broadcast(stats))
          .withColumn("idf",
            log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
          .withColumn("contrib",
            col("idf") * col("tf") * lit(2.2) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        val scored = contrib.groupBy("query_id", "doc_id")
          .agg(sort_array(collect_list(struct(col("term"), col("contrib")))).as("__cs"))
          .withColumn("score",
            aggregate(col("__cs"), lit(0.0), (acc, x) => acc + x.getField("contrib")))
        val out = scored.groupBy("query_id")
          .agg(graft.functions.VecExpressions.topK(5, col("score"), col("doc_id")).as("__t"))
          .select(col("query_id"), posexplode(col("__t")))
        out.count()
      }
      step("full q_bm25 via entry") {
        SparkEntry.queries("q_bm25")(spark, sfDir).count()
      }
      step("full q_merge_blocking_docs") {
        SparkEntry.queries("q_merge_blocking_docs")(spark, sfDir).count()
      }
      step("full q_hdbscan_parity") {
        SparkEntry.queries("q_hdbscan_parity")(spark, sfDir).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
