package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only attribution harness (guide §1: measure first): runs ONE
  * registered query exactly the way [[Bench]] times it, with a listener
  * that prints every Spark job's wall time, task time, and call site —
  * so a multi-second query can be split into its constituent jobs
  * (staging writes, commits, stream batches, CC rounds, the final agg)
  * without the UI. Not part of any driver contract; numbers feed
  * OPTIMIZATION_r21.md only.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir", Tables.scratch("warehouse"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("PROFILE_CACHED_AQE", "true"))
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("parquet.block.size",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_BLOCK_BYTES", "8388608"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("PROFILE_COMMITTER_V2", "true") == "true")
      spark.sparkContext.hadoopConfiguration
        .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    // ad-hoc conf A/B: PROFILE_EXTRA_CONF="k=v;k2=v2" (dev-only)
    sys.env.get("PROFILE_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val i = kv.indexOf('=')
        spark.conf.set(kv.substring(0, i).trim, kv.substring(i + 1).trim)
      })

    final case class J(id: Int, desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var taskMs: Long = 0L)
    val jobs = new scala.collection.concurrent.TrieMap[Int, J]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val stageToJob = new scala.collection.concurrent.TrieMap[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short")))
          .getOrElse("?")
        jobs.put(e.jobId, J(e.jobId, desc, e.time))
        order.add(e.jobId)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          for (s <- si.submissionTime; c <- si.completionTime)
            j.taskMs += (c - s)
        }
      }
    })

    // same warmup footing as Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").count()
    val reps = sys.env.getOrElse("PROFILE_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      jobs.clear(); order.clear(); stageToJob.clear()
      Bench.sweepCaches(spark)
      val t0 = System.nanoTime()
      val fn = SparkEntry.queries(name)
      val agg = fn(spark, sfDir).groupBy().count()
      agg.queryExecution.executedPlan
      val tPlan = System.nanoTime()
      val rows = agg.collect()(0).getLong(0)
      val tEnd = System.nanoTime()
      Thread.sleep(300) // let listener events drain
      println(f"== rep $rep: construct+plan ${(tPlan - t0) / 1e9}%.3f s, " +
        f"execute ${(tEnd - tPlan) / 1e9}%.3f s, rows=$rows")
      import scala.jdk.CollectionConverters._
      var shown = 0
      var prevEnd = 0L
      order.asScala.toSeq.flatMap(jobs.get).foreach { j =>
        val wall = (j.end - j.start) / 1e3
        // driver-side gap since the previous job finished: planning,
        // snapshot/manifest IO, footer stats, commit machinery — the
        // between-jobs time the job walls alone can't attribute
        val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.end)
        if (wall >= 0.01 || gap >= 0.01) {
          shown += 1
          println(f"  job ${j.id}%4d ${wall}%8.3f s  gap ${gap}%7.3f s  stages=${j.stages}%3d tasks=${j.tasks}%5d stageMs=${j.taskMs}%6d  ${j.desc.take(90)}")
        }
      }
      println(s"  (${jobs.size} jobs total, $shown shown >=10ms, " +
        f"sum wall ${jobs.values.map(j => (j.end - j.start) / 1e3).sum}%.3f s)")
    }
    spark.stop()
  }
}
