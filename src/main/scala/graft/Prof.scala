package graft
import org.apache.spark.sql.SparkSession

/** Dev profiling main: time one or more named queries in isolation.
  * Usage: runMain graft.Prof <sfDir> <q1,q2,...> [reps]
  * Prints per-rep wall time and the formatted plan on the last rep.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE coalescing contract shared with Bench (rationale there).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_BYTES", "2m"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
    // Dev lever: SPARK_GRAFT_CONF="k=v;k2=v2" overlays arbitrary session
    // confs, for A/B-ing one knob (AQE, thresholds) without a rebuild.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROF_STAGES=1: print per-stage wall/task-count/CPU for
    // stages over 200 ms — the empirical loop's "which stage is slow"
    // readout (optimization guide §1.1) without the UI.
    if (sys.env.contains("SPARK_GRAFT_PROF_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          import org.apache.spark.scheduler._
          private val cpu = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
            // Successful attempts only: failed/speculative duplicates
            // would double-count CPU into the stage total (ADVICE r14).
            if (e.taskMetrics != null && e.reason == org.apache.spark.Success)
              cpu.merge(e.stageId, e.taskMetrics.executorCpuTime, Long.box(_) + _)
          override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val dur = (for { s0 <- si.submissionTime; c <- si.completionTime }
              yield c - s0).getOrElse(-1L)
            if (dur > 200)
              println(f"  [stage ${si.stageId}] ${dur / 1e3}%.2fs " +
                f"tasks=${si.numTasks} cpu=${cpu.getOrDefault(si.stageId, 0L) / 1e9}%.2fs")
            // Evict: the map otherwise grows for the whole profiling run
            // (ADVICE r14). Retried stage attempts re-accumulate from
            // their own task-end events.
            cpu.remove(si.stageId): Unit
          }
        })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => } // warm-up
    for (name <- names; fn = SparkEntry.queries(name); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"PROF $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
      // Mirror Bench: persist()ed blocks must not leak between reps or
      // queries, or rep 2+ reports cache-served times (codegen/JIT stay
      // warm — that's the intended rep-2 signal).
      CacheDrain.drain(spark)
      if (r == reps && sys.env.contains("SPARK_GRAFT_PROF_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
