package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-14 plan-evidence dumper: writes `explain("formatted")` of the
  * named queries to `<outDir>/<key>_<suffix>.txt`, one file per key,
  * under the Bench session configuration (so the dumped shapes are the
  * ones the benchmark actually runs). Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <k1,k2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <k1,k2,...>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, keysCsv) = args.take(4)
    val keys = keysCsv.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_BYTES", "2m"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (k <- keys) {
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${k}_$suffix.txt"), plan)
        println(s"[plandump] $k -> ${k}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $k: ${e.getMessage}")
      }
      CacheDrain.drain(spark)
    }
    spark.stop()
  }
}
