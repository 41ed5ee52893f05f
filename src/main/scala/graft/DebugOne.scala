package graft
import org.apache.spark.sql.SparkSession

/** Throwaway debug harness: run named queries and print real stack traces
  * (Bench swallows them).
  */
object DebugOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("ts_anomaly_zscore")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(s"OK $n rows=$c")
      } catch {
        case e: Throwable =>
          println(s"FAIL $n: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace(System.out)
      }
    }
    spark.stop()
  }
}
