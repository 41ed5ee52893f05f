package graft
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe: shuffle write bytes per (query, tier). Throwaway. */
object AdjShuffle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("shuffle_global", "sim_pq_adc");
         sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bytes = new AtomicLong(0)
      val tasks = new AtomicLong(0)
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) {
            tasks.incrementAndGet()
            bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
          }
      }
      spark.sparkContext.addSparkListener(l)
      val df = SparkEntry.queries(name)(spark, sf)
      val n = df.queryExecution.toRdd.count()
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(l)
      spark.catalog.clearCache()
      println(s"PROBE $name $sf rows=$n tasks=${tasks.get()} shuffleBytes=${bytes.get()}")
    }
    spark.stop()
  }
}
