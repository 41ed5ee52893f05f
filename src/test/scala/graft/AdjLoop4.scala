package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.lsum
import graft.functions.GraftFunctions

/** Dev probe (round 11): HITS per-round cost — shuffled-edges (current)
  * vs pre-partitioned cached edges. Throwaway. */
object AdjLoop4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val edgesPlain = li
      .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      .distinct().persist()
    println("edges: " + edgesPlain.count())
    val edgesBySrc = edgesPlain.repartition(32, col("src")).persist()
    val edgesByDst = edgesPlain.repartition(32, col("dst")).persist()
    println("pre-partitioned: " + edgesBySrc.count() + " " + edgesByDst.count())
    val hubQ = edgesPlain.select(col("src")).distinct()
      .select(col("src"), lit(1.0).as("qh"))
      .localCheckpoint(eager = true).persist()
    hubQ.count()
    def time(tag: String)(f: => Long): Unit =
      for (r <- 1 to 5) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag rep$r: ${(System.nanoTime() - t0) / 1e6}%6.1fms ($n)")
      }
    def aSide(e: DataFrame, h: DataFrame): DataFrame = e.join(h, "src")
      .groupBy("dst")
      .agg(lsum(col("qh"), 6).as("raw"))
      .withColumnRenamed("dst", "node_id")
    time("aRaw plain (both shuffled)") {
      aSide(edgesPlain, hubQ).agg(max(col("raw"))).count()
    }
    time("aRaw pre-part src") {
      aSide(edgesBySrc, hubQ).agg(max(col("raw"))).count()
    }
    time("aRaw pre-part src + bcast h") {
      aSide(edgesBySrc, broadcast(hubQ)).agg(max(col("raw"))).count()
    }
    time("aRaw pre-part DST + bcast h (agg no-exchange)") {
      aSide(edgesByDst, broadcast(hubQ)).agg(max(col("raw"))).count()
    }
    spark.stop()
  }
}
