package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev adjudication probe (round 8): measure dedup_simhash's band-bucket
  * fatness and candidate-pair volume at a tier, to decide whether the
  * >2x-floor driver reading is data (a fattened band on the regenerated
  * corpus) or noise. Throwaway diagnostics, not part of the library
  * surface.
  */
object AdjSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs: ${docs.count()}")
    // Reconstruct the banded table exactly as dedup_simhash builds it.
    val shing = docs.select(col("doc_id"),
      explode(call_function("graft_shingles", col("text"))).as("w"))
    val sigs = shing.groupBy("doc_id")
      .agg(call_function("graft_simhash", col("w")).as("sig"))
    val bandCols = array((0 until 8).map(j =>
      shiftrightunsigned(col("sig"), j * 8).bitwiseAND(lit(0xFFL))): _*)
    val banded = sigs
      .select(col("doc_id"), col("sig"), posexplode(bandCols).as(Seq("bidx", "bval")))
      .persist()
    val buckets = banded.groupBy("bidx", "bval").agg(count(lit(1)).as("n"))
      .withColumn("pairs", col("n") * (col("n") - 1) / 2)
    println("top-10 fattest buckets:")
    buckets.orderBy(desc("n")).limit(10).collect().foreach(println)
    val tot = buckets.agg(sum("pairs").as("cand_pairs"), sum("n").as("rows")).head()
    println(s"total candidate pairs (pre-dedup): ${tot.getAs[Any]("cand_pairs")}; banded rows: ${tot.getAs[Any]("rows")}")
    spark.stop()
  }
}
