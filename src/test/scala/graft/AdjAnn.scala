package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 8): scan multi-table LSH configs (L tables × probe
  * depth H) for the cell that clears mean recall@10 >= 0.8, recording
  * the candidate-fraction cost alongside. Decides the production cell
  * sim_ann_production pins. Throwaway diagnostics.
  */
object AdjAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nVec = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    for ((l, h) <- Seq((3, 2), (4, 2), (6, 2), (8, 2), (4, 3), (6, 3), (8, 3))) {
      val df = queries.Vectors.annAudit(spark, sfDir, l, h)
      val r = df.agg(avg("recall_at_10").as("mean_recall"),
        avg("n_cand").as("mean_cand")).head()
      println(f"L=$l H<=$h mean_recall=${r.getDouble(0)}%.3f mean_cand=${r.getDouble(1)}%.1f frac=${r.getDouble(1) / nVec}%.3f")
    }
    spark.stop()
  }
}
