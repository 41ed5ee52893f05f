package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.GraftFunctions

/** Dev probe (round 12, VERDICT r11 item 6): MEASURE the 16-plane
  * probe-fraction claim sim_ann_production's scaladoc argues. The gate
  * corpus (~2k vectors) is too sparse for 16-plane tables (65 536
  * buckets → ~0 vectors per probed bucket), but the 16× tier
  * (/tmp/graft_x16, 32 000 vectors) has enough occupancy to measure
  * the candidate fraction a 16-plane config actually pays.
  *
  * Configs: the production 8-plane cell (L=4, H≤3 — the committed
  * 0.82-recall config whose measured price is ~0.60·n) vs 16-plane
  * cells at L=4 and L=8 (the scaladoc's claimed 10⁹-vector regime,
  * probe fraction per table 697/65536 ≈ 1.1%).
  *
  * Caveat recorded with the results: ScaleGen duplicates each source
  * vector 16× verbatim (vec_id offset only), so bucket occupancy is
  * CLUSTERED — every occupied bucket holds ≥16 identical vectors.
  * That inflates n_cand above a uniform-corpus estimate (candidates
  * arrive in 16-packs) and makes recall@10 trivially reachable for
  * duplicated neighbors; the number this probe pins is the BUCKET-
  * SPACE DILUTION (candidate fraction vs the 8-bit tables on the same
  * corpus), which is exactly what the production comment claims.
  *
  * Run: sbt "Test/runMain graft.AdjAnn16"
  */
object AdjAnn16 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_x16")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, d).persist()
    val n = emb.count()

    def masks(planes: Int, maxDist: Int): Seq[Long] =
      (0 until (1 << planes))
        .filter(m => java.lang.Integer.bitCount(m) <= maxDist).map(_.toLong)

    def cell(planes: Int, nTables: Int, maxDist: Int): Unit = {
      val t0 = System.nanoTime()
      val tables = 0 until nTables
      val ms = masks(planes, maxDist)
      val withB = tables.foldLeft(emb) { (df, t) =>
        df.withColumn(s"b$t", call_function("graft_lsh_bucket",
          col("embedding"), lit(planes), lit(64), lit(t * planes)))
      }
      val qs = withB.filter(col("vec_id") % 1600 === 0)
        .select(col("vec_id").as("q_id") +: col("embedding").as("q_emb") +:
          tables.map(t => col(s"b$t").as(s"qb$t")): _*)
      // Probe list via a mask-table cross join, not a literal array:
      // 4×697 struct literals blow whole-stage codegen's 64 KB method
      // limit (the 32-plane-banding lesson) — at 16 planes the mask
      // set must be DATA. (The production 8-plane path keeps its
      // 93-literal array; this is the shape a 16-plane production
      // config would ship.)
      val sq = spark
      import sq.implicits._
      val maskDf = ms.toDF("mask")
      val probes = tables.map { t =>
        qs.select(col("q_id"), col(s"qb$t").as("qb"))
          .withColumn("qt", lit(t))
          .crossJoin(maskDf)
          .select(col("q_id"), col("qt"),
            col("qb").bitwiseXOR(col("mask")).as("probe"))
      }.reduce(_ unionByName _)
      val dataBuckets = withB.select(col("vec_id"), explode(array(
          tables.map(t => struct(lit(t).as("t"), col(s"b$t").as("bucket"))): _*))
          .as("db"))
        .select(col("vec_id"), col("db.t").as("t"), col("db.bucket").as("bucket"))
      val cands = dataBuckets.join(probes,
          col("t") === col("qt") && col("bucket") === col("probe") &&
            col("vec_id") =!= col("q_id"))
        .select("q_id", "vec_id").distinct()
        .persist()
      val exact = emb.crossJoin(qs.select(col("q_id"), col("q_emb")))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(call_function("graft_dot", col("embedding"), col("q_emb")) /
            sqrt(call_function("graft_dot", col("embedding"), col("embedding"))) /
            sqrt(call_function("graft_dot", col("q_emb"), col("q_emb"))), 6)
            .as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))))
        .filter(col("rk") <= 10)
        .select("q_id", "vec_id")
      val hits = exact.join(cands, Seq("q_id", "vec_id"))
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      val stats = cands.groupBy("q_id").agg(count(lit(1)).as("n_cand"))
        .join(hits, Seq("q_id"), "left")
        .agg(avg(col("n_cand")).as("mean_cand"),
          avg(coalesce(col("n_hits"), lit(0L)).cast(DoubleType) / 10.0)
            .as("recall"))
        .head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"CELL planes=$planes L=$nTables H<=$maxDist " +
        f"probeFracPerTable=${ms.size.toDouble / (1L << planes)}%.4f " +
        f"meanCand=${stats.getDouble(0)}%.1f " +
        f"candFrac=${stats.getDouble(0) / n}%.4f " +
        f"recall@10=${stats.getDouble(1)}%.3f wall=$secs%.1fs")
      cands.unpersist()
    }

    println(s"ADJANN16 n=$n tier=$d")
    cell(planes = 8, nTables = 4, maxDist = 3)  // the committed production cell
    cell(planes = 16, nTables = 4, maxDist = 3)
    cell(planes = 16, nTables = 8, maxDist = 3)
    spark.stop()
  }
}
