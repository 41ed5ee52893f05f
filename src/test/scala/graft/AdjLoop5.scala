package graft
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.lsum
import graft.functions.GraftFunctions

/** Dev probe (round 11): HITS fused one-action round vs current
  * two-action round. Throwaway. */
object AdjLoop5 {
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
    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    })
    val edges = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      .distinct().persist()
    edges.count()
    val fpCol = sum((pmod(xxhash64(col("node_id")), lit(1000000007L))
      .cast(DecimalType(38, 0)) *
      (col("raw") * 10000).cast(DecimalType(38, 0)))
      .cast(DecimalType(38, 0))).as("fp")
    val hub0 = edges.select(col("src")).distinct()
      .select(col("src"), lit(1.0).as("qh"))

    // --- current 2-action round ---
    def round2act(hubQ: DataFrame): (DataFrame, DataFrame, Double, Double, java.math.BigDecimal) = {
      val aRaw = edges.join(hubQ, "src").groupBy("dst")
        .agg(lsum(col("qh"), 6).as("raw"))
        .withColumnRenamed("dst", "node_id")
        .localCheckpoint(eager = false).persist()
      val r1 = aRaw.agg(max(col("raw")).as("ma"), fpCol).head()
      val (ma, fp) = (r1.getDouble(0), r1.getDecimal(1))
      val aQ = aRaw.select(col("node_id"), round(col("raw") / lit(ma), 4).as("q"))
      val hRaw = edges
        .join(aQ.select(col("node_id").as("dst"), col("q").as("qa")), "dst")
        .groupBy("src")
        .agg(lsum(col("qa"), 6).as("raw"))
        .withColumnRenamed("src", "node_id")
        .localCheckpoint(eager = false).persist()
      val mh = hRaw.agg(max(col("raw"))).head().getDouble(0)
      (aRaw, hRaw, ma, mh, fp)
    }
    // --- fused 1-action round: ma in-plan ---
    def round1act(hubQ: DataFrame): (DataFrame, DataFrame, Double, Double, java.math.BigDecimal) = {
      val aRaw = edges.join(hubQ, "src").groupBy("dst")
        .agg(lsum(col("qh"), 6).as("raw"))
        .withColumnRenamed("dst", "node_id")
        .localCheckpoint(eager = false).persist()
      val maDf = aRaw.agg(max(col("raw")).as("ma"))
      val aQ = aRaw.crossJoin(broadcast(maDf))
        .select(col("node_id"), round(col("raw") / col("ma"), 4).as("q"))
      val hRaw = edges
        .join(aQ.select(col("node_id").as("dst"), col("q").as("qa")), "dst")
        .groupBy("src")
        .agg(lsum(col("qa"), 6).as("raw"))
        .withColumnRenamed("src", "node_id")
        .localCheckpoint(eager = false).persist()
      val stats = aRaw.agg(max(col("raw")).as("m"), fpCol, lit("a").as("side"))
        .unionByName(hRaw.agg(max(col("raw")).as("m"),
          lit(null).cast(DecimalType(38, 0)).as("fp"), lit("h").as("side")))
      val rows = stats.collect()
      val ar = rows.find(_.getString(2) == "a").get
      val hr = rows.find(_.getString(2) == "h").get
      (aRaw, hRaw, ar.getDouble(0), hr.getDouble(0), ar.getDecimal(1))
    }

    // --- pre-partitioned edges: a-side joins edgesBySrc, h-side edgesByDst ---
    val edgesBySrc = edges.repartition(32, col("src")).persist()
    val edgesByDst = edges.repartition(32, col("dst")).persist()
    edgesBySrc.count(); edgesByDst.count()
    def roundPre(hubQ: DataFrame): (DataFrame, DataFrame, Double, Double, java.math.BigDecimal) = {
      val aRaw = edgesBySrc.join(hubQ, "src").groupBy("dst")
        .agg(lsum(col("qh"), 6).as("raw"))
        .withColumnRenamed("dst", "node_id")
        .localCheckpoint(eager = false).persist()
      val r1 = aRaw.agg(max(col("raw")).as("ma"), fpCol).head()
      val (ma, fp) = (r1.getDouble(0), r1.getDecimal(1))
      val aQ = aRaw.select(col("node_id"), round(col("raw") / lit(ma), 4).as("q"))
      val hRaw = edgesByDst
        .join(aQ.select(col("node_id").as("dst"), col("q").as("qa")), "dst")
        .groupBy("src")
        .agg(lsum(col("qa"), 6).as("raw"))
        .withColumnRenamed("src", "node_id")
        .localCheckpoint(eager = false).persist()
      val mh = hRaw.agg(max(col("raw"))).head().getDouble(0)
      (aRaw, hRaw, ma, mh, fp)
    }

    def roundBcast(hubQ: DataFrame): (DataFrame, DataFrame, Double, Double, java.math.BigDecimal) = {
      val aRaw = edges.join(broadcast(hubQ), "src").groupBy("dst")
        .agg(lsum(col("qh"), 6).as("raw"))
        .withColumnRenamed("dst", "node_id")
        .localCheckpoint(eager = false).persist()
      val r1 = aRaw.agg(max(col("raw")).as("ma"), fpCol).head()
      val (ma, fp) = (r1.getDouble(0), r1.getDecimal(1))
      val aQ = aRaw.select(col("node_id"), round(col("raw") / lit(ma), 4).as("q"))
      val hRaw = edges
        .join(broadcast(aQ.select(col("node_id").as("dst"), col("q").as("qa"))), "dst")
        .groupBy("src")
        .agg(lsum(col("qa"), 6).as("raw"))
        .withColumnRenamed("src", "node_id")
        .localCheckpoint(eager = false).persist()
      val mh = hRaw.agg(max(col("raw"))).head().getDouble(0)
      (aRaw, hRaw, ma, mh, fp)
    }
    def drive(tag: String, f: DataFrame => (DataFrame, DataFrame, Double, Double, java.math.BigDecimal)): Unit = {
      var hubQ = hub0
      var rounds = 0
      var lastFp: java.math.BigDecimal = null
      var lastMa, lastMh = -1.0
      var converged = false
      var toUn: Seq[DataFrame] = Nil
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      while (!converged && rounds < 60) {
        val (aRaw, hRaw, ma, mh, fp) = f(hubQ)
        converged = lastFp != null && fp == lastFp && ma == lastMa && mh == lastMh
        hubQ = hRaw.select(col("node_id").as("src"),
          round(col("raw") / lit(mh), 4).as("qh"))
        toUn.foreach(_.unpersist())
        toUn = Seq(aRaw, hRaw)
        lastFp = fp; lastMa = ma; lastMh = mh
        rounds += 1
      }
      println(f"$tag: rounds=$rounds wall=${(System.nanoTime() - t0) / 1e9}%.2fs " +
        f"jobs=${jobs.get() - j0} converged=$converged ma=$lastMa mh=$lastMh fp=$lastFp")
      toUn.foreach(_.unpersist())
    }
    drive("warmup-2act", round2act)
    drive("2act", round2act)
    drive("1act", round1act)
    drive("bcast", roundBcast)
    drive("2act-again", round2act)
    drive("bcast-again", roundBcast)
    spark.stop()
  }
}
