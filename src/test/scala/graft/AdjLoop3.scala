package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions
import graft.queries.Kc

/** Dev probe (round 11): kmeans round cost variants. Throwaway. */
object AdjLoop3 {
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
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    emb.count()
    def selfDot(v: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      acc
    }
    def dec(c: Column) = c.cast(DecimalType(28, 9))
    var cents: Seq[(Int, Seq[Float])] = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1)))
    def csDf = Seq(Tuple1(cents.sortBy(_._1).map { case (cid, ce) =>
      Kc(cid, ce, selfDot(ce)) })).toDF("cs")
    def mapSide: DataFrame = {
      val cand = (1 to cents.size).map { i =>
        val c = element_at(col("cs"), i)
        struct(
          round(col("ee") - lit(2.0) * call_function("graft_dot",
            col("embedding"), c.getField("cemb")) + c.getField("cc"), 6)
            .as("dist2"),
          c.getField("cid").as("cid"))
      }
      emb.crossJoin(broadcast(csDf))
        .withColumn("ee",
          call_function("graft_dot", col("embedding"), col("embedding")))
        .withColumn("best", least(cand: _*))
        .select(col("best.cid").as("cid"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
    }
    def aggDec(m: DataFrame): DataFrame = m
      .groupBy("cid", "dim")
      .agg(count(lit(1)).as("n_members"),
        (floor(sum(dec(round(col("v").cast("double"), 6))).cast("double")
          / count(lit(1)) * 1000000 + 0.5).cast("double") / 1000000.0)
          .as("centroid"))
    def aggLong(m: DataFrame): DataFrame = m
      .groupBy("cid", "dim")
      .agg(count(lit(1)).as("n_members"),
        (floor(sum(round(round(col("v").cast("double"), 6) * 1000000)
          .cast("long")).cast("double") / lit(1000000.0)
          / count(lit(1)) * 1000000 + 0.5).cast("double") / 1000000.0)
          .as("centroid"))
    def time(tag: String)(f: => Seq[org.apache.spark.sql.Row]): Unit = {
      var last: Seq[org.apache.spark.sql.Row] = null
      for (r <- 1 to 6) {
        val t0 = System.nanoTime()
        last = f
        println(f"$tag rep$r: ${(System.nanoTime() - t0) / 1e6}%6.1fms")
      }
      val m = last.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
      println(s"$tag fingerprint: ${m.toSeq.sorted.hashCode}")
    }
    time("dec AQE-on")  { aggDec(mapSide).collect().toSeq }
    time("long AQE-on") { aggLong(mapSide).collect().toSeq }
    time("long rep1 AQE-on") { aggLong(mapSide.repartition(1, col("cid"), col("dim"))).collect().toSeq }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("long AQE-off") { aggLong(mapSide).collect().toSeq }
    time("long rep1 AQE-off") { aggLong(mapSide.repartition(1, col("cid"), col("dim"))).collect().toSeq }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
