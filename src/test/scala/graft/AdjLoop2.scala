package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions
import graft.queries.Kc

/** Dev probe (round 11): BATCHED kmeans rounds — two Lloyd rounds per
  * driver action, round-2 centroids computed IN-PLAN from round-1's
  * aggregate (broadcast data, not driver literals), stationarity read
  * from in-plan diff counts so consecutive-round comparison stays
  * exact. Measures wall vs the 1-round-per-action shape. Throwaway.
  */
object AdjLoop2 {
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
    val K0 = 8
    // One Lloyd round from a centroid-set COLUMN source (literal or
    // in-plan 1-row aggregate): candidates unroll to K0 guarded slots.
    def assignFrom(csDf: DataFrame): DataFrame = {
      val cand = (1 to K0).map { i =>
        val c = element_at(col("cs"), i)
        when(lit(i) <= size(col("cs")),
          struct(
            round(col("ee") - lit(2.0) * call_function("graft_dot",
              col("embedding"), c.getField("cemb")) + c.getField("cc"), 6)
              .as("dist2"),
            c.getField("cid").as("cid")))
          .otherwise(struct(lit(Double.PositiveInfinity).as("dist2"),
            lit(Int.MaxValue).as("cid")))
      }
      emb.crossJoin(broadcast(csDf))
        .withColumn("ee",
          call_function("graft_dot", col("embedding"), col("embedding")))
        .withColumn("best", least(cand: _*))
        .select(col("best.cid").as("cid"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg(count(lit(1)).as("n_members"),
          (floor(sum(dec(round(col("v").cast("double"), 6))).cast("double")
            / count(lit(1)) * 1000000 + 0.5).cast("double") / 1000000.0)
            .as("centroid"))
    }
    // (cid, dim, centroid) table -> the 1-row (cs) centroid-set shape.
    def toCs(c: DataFrame): DataFrame = c
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("dim"),
        col("centroid").cast("float").as("v")))).as("dv"))
      .select(col("cid"), expr("transform(dv, x -> x.v)").as("cemb"))
      .withColumn("cc", expr(
        "aggregate(cemb, 0d, (acc, x) -> acc + cast(x as double) * cast(x as double))"))
      .agg(array_sort(collect_list(struct(col("cid"), col("cemb"),
        col("cc")))).as("cs"))
    def litCs(cents: Seq[(Int, Seq[Float])]): DataFrame =
      Seq(Tuple1(cents.sortBy(_._1).map { case (cid, ce) =>
        Kc(cid, ce, selfDot(ce)) })).toDF("cs")
    def diffCount(a: DataFrame, b: DataFrame): Column = lit(0) // unused
    var cents: Seq[(Int, Seq[Float])] = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1)))
    var rounds = 0
    var converged = false
    var stationary: Seq[(Int, Seq[Float])] = null
    val t0 = System.nanoTime()
    while (!converged && rounds < 40) {
      val w0 = System.nanoTime()
      val c1 = assignFrom(litCs(cents))
      val c2 = assignFrom(toCs(c1))
      // Literal table of the INPUT state quantized exactly as c1 emits
      // it (double, 1e-6 floor-half-up) — cents carries floats, so
      // rebuild the doubles from the floats' exact widening.
      val prevRows = cents.flatMap { case (cid, ce) =>
        ce.zipWithIndex.map { case (v, dim) => (cid, dim, v.toDouble) }
      }
      // NOTE: float->double widening is exact but c1's centroid was
      // double BEFORE the float cast, so compare on the FLOAT value.
      val prevDf = prevRows.toDF("cid", "dim", "pv")
      val d01 = c1.join(prevDf, Seq("cid", "dim"), "full")
        .filter(col("centroid").cast("float").cast("double") =!=
          col("pv") || col("centroid").isNull || col("pv").isNull)
        .agg(count(lit(1)).as("n")).select(lit(-1).as("tag"), col("n"))
      val d12 = c1.select(col("cid"), col("dim"), col("centroid").as("ca"))
        .join(c2.select(col("cid"), col("dim"), col("centroid").as("cb")),
          Seq("cid", "dim"), "full")
        .filter(col("ca") =!= col("cb") || col("ca").isNull || col("cb").isNull)
        .agg(count(lit(1)).as("n")).select(lit(-2).as("tag"), col("n"))
      val out = c2.select(col("cid"), col("dim"),
          col("centroid")).withColumn("tag", lit(0))
        .unionByName(d01.select(col("tag"), col("n").cast("double")
          .as("centroid")).withColumn("cid", lit(-1)).withColumn("dim", lit(-1))
          .select(col("cid"), col("dim"), col("centroid"), col("tag")))
        .unionByName(d12.select(col("tag"), col("n").cast("double")
          .as("centroid")).withColumn("cid", lit(-1)).withColumn("dim", lit(-1))
          .select(col("cid"), col("dim"), col("centroid"), col("tag")))
      val rows = out.collect()
      val w1 = System.nanoTime()
      val n01 = rows.find(_.getInt(3) == -1).get.getDouble(2)
      val n12 = rows.find(_.getInt(3) == -2).get.getDouble(2)
      val c2rows = rows.filter(_.getInt(3) == 0)
      println(f"batch at round $rounds: ${(w1 - w0) / 1e6}%6.1fms n01=$n01 n12=$n12")
      if (n01 == 0) { converged = true; stationary = cents; rounds += 1 }
      else {
        cents = c2rows.groupBy(_.getInt(0)).toSeq.map { case (cid, rs) =>
          (cid, rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq)
        }
        rounds += 2
        if (n12 == 0) { converged = true; stationary = cents }
      }
    }
    println(f"converged=$converged after $rounds rounds, " +
      f"total=${(System.nanoTime() - t0) / 1e9}%.2fs k=${stationary.size}")
    spark.stop()
  }
}
