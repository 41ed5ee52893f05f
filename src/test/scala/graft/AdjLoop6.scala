package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe (round 11): louvain sweep moved-count trajectory +
  * alternating-parity dampener. Throwaway. */
object AdjLoop6 {
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
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val parity = args.length > 1 && args(1) == "parity"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val op = li.filter(col("l_partkey") % 3 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val und = op.as("x").join(op.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("u"), col("y.p").as("v")).distinct()
      .persist()
    val adj = und.select(col("u").as("i"), col("v").as("j"))
      .unionByName(und.select(col("v").as("i"), col("u").as("j")))
      .localCheckpoint(eager = false).persist()
    val deg = adj.groupBy("i").agg(count(lit(1)).as("ki"))
      .localCheckpoint(eager = false).persist()
    val m = und.agg(count(lit(1))).head().getLong(0)
    def sweep(lab: DataFrame, rnd: Int): DataFrame = {
      val kin = adj.join(lab.select(col("i").as("j"), col("c")), "j")
        .groupBy("i", "c").agg(count(lit(1)).as("kin"))
      val stay = deg.join(lab, "i")
        .select(col("i"), col("c"), lit(0L).as("kin"))
      val cand = kin.unionByName(stay)
        .groupBy("i", "c").agg(max(col("kin")).as("kin"))
      val ktot = deg.join(lab, "i")
        .groupBy("c").agg(sum(col("ki")).as("ktot"))
      val w = Window.partitionBy("i").orderBy(col("gain").desc, col("c"))
      val best = cand.join(ktot, "c").join(deg, "i")
        .join(lab.select(col("i"), col("c").as("c0")), "i")
        .withColumn("sigma", col("ktot") -
          when(col("c") === col("c0"), col("ki")).otherwise(lit(0L)))
        .withColumn("gain", round(
          col("kin").cast(DoubleType) / lit(m.toDouble) -
            col("ki").cast(DoubleType) * col("sigma").cast(DoubleType) /
              (lit(2.0) * lit(m.toDouble) * lit(m.toDouble)), 9))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      if (parity)
        best.select(col("i"),
          when(pmod(col("i"), lit(2)) === lit(rnd % 2), col("c"))
            .otherwise(col("c0")).as("cnew"), col("c0"))
      else best.select(col("i"), col("c").as("cnew"), col("c0"))
    }
    var curBase = deg.select(col("i"), pmod(col("i"), lit(64)).as("c"))
      .localCheckpoint(eager = false).persist()
    var cur: DataFrame = curBase
    var rounds = 0
    var converged = false
    while (!converged && rounds < 25) {
      val nxt = sweep(cur, rounds).localCheckpoint(eager = false).persist()
      val moved = nxt.filter(col("cnew") =!= col("c0"))
        .agg(count(lit(1))).head().getLong(0)
      val labn = nxt.select(col("i"), col("cnew").as("c"))
      val dCq = deg.join(labn, "i").groupBy("c").agg(sum(col("ki")).as("d_c"))
      val eCq = und
        .join(labn.select(col("i").as("u"), col("c").as("lu")), "u")
        .join(labn.select(col("i").as("v"), col("c").as("lv")), "v")
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("c")).agg(count(lit(1)).as("e_c"))
      val q = dCq.join(eCq, Seq("c"), "left")
        .select(round(coalesce(col("e_c"), lit(0L)).cast(DoubleType) / lit(m.toDouble) -
          (col("d_c").cast(DoubleType) / lit(2.0 * m)) *
            (col("d_c").cast(DoubleType) / lit(2.0 * m)), 9).as("term"))
        .agg(round(sum(col("term").cast(DecimalType(28, 9))).cast(DoubleType), 6))
        .head().getDouble(0)
      println(s"round $rounds moved=$moved q=$q")
      converged = moved == 0L && (!parity || rounds > 0)
      curBase.unpersist(); curBase = nxt
      cur = nxt.select(col("i"), col("cnew").as("c"))
      rounds += 1
    }
    println(s"converged=$converged rounds=$rounds")
    spark.stop()
  }
}
