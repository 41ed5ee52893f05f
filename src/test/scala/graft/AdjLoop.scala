package graft
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions
import graft.queries.Kc

/** NOTE: the Adj* probe mains live in TEST scope (r11 ADVICE) — they
  * are measurement harnesses with hardcoded testdata paths whose
  * conclusions are recorded in BASELINE.md/SCALING.md; test scope keeps
  * them compiling (no rot) without shipping them in the production
  * artifact. Run via `sbt "Test/runMain graft.AdjLoop"`.
  *
  * Dev probe (round 11): where does a fixpoint round's ~350 ms go?
  * Replicates sim_kmeans_converged's round with the cost split into
  * plan-build / analysis+optimization / execution, and counts
  * jobs/tasks per round. Throwaway.
  */
object AdjLoop {
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
    val jobs = new AtomicLong(0); val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(): Unit }
    })
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    emb.count()
    def selfDot(v: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      acc
    }
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(28, 9))
    def assignRecompute(cents: Seq[(Int, Seq[Float])]): DataFrame = {
      val csDf = Seq(Tuple1(cents.sortBy(_._1).map { case (cid, ce) =>
        Kc(cid, ce, selfDot(ce)) })).toDF("cs")
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
        .groupBy("cid", "dim")
        .agg(count(lit(1)).as("n_members"),
          (floor(sum(dec(round(col("v").cast("double"), 6))).cast("double")
            / count(lit(1)) * 1000000 + 0.5).cast("double") / 1000000.0)
            .as("centroid"))
    }
    var cents: Seq[(Int, Seq[Float])] = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1)))
    var prev: Map[(Int, Int), Double] = null
    var rounds = 0
    var converged = false
    while (!converged && rounds < 40) {
      val j0 = jobs.get(); val t0 = tasks.get()
      val w0 = System.nanoTime()
      val df = assignRecompute(cents)
      val w1 = System.nanoTime() // plan-build (DSL) done
      df.queryExecution.executedPlan // force analysis+optimization
      val w2 = System.nanoTime()
      val rows = df.collect()
      val w3 = System.nanoTime()
      println(f"round $rounds%2d build=${(w1 - w0) / 1e6}%6.1fms " +
        f"optimize=${(w2 - w1) / 1e6}%6.1fms exec=${(w3 - w2) / 1e6}%6.1fms " +
        f"jobs=${jobs.get() - j0} tasks=${tasks.get() - t0}")
      val cur = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
      converged = prev != null && cur == prev
      prev = cur
      cents = rows.groupBy(_.getInt(0)).toSeq.map { case (cid, rs) =>
        (cid, rs.sortBy(_.getInt(1)).map(_.getDouble(3).toFloat).toSeq)
      }
      rounds += 1
    }
    println(s"converged after $rounds rounds")
    spark.stop()
  }
}
