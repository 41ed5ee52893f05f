package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratch: stage-level timings for dedup_ngram_jaccard (deleted
  * before round end).
  */
object DevNgram {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val t = 0.6
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DEV $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("lang"), col("source"),
      call_function("graft_trigrams", col("text")).as("tris")).persist()
    time("docs scan+trigrams")(docs.count())
    val tris = docs.select(col("doc_id"), col("lang"), col("source"),
      explode(col("tris")).as("tri"))
    time("exploded tris count")(println("tris=" + tris.count()))
    val dfreq = tris.groupBy("tri").agg(count(lit(1)).as("df"))
    val sizes = docs.select(col("doc_id").as("sz_id"), size(col("tris")).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(asc("df"), asc("tri"))
    val prefix = tris.join(dfreq, "tri")
      .withColumn("rn", row_number().over(w))
      .join(broadcast(sizes), col("doc_id") === col("sz_id"))
      .filter(col("rn") <= floor(col("n") * (1 - t) + 1e-7) + 1)
      .select(col("doc_id"), col("lang"), col("source"), col("tri"), col("n"), col("rn"))
      .persist()
    time("prefix build")(println("prefix rows=" + prefix.count()))
    val candRaw = prefix.alias("a").join(prefix.alias("b"),
      col("a.tri") === col("b.tri") && col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
    time("cand join raw")(println("raw cand rows=" + candRaw.count()))
    val candPruned = prefix.alias("a").join(prefix.alias("b"),
      col("a.tri") === col("b.tri") && col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")) >= greatest(col("a.n"), col("b.n")) * t &&
        lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >=
          ceil((col("a.n") + col("b.n")) * (t / (1 + t)) - 1e-9))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(max(col("a.n")).as("n_a"), max(col("b.n")).as("n_b"))
    val cp = candPruned.persist()
    time("cand pruned+grouped")(println("cand pairs=" + cp.count()))
    val sideA = docs.select(col("doc_id").as("id_a"), sort_array(col("tris")).as("tris_a"))
    val sideB = docs.select(col("doc_id").as("id_b"), sort_array(col("tris")).as("tris_b"))
    val verified = cp.join(sideA, "id_a").join(sideB, "id_b")
      .withColumn("n_i", call_function("graft_intersect_size", col("tris_a"), col("tris_b")))
      .withColumn("jac", col("n_i").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("n_i")))
      .filter(col("jac") >= t)
    time("verify")(println("verified=" + verified.count()))
    spark.stop()
  }
}
