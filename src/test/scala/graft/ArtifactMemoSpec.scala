package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the once-per-dataset trained-artifact machinery
  * (ArtifactMemo + Tables.artifactKey) that the whole convergence
  * family now rides (r11 PQ finding lineage: a memo without content
  * keying silently re-seeds from stale artifacts).
  */
class ArtifactMemoSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("cached() trains exactly once per key and re-emits identical rows") {
    var trains = 0
    val key = s"spec#${System.nanoTime()}"
    def train = { trains += 1; spark.range(5).toDF("x") }
    val a = ArtifactMemo.cached(spark, key)(train).collect()
    val b = ArtifactMemo.cached(spark, key)(train).collect()
    assert(trains === 1, "second invocation must re-emit, not retrain")
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
  }

  test("artifactKey changes when the backing parquet is regenerated in-place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_spec")
      .toFile.getAbsolutePath
    spark.range(3).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val k1 = Tables.artifactKey(dir, "t")
    // In-place regeneration (the r11 ADVICE scenario: refreshed
    // fixtures under the SAME path). Spark part-file names carry a
    // fresh UUID per write, so the content fingerprint must move even
    // if sizes coincided.
    spark.range(4).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val k2 = Tables.artifactKey(dir, "t")
    assert(k1 !== k2, "regenerated parquet must miss the memo (retrain)")
  }

  test("the structural-bound require trips loudly on oversized emissions") {
    val e = intercept[IllegalArgumentException] {
      ArtifactMemo.cached(spark, s"spec-big#${System.nanoTime()}")(
        spark.range(10001).toDF("x"))
    }
    assert(e.getMessage.contains("structurally-bounded"))
  }

  test("cachedTable persists once and re-reads the parquet artifact") {
    var trains = 0
    val key = s"spec-table#${System.nanoTime()}"
    def train = { trains += 1; spark.range(100).toDF("x") }
    val a = ArtifactMemo.cachedTable(spark, key)(train)
      .agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0)
    val b = ArtifactMemo.cachedTable(spark, key)(train)
      .agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0)
    assert(trains === 1, "second consumption must re-read, not retrain")
    assert(a === b && a === 4950L)
  }
}
