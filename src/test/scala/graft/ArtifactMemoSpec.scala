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

  test("training is single-flight: concurrent same-key callers train once") {
    // ADVICE r12 (medium): getOrElseUpdate could evaluate the by-name
    // train block in several threads, each racing a mode(overwrite)
    // write to the same scratch path. The Holder/lazy-val design must
    // run the block exactly once with losers blocking on the winner.
    val trains = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = s"specflight#${System.nanoTime()}#sf"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            ArtifactMemo.cachedTable(spark, key) {
              trains.incrementAndGet()
              Thread.sleep(200) // widen the race window
              spark.range(50).toDF("x")
            }.count()
        })
      }
      futs.foreach(f => assert(f.get() === 50L))
      assert(trains.get() === 1,
        s"train block ran ${trains.get()} times under 8-way contention")
    } finally pool.shutdown()
  }

  test("a superseded fingerprint is evicted and its scratch parquet deleted") {
    // ADVICE r12 (low): in-place dataset regeneration previously
    // stranded the old key's entry and scratch dir until JVM exit.
    // Same eviction group (path#variant), different fingerprint ⇒ the
    // old entry drops and its directory is deleted eagerly.
    val tag = System.nanoTime()
    val k1 = s"/specds$tag#fp1#gc"
    val k2 = s"/specds$tag#fp2#gc"
    def scratchDir(key: String) = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_art${Tables.md5hex(key).take(16)}" +
        s"_${key.hashCode.toHexString}_${spark.sparkContext.applicationId}")
    var trains = 0
    def train = { trains += 1; spark.range(10).toDF("x") }
    ArtifactMemo.cachedTable(spark, k1)(train).count()
    assert(scratchDir(k1).isDirectory, "first artifact dir must exist")
    ArtifactMemo.cachedTable(spark, k2)(train).count()
    assert(!scratchDir(k1).exists(),
      "superseded fingerprint's scratch dir must be deleted eagerly")
    assert(scratchDir(k2).isDirectory, "successor artifact dir must exist")
    assert(trains === 2)
    // The evicted key is OUT of the memo: re-consuming it retrains
    // (fresh holder) rather than reading the deleted path.
    ArtifactMemo.cachedTable(spark, k1)(train).count()
    assert(trains === 3, "evicted key must retrain on next use")
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
