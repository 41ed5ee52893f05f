package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cache-hygiene gate (VERDICT r10 item 2): an operator library must
  * not leak the cache across a long-lived session. Two layers can leak:
  *
  *  - SQL CacheManager entries from `df.persist()` — released by
  *    `spark.catalog.clearCache()`;
  *  - RDD-level blocks from `localCheckpoint(eager = false).persist()`
  *    (the fixpoint loops' per-round state) — INVISIBLE to the catalog
  *    call; only `sparkContext.getPersistentRDDs` sees them.
  *
  * The contract under test: after `CacheDrain.drain` (what Bench,
  * Verify, and Prof run between queries), BOTH layers are empty — so a
  * full Bench pass holds at most one query's scratch blocks at a time
  * (bounded), never an accumulating pool. The query set below is the
  * persist-heavy tier: every fixpoint loop (checkpoint residue), the
  * documented lazy-return cachers (tfidf, minhash, clusters), and the
  * BPE loops the r10 ADVICE flagged for a leaked `prevWords`.
  *
  * A second assert pins the WITHIN-query discipline: loop operators
  * unpersist every superseded round, so even BEFORE the drain the live
  * block-set stays small, not O(rounds). The asserted bound is 16 RDDs:
  * the structural budget is ~8 (final state + the static tables the
  * emission still references), doubled because unpersist(blocking =
  * false) lets a few just-released stragglers linger in
  * getPersistentRDDs for a beat — the gate bounds the pool, it does
  * not time the async eviction.
  */
class CacheHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")

  private val heavyCachers = Seq(
    "graph_pagerank_converged", "graph_hits_converged",
    "sim_kmeans_converged", "feat_pca_power_converged",
    "bpe_train_loop", "bpe_encode",
    "dedup_clusters", "dedup_minhash", "text_tfidf",
    "graph_label_prop", "graph_k_core",
    "graph_louvain_converged", "sim_pq_train_converged", "sim_pq_adc")

  test("drain leaves zero persisted blocks after every persist-heavy query") {
    for (name <- heavyCachers) {
      SparkEntry.queries(name)(spark, sf).count()
      // Within-query discipline: superseded rounds were unpersisted as
      // the loop ran; only the final state + emission-referenced
      // statics may remain (plus async-unpersist stragglers).
      // DataFrame.unpersist is non-blocking: frames a loop released in
      // its last rounds may still be REGISTERED here. The bound only
      // needs to separate "final state + statics (+ async-release
      // stragglers)" from O(rounds) stacking (a stacking loop would
      // show 30+).
      val live = spark.sparkContext.getPersistentRDDs.size
      assert(live <= 16,
        s"$name left $live persisted RDDs before the drain — a loop is " +
          "stacking per-round state instead of unpersisting it")
      CacheDrain.drain(spark)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$name: blocks survive CacheDrain.drain — the Bench/Verify " +
          "per-query drain would accumulate them across a full pass")
    }
  }

  test("artifact scratch parquet stays bounded across repeated consumption") {
    // VERDICT r12 item 3: the block-manager drain above says nothing
    // about the DISK layer — ArtifactMemo.cachedTable and the Louvain
    // label tables write scratch parquet dirs. The single-flight memo
    // must mint each artifact's dir ONCE: re-running every artifact
    // consumer may not grow the app's scratch-dir count (a regression
    // to per-invocation writes would double it here). Eviction of a
    // superseded fingerprint deleting its dir is gated separately in
    // ArtifactMemoSpec.
    def artDirs: Int = Option(
      new java.io.File(System.getProperty("java.io.tmpdir")).listFiles())
      .getOrElse(Array.empty)
      .count(f => f.getName.startsWith("graft_art") &&
        f.getName.endsWith(spark.sparkContext.applicationId))
    val consumers = Seq("graph_pagerank_converged", "graph_hits_converged",
      "graph_louvain_converged", "graph_community_conductance",
      "feat_pca_project", "graph_louvain_full")
    consumers.foreach(n => { SparkEntry.queries(n)(spark, sf).count(): Unit
      CacheDrain.drain(spark) })
    val after1 = artDirs
    assert(after1 > 0, "expected at least one scratch artifact dir")
    consumers.foreach(n => { SparkEntry.queries(n)(spark, sf).count(): Unit
      CacheDrain.drain(spark) })
    assert(artDirs === after1,
      s"re-consumption minted new scratch dirs ($after1 -> $artDirs) — " +
        "the single-flight memo is not being hit")
  }
}
