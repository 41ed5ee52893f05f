package graft

import org.apache.spark.sql.SparkSession

/** Per-query scratch-cache drain (VERDICT r10 item 2).
  *
  * Many operators persist() intermediates that the LAZY DataFrame they
  * return still references (self-join sides, LSH band tables) — those
  * queries cannot unpersist at emission without forfeiting the cache,
  * so the library contract is: the CALLER drains after materializing a
  * query's result. `spark.catalog.clearCache()` alone is NOT a full
  * drain: the iterative fixpoint operators stage per-round state via
  * `localCheckpoint(eager = false).persist()`, and a localCheckpoint's
  * blocks live at the RDD level outside the SQL CacheManager — the
  * catalog call never sees them. A long-lived session running the full
  * 304-query map would accumulate one orphaned checkpoint block-set per
  * fixpoint query (loops unpersist every PRIOR round, but the FINAL
  * round's state backs the emitted DataFrame and must survive until the
  * caller's action). Draining both layers is what keeps
  * `sparkContext.getPersistentRDDs` bounded across a full Bench pass —
  * CacheHygieneSpec asserts exactly that.
  */
object CacheDrain {
  /** Release every cached Dataset AND every RDD-level persisted block
    * (localCheckpoint residue). Non-blocking: eviction proceeds async;
    * correctness never depends on it (all caches here are scratch —
    * lineage or checkpoint files can rebuild anything still referenced).
    */
  def drain(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
