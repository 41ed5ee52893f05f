package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via min-label propagation with pointer
  * doubling — the shared fixpoint behind dedup_clusters /
  * pipeline_dedup_corpus (text near-dup graphs) and pipeline_mm_dedup
  * (perceptual-hash graphs). Extracted round 14 so the mm survivor
  * pipeline provably rides the identical schedule the text CC keys
  * have been oracle-green on since round 8.
  *
  * Scale design (unchanged from the TextPipeline original):
  *
  * - Both edge directions come from ONE pass over the pair frame: a
  *   union of the pair query with its swap re-executes the whole
  *   upstream subtree per branch (measured ~2× the pair-join cost);
  *   explode emits (a,b) and (b,a) from each row instead.
  * - localCheckpoint each round: the round-k plan references the
  *   round-(k−1) frame several times (edges side, jump side, union),
  *   so without lineage truncation the logical tree — which Catalyst
  *   re-analyzes in full even when caches cover execution — grows
  *   exponentially with rounds (measured: 136 s at sf0.01 from
  *   analysis alone). eager=false folds materialization into the
  *   convergence aggregate's job — one Spark job per round.
  * - checkpoint-then-persist: the persisted InMemoryRelation reports
  *   accurate size stats once the convergence aggregate materializes
  *   it, so Catalyst auto-broadcasts the (small) label table into the
  *   next round's joins. No forced broadcast() hint: if the label
  *   table ever outgrows the threshold (billions of near-dup nodes),
  *   the joins degrade to shuffles on their own.
  * - Labels only ever DECREASE, so the label sum is strictly monotone
  *   until the fixpoint — convergence is one tiny aggregate per round
  *   instead of a join-and-count against the previous round.
  * - One pointer-doubling composition per round (label(label)) halves
  *   chain depth: 30 rounds covers component diameter 2^30.
  */
object Cc {

  /** Min-label connected components over an UNDIRECTED pair frame
    * (columns id_a, id_b; each pair listed once). Returns a PERSISTED
    * (id, label) frame covering every node that appears in some pair
    * — label = min node id reachable. Isolated nodes (no pairs) are
    * absent; callers that need them coalesce to the node's own id.
    * Throws if propagation has not converged after 30 rounds.
    */
  def minLabel(pairs: DataFrame, what: String): DataFrame = {
    val edges = pairs
      .select(explode(array(
        struct(col("id_a"), col("id_b")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b")))).as("e"))
      .select(col("e.id_a").as("id_a"), col("e.id_b").as("id_b"))
      .persist() // joined every propagation round
    // Init already performs round 1 (min of self and direct
    // neighbors) — the groupBy that would otherwise just distinct the
    // node ids computes the neighbor min for free, saving one full
    // propagation round of fixed job overhead.
    var labels = edges.groupBy(col("id_a").as("id"))
      .agg(min(col("id_b")).as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("label"))
      .localCheckpoint(eager = false)
      .persist()
    // coalesce: sum over zero rows is NULL — an input with no pairs
    // must yield an empty result, not an NPE.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 30) {
      val viaEdges = labels
        .join(edges, col("id") === col("id_a"))
        .select(col("id_b").as("id"), col("label"))
      // label(label): labels always point at real node ids (min over
      // ids in the component so far), so the self-join is total.
      val jmap = labels.select(col("id").as("jid"), col("label").as("jlabel"))
      val viaJump = labels.join(jmap, col("label") === col("jid"))
        .select(col("id"), col("jlabel").as("label"))
      val next = viaEdges.unionByName(viaJump).unionByName(labels)
        .groupBy("id")
        .agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
        .persist()
      val s2 = labelSum(next) // materializes the cache → stats for k+1
      converged = s2 == prevSum
      prevSum = s2
      labels.unpersist()
      labels = next
      rounds += 1
    }
    // An unconverged fixpoint must fail loudly: a partial propagation
    // would emit labels that are upper bounds, i.e. a WRONG (split)
    // clustering, and only the gate harness's hash — not a standalone
    // caller — would notice.
    require(converged,
      s"$what: min-label propagation did not converge in $rounds rounds" +
        " — emission would be a partial (split) clustering")
    edges.unpersist()
    labels
  }
}
