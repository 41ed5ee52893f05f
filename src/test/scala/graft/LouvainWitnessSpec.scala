package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Three-level witness for graph_louvain_full (VERDICT r12 item 5):
  * the outer loop's label-composition path past level 2 and the stop
  * rule at depth were previously exercised only under the cap-require.
  * The fixture (AdjLouvainWitness.edges — the tuning probe and this
  * gate share one generator) is a planted hierarchy built around the
  * MEASURED synchronous-sweep dynamics:
  *
  *  - 27 K6 "mids" whose 6 members share one residue class mod 64, so
  *    the fine loop's hash seeding starts AT the mids and phase 1
  *    emits them unchanged (level 1) — no single node can leave a K6
  *    (stay kin 5 beats every per-foreign-mid kin, capped ≤ 4 by the
  *    even edge spread);
  *  - per gadget (3 disconnected gadgets of 9 mids), 3 triangles of
  *    mids with asymmetric weights (20, 24, 16): a synchronous sweep
  *    provably merges the WEAK pair of a 3-cycle (both endpoints point
  *    at the shared apex) and then stalls in a label-chase that leaves
  *    the sets fixed — so level 2 contracts each triangle to
  *    {M1, M3} + {M2} (probed: exactly this, Q up);
  *  - a second asymmetric 3-cycle (68, 76, 60) planted between the
  *    level-2 PAIR supernodes of the three triangles (spread evenly
  *    over their 4 underlying mid-pairs, each planted mid-pair weight
  *    kept below the intra-triangle minimum so level-2 argmaxes are
  *    undisturbed) — level 3 merges its weak pair the same way;
  *  - the level-4 sweep's simultaneous moves then only produce
  *    zero-internal-weight regroupings: Q cannot improve, the ladder
  *    dips at sweep 1, and the outer loop stops with improving=false.
  *
  * Done-when (VERDICT): levels == 3 asserted by a gate, the coarsen
  * invariant require()d by the operator green at every level (a
  * violation would throw, failing this test), and the composed
  * fine-node → final-community map emitted for all 162 nodes.
  */
class LouvainWitnessSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("ERROR")

  test("graph_louvain_full contracts exactly 3 levels on the planted hierarchy") {
    val dir = AdjLouvainWitness.writeFixture(spark)
    val out = SparkEntry.queries("graph_louvain_full")(spark, dir)
      .select("node_id", "cid", "levels").collect()
    assert(out.length === 162, s"expected 162 fine nodes, got ${out.length}")
    val levels = out.map(_.getLong(2)).distinct.toSeq
    assert(levels === Seq(3L),
      s"planted hierarchy must contract exactly 3 levels, got $levels")

    val lab = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Mids never split: the label composed down 3 levels is constant
    // across each seeded K6 (a composition slip past level 2 would
    // scatter exactly these).
    for (j <- 0 until 27) {
      val cids = AdjLouvainWitness.midNodes(j).map(lab).distinct
      assert(cids.length === 1, s"mid $j split across communities: $cids")
    }
    // Gadgets are disconnected: no community crosses one.
    val gadgetOf = (0 until 27).map(j => j -> j / 9).toMap
    val byCid = out.groupBy(_.getLong(1))
    byCid.foreach { case (cid, rows) =>
      val gs = rows.map(r => gadgetOf((r.getLong(0) / 10 - 1).toInt % 32))
        .distinct
      assert(gs.length === 1, s"community $cid crosses gadgets $gs")
    }
    // The probed fixpoint: 9 communities (3 per gadget).
    assert(byCid.size === 9,
      s"expected the probed 9-community fixpoint, got ${byCid.size}")
  }
}
