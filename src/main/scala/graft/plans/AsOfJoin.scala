package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.OfRows
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class operator: LogicalPlan node → planner
  * Strategy → sort-merge SparkPlan (SURVEY.md §4b escalation path (c);
  * the union-and-window form in Joins.`join_asof` composes built-ins,
  * this is the whole-operator expression of the same semantics).
  *
  * Semantics: for every left row, attach the LAST right row of the same
  * key whose time ≤ the left row's time (nulls when none). Keys and
  * times must be LongType; ties inside one (key, time) pair take the
  * right row latest in sort order — pass a disambiguated time (e.g.
  * epoch µs) when exact tie behavior matters.
  *
  * Scale shape: identical to a sort-merge join — children are
  * hash-clustered on the key and sorted (key, time); the merge itself is
  * a single forward pass per partition, O(n+m), no buffering beyond one
  * candidate row. This is the plan you want when both sides are 100 TB:
  * one shuffle each side, no window state over whole partitions.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinNode =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-clustered on the key (EnsureRequirements co-aligns
    * the two HashPartitionings exactly as it does for a sort-merge join).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rightArity = right.output.size
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      // Operators downstream (exchanges, sorts) require UnsafeRow.
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      new Iterator[InternalRow] {
        private var rNext: InternalRow = advanceRight()
        private var lastMatch: InternalRow = _
        private var lastMatchKey: Long = _
        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyB.eval(l).asInstanceOf[Long]
          val t = lTimeB.eval(l).asInstanceOf[Long]
          var continue = rNext != null
          while (continue) {
            val rk = rKeyB.eval(rNext).asInstanceOf[Long]
            if (rk < k || (rk == k && rTimeB.eval(rNext).asInstanceOf[Long] <= t)) {
              if (rk == k) { // candidate: last one before advancing wins
                lastMatch = rNext.copy()
                lastMatchKey = rk
              }
              rNext = advanceRight()
              continue = rNext != null
            } else continue = false
          }
          val m = if (lastMatch != null && lastMatchKey == k) lastMatch else nullRight
          toUnsafe(joined(l, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Public API: `AsOfJoin(left, "key", "time", right, "key", "time")`. */
object AsOfJoin {
  def apply(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asof join: no column '$n'"))
    def longAttr(p: LogicalPlan, n: String): Attribute = {
      val a = attr(p, n)
      require(a.dataType == LongType, s"asof join: '$n' must be LongType, is ${a.dataType}")
      a
    }
    OfRows(spark, AsOfJoinNode(lp, rp,
      longAttr(lp, leftKey), longAttr(rp, rightKey),
      longAttr(lp, leftTime), longAttr(rp, rightTime)))
  }
}
