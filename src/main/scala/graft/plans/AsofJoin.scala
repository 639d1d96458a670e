package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension tier #2: a native AS-OF JOIN — for every
  * left row, the single latest right row of the same key with
  * rightTime <= leftTime — as a first-class operator (logical node +
  * strategy + physical merge), the operator kdb (`aj`) and DuckDB
  * (`ASOF JOIN`) ship natively.
  *
  * Spark spellings and their costs:
  *  - range-condition join: nested loop, quadratic per key;
  *  - union+window (`EventsPipeline.joinAsof`): scale-correct (one
  *    shuffle) but every LEFT row rides through the window sort
  *    carrying the union's widened, mostly-null schema;
  *  - this exec: both sides co-partitioned on the key and sorted
  *    (key, time) — then ONE forward pass per partition with O(1)
  *    state (the current candidate row). Nothing is widened, nothing
  *    is re-scanned, right rows stream through exactly once.
  *
  * Distribution contract: the Column API co-partitions both sides with
  * an EXPLICIT numPartitions repartition (user-specified partitioning
  * disables AQE partition coalescing, which could otherwise coalesce
  * the two shuffles differently and break the 1:1 partition zip); the
  * exec itself declares only its sort requirement, which the planner
  * satisfies with SortExec on each side. A production version would
  * declare ClusteredDistribution pairs and join AQE's compatibility
  * protocol instead.
  *
  * Determinism: ties on rightTime resolve to the row latest in the
  * right sort order, so `rightTies` must make (key, time, ties) a
  * total order — same contract as the window spelling's ORDER BY.
  */
case class AsofJoinNode(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTies: Seq[Expression],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  // left-outer semantics: unmatched left rows keep nulls on the right
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

case class GraftAsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTies: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning = left.outputPartitioning

  /** Planner inserts the per-side sorts; co-partitioning is supplied by
    * the API's explicit repartition (see class doc). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTies)).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val outAttrs = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    // an empty side optimizes to a 0-partition RDD (PropagateEmpty
    // swallows the repartition) — zip would fail on unequal counts
    if (lRdd.getNumPartitions == 0) lRdd
    else if (rRdd.getNumPartitions == 0)
      lRdd.mapPartitions(lIter => GraftAsofJoinExec.merge(lIter, Iterator.empty, lOut, rOut,
        lk, rk, lt, rt, outAttrs), preservesPartitioning = true)
    else lRdd.zipPartitions(rRdd)((lIter, rIter) =>
      GraftAsofJoinExec.merge(lIter, rIter, lOut, rOut, lk, rk, lt, rt, outAttrs))
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): GraftAsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object GraftAsofJoinExec {
  /** The single-pass sorted merge. Lives on the companion so the task
    * closure captures only plain values, never the SparkPlan node. */
  private[plans] def merge(lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
      lOut: Seq[Attribute], rOut: Seq[Attribute],
      lk: Seq[Expression], rk: Seq[Expression], lt: Expression, rt: Expression,
      outAttrs: Seq[Attribute]): Iterator[InternalRow] = {
    {
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against NULLABLE right attrs: the unmatched-row nullRight
      // needs the projection's null checks, which codegen elides for
      // non-nullable inputs (zeros would leak instead of nulls)
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      // one-row lookahead over the right side (copied: unsafe rows are
      // reused buffers and the head outlives many left rows)
      var rHead: InternalRow = null
      var rHeadKey: InternalRow = null
      var rHeadTime: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next().copy()
          rHead = r; rHeadKey = rKeyProj(r).copy(); rHeadTime = rTimeProj(r).copy()
        } else { rHead = null; rHeadKey = null; rHeadTime = null }
      advanceRight()

      // candidate = latest right row seen with key == candidateKey
      var cand: InternalRow = null
      var candKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow)
        // drop right rows whose key sorts before the current left key
        while (rHead != null && keyOrd.compare(rHeadKey, lKey) < 0) advanceRight()
        // absorb right rows of THIS key with time <= left time; the
        // last absorbed (right sort order) is the as-of match
        while (rHead != null && keyOrd.compare(rHeadKey, lKey) == 0 &&
            timeOrd.compare(rHeadTime, lTime) <= 0) {
          cand = rHead; candKey = rHeadKey
          advanceRight()
        }
        val matched = cand != null && keyOrd.compare(candKey, lKey) == 0
        resultProj(joined(lRow, if (matched) cand else nullRight))
      }
    }
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(lk, rk, lt, rt, ties, l, r) =>
      GraftAsofJoinExec(lk, rk, lt, rt, ties, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public Column-API entry point. */
object AsofJoin {
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsofJoinStrategy

  /** Left as-of join: every `left` row + the latest `right` row with
    * equal keys and rightTime <= leftTime (nulls when none). `rightTies`
    * must complete a total order on the right side. Both sides are
    * co-partitioned on their keys with the session's shuffle
    * parallelism (explicit, so AQE cannot coalesce them apart). */
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTies: Seq[Column]): DataFrame = {
    val s = left.sparkSession
    install(s)
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val lp = left.repartition(n, leftKeys: _*)
    val rp = right.repartition(n, rightKeys: _*)
    Bridge.ofRows(s, AsofJoinNode(
      leftKeys.map(Bridge.expr), rightKeys.map(Bridge.expr),
      Bridge.expr(leftTime), Bridge.expr(rightTime),
      rightTies.map(Bridge.expr),
      lp.queryExecution.analyzed, rp.queryExecution.analyzed))
  }
}
