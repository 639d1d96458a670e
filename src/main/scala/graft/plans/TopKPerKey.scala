package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension tier (SURVEY §7.3 ladder, step c): top-k
  * rows per key as a FIRST-CLASS operator — logical node, planner
  * strategy, and a two-phase physical exec — instead of the
  * window-function spelling
  *
  *   row_number() OVER (PARTITION BY key ORDER BY ...) <= k
  *
  * which shuffles EVERY row of every key and then sorts each partition
  * in full. The custom plan keeps a bounded heap of k rows per key:
  *
  *   GraftTopKExec(partial) — map-side, caps each input partition's
  *     contribution at k rows per key BEFORE the exchange, the
  *     top-k analogue of a partial aggregation;
  *   Exchange hashpartitioning(keys) — planner-inserted via
  *     requiredChildDistribution, shuffles ≤ k·partitions rows per key;
  *   GraftTopKExec(final) — reduce-side, merges to the exact top k.
  *
  * At 100 TB this is the difference between shuffling the corpus and
  * shuffling k rows per key per map task. The ORDER must be total
  * (include a unique tiebreaker) for the emitted SET to be
  * deterministic; output order within a key is unspecified, like any
  * unsorted Spark operator.
  */
case class TopKPerKeyNode(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(keys.nonEmpty, "top-k per key needs at least one key")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical bounded-heap top-k; `partial` controls whether the planner
  * must co-locate keys first (exactly like partial vs final HashAggregate). */
case class GraftTopKExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (kL, keysL, orderL, out) = (k, keys, order, child.output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysL, out)
      val ord = RowOrdering.create(orderL, out)
      // eviction heap: head = WORST retained row under the requested order
      val evict: java.util.Comparator[InternalRow] = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kL + 1, evict)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kL) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKExec =
    copy(child = newChild)
}

/** Planner strategy: one logical node → partial + exchange + final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      GraftTopKExec(k, keys, order, partial = false,
        GraftTopKExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public Column-API entry point. */
object TopK {
  private def sortOrderOf(c: Column): SortOrder = Bridge.expr(c) match {
    case so: SortOrder => so
    case e             => SortOrder(e, Ascending)
  }

  /** Ensure the strategy is installed on a live session (idempotent). */
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(TopKStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ TopKStrategy

  /** Top `k` rows per `keys` group under `order` (order must include a
    * unique tiebreaker for a deterministic result set). */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    install(df.sparkSession)
    Bridge.ofRows(df.sparkSession,
      TopKPerKeyNode(k, keys.map(Bridge.expr), order.map(sortOrderOf),
        df.queryExecution.analyzed))
  }
}
