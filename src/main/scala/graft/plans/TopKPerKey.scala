package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Whole-operator custom plan: top-k rows per key WITHOUT a total sort.
  *
  * The declarative formulation — `row_number().over(partitionBy(keys)
  * .orderBy(o))` then `filter(rn <= k)` — plans as a full sort of every
  * partition (O(n log n) per key, all rows materialized through the sort)
  * just to throw away everything beyond rank k. This operator keeps a
  * bounded k-element heap per key (O(n log k), memory O(keys·k)) after the
  * same hash repartitioning — at 100 TB the sort's spill traffic is the
  * difference.
  *
  * Demonstrates the full custom-operator stack: logical node →
  * [[TopKStrategy]] (SparkStrategy) → [[TopKPerKeyExec]] (SparkPlan),
  * registered through `SparkSessionExtensions` ([[GraftExtensions]]).
  * The ordering must be total (add a unique tiebreaker) for deterministic
  * results.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // max-heap by sort order: head = worst retained row for the key
      val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top `k` rows per distinct value of `keys`, best-first by `orderBy`
    * (use `col(...).desc`/`.asc`; include a unique tiebreaker). Requires
    * [[TopKStrategy]] in the session (GraftExtensions or
    * `spark.experimental.extraStrategies`).
    */
  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    val keyExprs: Seq[Expression] = keys.map(n => Bridge.convertedExpression(spark, df(n)))
    val sortOrders = orderBy.map(c => Bridge.convertedExpression(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Bridge.ofRows(df.sparkSession, TopKPerKey(keyExprs, sortOrders, k,
      df.queryExecution.analyzed))
  }
}
