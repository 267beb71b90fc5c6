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
  * Memory bound: the retained set is O(distinct-keys-per-partition × k)
  * rows. When it crosses `graft.topk.spillThreshold` rows (default 4M),
  * the exec flattens the heaps to a local spill file and continues; at
  * end-of-input the spilled runs are re-merged through the same bounded-heap
  * pass (each run's retained set is a superset of the global top-k for its
  * keys, so the merge is exact). Peak memory is therefore
  * min(keys·k, threshold) rows during the scan plus the partition's final
  * output during the merge. If the *output* itself (keys·k) cannot fit in
  * memory, use the window/sort formulation instead — that is the regime
  * where an external sort wins.
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
    val nFields = childOutput.length
    val spillThreshold = conf.getConfString("graft.topk.spillThreshold", "4194304").toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection guaranteeing UnsafeRow (spillable byte layout)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // max-heap by sort order: head = worst retained row for the key
      val heapOrd: Ordering[UnsafeRow] = (a, b) => ord.compare(a, b)
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      var retained = 0L
      val spillFiles = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => spillFiles.foreach(_.delete()))

      // `owned`: row is already a private UnsafeRow copy (spill readback)
      def offer(row: UnsafeRow, owned: Boolean): Unit = {
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) {
              h.enqueue(if (owned) row else row.copy()); retained += 1
            } else if (ord.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(if (owned) row else row.copy())
            }
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            h.enqueue(if (owned) row else row.copy())
            heaps.put(key.copy(), h)
            retained += 1
        }
      }

      def spill(): Unit = {
        // task-local scratch space (spark.local.dir), not the JVM tmpdir —
        // /tmp is typically a small root/tmpfs partition on YARN/K8s nodes
        val f = Bridge.localSpillFile("graft-topk-spill")
        spillFiles += f
        val out = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16))
        val buf = new Array[Byte](1 << 12)
        try {
          heaps.valuesIterator.foreach(_.foreach { r =>
            out.writeInt(r.getSizeInBytes)
            r.writeToStream(out, buf)
          })
        } finally out.close()
        heaps.clear()
        retained = 0L
      }

      def readSpill(f: java.io.File): Iterator[UnsafeRow] = {
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16))
        new Iterator[UnsafeRow] {
          private var nextSize = try in.readInt() catch { case _: java.io.EOFException => in.close(); -1 }
          override def hasNext: Boolean = nextSize >= 0
          override def next(): UnsafeRow = {
            val bytes = new Array[Byte](nextSize)
            in.readFully(bytes)
            val r = new UnsafeRow(nFields)
            r.pointTo(bytes, nextSize)
            nextSize = try in.readInt() catch { case _: java.io.EOFException => in.close(); -1 }
            r
          }
        }
      }

      iter.foreach { row =>
        offer(rowProj(row), owned = false)
        if (retained >= spillThreshold) spill()
      }
      // merge: each spilled run already holds ≤k rows per key, a superset of
      // the global per-key top-k, so re-offering them is exact. The merged
      // retained set is exactly this partition's output (keys·k rows).
      spillFiles.toSeq.foreach { f =>
        readSpill(f).foreach(offer(_, owned = true))
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
