package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per group WITHOUT a
  * per-partition sort.
  *
  * Spark expresses top-k-per-group as `row_number() OVER (PARTITION BY
  * keys ORDER BY ord) <= k`, whose physical plan is Exchange + full
  * Sort of every partition — O(n log n) comparisons and a complete
  * spill-eligible sort buffer even though only k rows per key survive.
  * This operator keeps a bounded heap per key instead: one pass,
  * O(n log k) comparisons, memory O(keys_per_partition * k), and no
  * sort before it. At 100 TB with k=3 that is the difference between
  * sorting the corpus and streaming over it. (The reference's
  * per-group head-n selections, e.g. notebooks' brightest-n-per-
  * snapshot, are exactly this shape.)
  *
  * The three Catalyst pieces (SURVEY §2 "custom operators" path c):
  *  - [[TopKPerGroup]]  — logical node; analyzer resolves `keys`/`order`
  *    against the child generically.
  *  - [[GraftStrategies]] — planner strategy mapping it to the exec,
  *    injected via [[GraftExtensions]].
  *  - [[TopKPerGroupExec]] — physical node declaring
  *    ClusteredDistribution(keys) so EnsureRequirements inserts the
  *    one hash exchange (and AQE coalesces it); no ordering is
  *    required from the child.
  */
case class TopKPerGroup(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy for graft's custom logical operators. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, k, child) =>
      TopKPerGroupExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One-pass bounded-heap physical top-k per group.
  *
  * Rows stream through once; each key holds a max-heap of at most k
  * retained rows (head = current worst). A row only enters the heap if
  * it beats the worst, so steady-state cost per row is one comparison.
  * Emitted rows are sorted ascending within their key (k is small) —
  * callers needing a global order still sort the k*|keys| survivors,
  * not the input.
  */
case class TopKPerGroupExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val boundKeys = BindReferences.bindReferences(keys, childOutput)
    val boundOrder = BindReferences.bindReferences(order, childOutput)
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(boundKeys)
      val ord = GenerateOrdering.generate(boundOrder)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
