package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-K rows per key as a first-class physical operator.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY key ORDER
  * BY ...) <= k` — shuffles EVERY row to its key's reducer and fully
  * sorts each partition. This operator keeps a size-k bounded heap per
  * key on the map side, so only ≤ k rows per (partition, key) reach the
  * shuffle — at 100 TB with small k, that's the difference between
  * shuffling terabytes and shuffling megabytes. O(n log k) per
  * partition, no sort.
  *
  * Full extension stack: logical node → planner strategy (two-phase:
  * partial map-side + final after a ClusteredDistribution shuffle) →
  * heap-based exec. Registered via the public `experimental.extraStrategies`.
  */
case class TopKPerKeyNode(keyExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val mapSide = TopKPerKeyExec(keys, order, k, planLater(child),
        partial = true)
      TopKPerKeyExec(keys, order, k, mapSide, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keyExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keyExprs))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyEs = keyExprs
    val orderEs = order
    val childOutput = child.output
    val kk = k
    val isPartial = partial
    // Bound on map-side state: the heap map grows with DISTINCT KEYS per
    // input partition, and at high key cardinality that is executor OOM.
    // Past the bound, rows of unseen keys pass through unfiltered — the
    // map-side heap is an optimization, not a correctness requirement;
    // the final (post-shuffle) phase reduces every key exactly.
    val maxKeys = math.max(1L,
      conf.getConfString("spark.graft.topk.maxMapKeys",
        ((1L << 22) / math.max(1, kk)).toString).toLong)
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyEs, childOutput)
      val rowOrd = GenerateOrdering.generate(orderEs, childOutput)
      // max-heap under the sort order: head = worst row currently kept
      val heapOrd = new Ordering[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = rowOrd.compare(a, b)
      }
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      val passedThrough = it.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(row.copy())
            else if (rowOrd.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
            Nil
          case None if isPartial && heaps.size >= maxKeys =>
            row.copy() :: Nil // state bound hit: defer to the final phase
          case None =>
            val heap = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](heapOrd)
            heap.enqueue(row.copy())
            heaps(key.copy()) = heap
            Nil
        }
      }
      // ++ is lazy in its right operand: heaps drain only after the
      // input (and thus every heap update) is exhausted
      passedThrough ++ heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** User-facing API. */
object TopK {
  private def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
  }

  /** Top `k` rows per `keys` group, "top" = first under `order`
    * ((column, descending?) pairs, ties broken by later entries).
    */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val sortOrder = order.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (desc) Descending else Ascending)
    }
    val node = TopKPerKeyNode(keys.map(UnresolvedAttribute.quoted),
      sortOrder, k, df.queryExecution.analyzed)
    GraftSqlBridge.ofRows(spark, node)
  }
}
