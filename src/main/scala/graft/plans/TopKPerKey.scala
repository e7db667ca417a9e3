package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Per-key exact top-k as a first-class operator — the §7.3(c) extension
 * rung: a custom `LogicalPlan` node, a `SparkStrategy`, and a two-phase
 * physical operator, registered via `SparkSessionExtensions`
 * (`graft.GraftExtensions`) or session-mutably through
 * `spark.experimental.extraStrategies`.
 *
 * Why an operator instead of the `row_number().over(window) <= k`
 * composition ([[graft.ops.Scale.topKPerKey]]): this operator runs a
 * bounded-heap pass per input partition (≤ k rows per key per partition
 * survive, the map-side-combine shape), shuffles only those survivors,
 * and merges heaps reducer-side — nothing is ever sorted. Spark's own
 * rank-filter rewrite (`WindowGroupLimit`, since 3.5) bounds the window
 * form's EXCHANGE the same way, but pays a FULL SORT of every input
 * partition before its partial limit and a second sort after the
 * shuffle — O(n log n) per partition against the heap's O(n log k).
 * Measured under dominant-host skew (`ProbeQuotaSkew`, 50% of rows on
 * one key, k=10): equal shuffle bytes, wall time ×1.1/×1.9/×2.8 in the
 * window plan's disfavor at 1M/5M/20M rows — the gap grows with
 * partition size exactly as the sort-vs-heap complexity predicts.
 * Spark's own `TakeOrderedAndProjectExec` does the heap shape for
 * global LIMIT; this is the grouped generalization the built-in
 * operator set lacks.
 *
 * Semantics: the k smallest rows per key group under `order` (ascending
 * SortOrder = "first k"). Deterministic when `order` is a total order per
 * key (callers add a unique tie-break, as with any top-k). Row output
 * order within/across groups is unspecified, like any aggregation.
 */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Shared bounded-heap pass: one max-heap (worst retained row at head) per
  * distinct key in the partition; a row enters only if the heap is under k
  * or it beats the current worst. */
private[plans] object TopKHeaps {
  def perPartition(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                   output: Seq[Attribute])(
                   iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, output)
    val ordering = GenerateOrdering.generate(order, output)
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(h) =>
          if (h.size < k) h += row.copy()
          else if (ordering.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ordering)
          h += row.copy()
          heaps(key.copy()) = h
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Phase 1: partition-local top-k (no distribution requirement) — the
  * map-side combine. Emits ≤ k rows per key per input partition. */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                                 k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, out) = (keys, order, k, child.output)
    child.execute().mapPartitions(it => TopKHeaps.perPartition(ks, os, kk, out)(it),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Phase 2: per-key merge after a shuffle on the keys (EnsureRequirements
  * inserts the exchange from [[requiredChildDistribution]]). */
case class TopKPerKeyFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
                               k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // empty keys = global top-k: the final merge must see ALL partial
  // survivors in one place or it would emit k rows per partition
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, out) = (keys, order, k, child.output)
    child.execute().mapPartitions(it => TopKHeaps.perPartition(ks, os, kk, out)(it),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Planner strategy: logical top-k → partial + final physical pair. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyFinalExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /**
   * Column-level entry point: the k first rows per key group under `order`.
   * Idempotently registers the planner strategy on the DataFrame's session
   * (covers sessions built without `graft.GraftExtensions`).
   */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val sortOrder = order.map(c => ColumnBridge.catalystExpression(spark, c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keys.map(c => ColumnBridge.catalystExpression(spark, c)),
        sortOrder, k, ColumnBridge.analyzed(df)))
  }
}
