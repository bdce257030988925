// Lives under org.apache.spark.sql because Dataset.ofRows and the
// Column<->Expression bridge are private[sql] in Spark 4 (the Sedona /
// spark-nlp convention for physical-operator extensions).
package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator: the k best rows per group
  * under `ordering`, equivalent to
  * `row_number() OVER (PARTITION BY group ORDER BY ordering) <= k`
  * but executed with one bounded heap per group instead of a full
  * per-group sort.
  *
  * Why a custom physical operator (the (c) rung of the extension ladder —
  * compose > Expression > LogicalPlan+Strategy+SparkPlan > mapPartitions):
  * the window form materializes and sorts every group in full before
  * discarding all but k rows; for "top 3 of millions per key" at 100 TB
  * that is a sort of the whole shuffle output. This exec holds k rows per
  * group, O(n log k) time, O(groups·k) memory, and needs only the same
  * hash exchange the window needs (requiredChildDistribution ⇒ Catalyst
  * inserts/reuses it).
  *
  * Reference analog: AnDB plans Sort+Limit as separate physical operators
  * (andb/executor/operator/physical/select.py:686-790); fusing them per
  * group is exactly the kind of operator its volcano model cannot express.
  */
case class GroupedTopK(
    group: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

/** Shared bounded-heap pass: the k best rows per group within one
  * partition's iterator. Used by BOTH phases — map-side partial (before
  * the exchange, shrinking shuffle input to ≤ groups·k rows per task)
  * and final (after the hash exchange co-locates each group). Per-group
  * top-k is decomposable, so the global answer is exactly the top-k of
  * the union of per-partition top-ks.
  *
  * Memory bound: min(rows-in-partition, distinct-groups·k) UnsafeRow
  * copies — the map never holds more rows than its input partition, even
  * in the degenerate all-distinct-keys case (where it holds exactly one
  * copy per row; GroupedTopKSpec stresses 500k distinct keys). So the
  * operator's memory ceiling equals the partition size the cluster was
  * already sized for; the window-function form it replaces additionally
  * SORTS that partition (with spill). If per-partition working sets ever
  * exceed memory at 100 TB, the fix is the normal one — more shuffle
  * partitions — not an operator change, because the partial phase runs
  * pre-exchange on scan-sized partitions and the final phase runs on
  * hash-clustered ones whose size `spark.sql.shuffle.partitions`
  * controls directly. */
private[graft] object GroupedTopKImpl {
  def topK(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      sortExprs: Seq[SortOrder],
      limit: Int,
      childOutput: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, childOutput)
    // Codegen'd row comparator for the requested sort order; the heap
    // keeps its WORST element on top (reverse order) for O(log k) evict.
    val betterFirst = GenerateOrdering.generate(sortExprs, childOutput)
    val worstOnTop: Ordering[InternalRow] = betterFirst
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row)
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](worstOnTop)
          heaps.put(key.copy(), h)
          h
      }
      if (heap.size < limit) heap.enqueue(row.copy())
      else if (betterFirst.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side partial phase: no distribution requirement, prunes each input
  * partition to ≤ k rows per group BEFORE the exchange — the TakeOrdered
  * partial pattern applied per group. */
case class PartialGroupedTopKExec(
    group: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // Rows never move: preserve the child's partitioning so a source
  // already clustered on the group keys (bucketed table, prior exchange)
  // still elides the final phase's exchange.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, lim, out) = (group, ordering, k, child.output)
    child.execute().mapPartitionsInternal(GroupedTopKImpl.topK(_, g, o, lim, out))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartialGroupedTopKExec =
    copy(child = newChild)
}

/** Final phase: requires each group co-located (Catalyst inserts/reuses
  * the hash exchange), then merges the partial winners per group. */
case class GroupedTopKExec(
    group: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(group) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, lim, out) = (group, ordering, k, child.output)
    child.execute().mapPartitionsInternal(GroupedTopKImpl.topK(_, g, o, lim, out))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

/** Plans GroupedTopK → final-over-partial GroupedTopKExec (the two-phase
  * aggregate shape: the exchange between them ships only per-partition
  * winners, ≤ groups·k rows per task, instead of the full input).
  * Injected per-session (idempotent) through
  * `experimental.extraStrategies`, so it works on any session — no
  * SparkSessionExtensions requirement at session-build time. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      GroupedTopKExec(g, o, k, PartialGroupedTopKExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupedTopKApi {

  /** `topKPerGroup(df, Seq("seg"), Seq("price" -> true, "id" -> false), 3)`
    * — the k best rows per group; order pairs are (column, descending?).
    * Columns are resolved by name against the analyzed child, which keeps
    * this API independent of the private Column→Expression converter. */
  def topKPerGroup(
      df: DataFrame,
      group: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val sortOrders = order.map { case (name, desc) =>
      SortOrder(attr(name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    Dataset.ofRows(spark, GroupedTopK(group.map(attr), sortOrders, k, analyzed))
  }
}
