package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.ofRows

/** Per-group top-k as a WHOLE custom operator — the §2.8 preference-order
  * (c) integration path end to end: a logical node, a planner strategy, and
  * a physical operator, injected via `GraftExtensions`.
  *
  * Why an operator and not `row_number().over(...)`: the window form sorts
  * EVERY row of every group (state ∝ partition size) and only then drops
  * rows past k. This operator keeps a bounded heap of k rows per group —
  * state ∝ k·|groups| regardless of corpus size — which is the difference
  * between "top 3 per key over 100 TB" spilling a full sort and streaming
  * through. Spark's built-in TakeOrderedAndProject does exactly this for
  * GLOBAL top-k; this is its per-group twin.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // complete groups must be co-located; EnsureRequirements inserts the
  // hash exchange (and AQE may satisfy it from an existing partitioning)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val sortOrd = RowOrdering.create(ordering, childOutput)
      // Rows equal under `ordering` are tie-broken on their full UnsafeRow
      // bytes, making the comparison a TOTAL order over distinct rows:
      // without it, which of two order-equal rows survives a full heap
      // depends on scan/partition order and the operator's output would be
      // nondeterministic whenever orderCols don't form a per-group total
      // order. (Byte layout is a pure function of the row's values, so the
      // tiebreak is stable across partitionings.)
      val tieProjA = UnsafeProjection.create(childOutput, childOutput)
      val tieProjB = UnsafeProjection.create(childOutput, childOutput)
      def compareBytes(x: UnsafeRow, y: UnsafeRow): Int = {
        val bx = x.getBytes; val by = y.getBytes
        val n = math.min(bx.length, by.length)
        var i = 0
        while (i < n) {
          val c = java.lang.Integer.compare(bx(i) & 0xff, by(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        java.lang.Integer.compare(bx.length, by.length)
      }
      val ord = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = {
          val c = sortOrd.compare(a, b)
          if (c != 0) c else compareBytes(tieProjA(a), tieProjB(b))
        }
      }
      // per group: a worst-first heap of the k best rows seen so far
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = -ord.compare(a, b)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
          heaps.put(key.copy(), h)
        }
        if (h.size < k) h.add(row.copy())
        else if (ord.compare(row, h.peek()) < 0) { h.poll(); h.add(row.copy()) }
      }
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[InternalRow](h.size))
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** The k best rows per group, ordered by `orderCols` (name → ascending?).
    * Attributes resolve by name against the child's analyzed output — the
    * Column API's lazy column-node wrappers only resolve through classic
    * Dataset entry points, which a custom logical node is not. Requires
    * `GraftExtensions` on the session (it injects [[TopKStrategy]]).
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val out = df.queryExecution.analyzed.output
    def attr(name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${out.map(_.name).mkString(", ")}"))
    val sortOrders = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
