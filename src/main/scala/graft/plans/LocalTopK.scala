package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Map-side partial top-k below `row_number() <= k` rank filters.
  *
  * `PARTITION BY key ORDER BY o` + `filter(rn <= k)` is the universal
  * "top k per key" idiom, and Spark's physical plan for it shuffles the
  * ENTIRE input to the window's hash partitioning before computing a
  * single row number — at 100 TB that is a full-table shuffle to keep a
  * handful of rows per key. But top-k per key has the same algebraic
  * structure as an aggregation: a partition-local top-k is a correct
  * "partial" (the global top-k per key is a subset of the union of
  * per-partition top-k per key), so each map task can prune to at most
  * k rows per key it sees before the exchange — the map-side-combine
  * story, applied to rank filters. Shuffle volume drops from O(rows) to
  * O(keys-per-partition × k).
  *
  * Soundness of leaving the filter in place (not just intuition): for a
  * kept row x with pruned-rank ≤ k, any dropped row y < x would have had
  * ≥ k rows before it in y's own map partition, all of which were kept
  * and are < x — contradicting pruned-rank(x) ≤ k. So no dropped row
  * precedes any surviving row, pruned ranks equal global ranks on the
  * survivor set, and the final Window + Filter produce byte-identical
  * output (for the strict total orders our queries use; with ties,
  * row_number is nondeterministic by contract either way).
  *
  * The pieces, wired through [[graft.GraftExtensions]]:
  *  - [[LocalTopKPerKey]]: logical marker node (output = child output);
  *  - [[PushLocalTopK]]: optimizer rule matching
  *    Filter(rn cmp lit, Window(row_number over (p, o))) — the rule
  *    runs in the operator-optimization fixed point, so it is guarded
  *    idempotent and togglable via `spark.graft.localTopK.enabled`;
  *  - [[LocalTopKStrategy]] + [[LocalTopKPerKeyExec]]: one pass over
  *    each input partition holding a size-k bounded heap per key
  *    (memory O(keys-per-partition × k × rowsize); the rule caps k at
  *    [[PushLocalTopK.MaxK]] so the heaps stay task-memory-trivial).
  */
case class LocalTopKPerKey(
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalTopKPerKey =
    copy(child = newChild)
}

object PushLocalTopK extends Rule[LogicalPlan] {
  /** Above this k the per-key heaps stop being memory-trivial and the
    * shuffle saving stops being interesting; leave the plan alone.
    */
  val MaxK = 1000

  /** k such that `cond` implies rn <= k, if any. */
  private def limit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case And(l, r) =>
      (limit(l, rn), limit(r, rn)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b)             => a.orElse(b)
      }
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case EqualTo(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.localTopK.enabled", "true").toBoolean) plan
    else plan.transformUp {
      // exactly one window expression and it is row_number: any other
      // window function in the same node needs the unpruned partition
      case f @ Filter(cond, w @ Window(
          Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          _, order, child, _))
          if order.nonEmpty && !child.isInstanceOf[LocalTopKPerKey] =>
        limit(cond, alias.toAttribute) match {
          case Some(k) if k > 0 && k <= MaxK =>
            f.copy(child = w.withNewChildren(
              Seq(LocalTopKPerKey(w.partitionSpec, order, k, child))))
          case _ => f
        }
    }
}

object LocalTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalTopKPerKey(p, o, k, child) =>
      LocalTopKPerKeyExec(p, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class LocalTopKPerKeyExec(
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val (parts, order, kk) = (partitionExprs, orderExprs, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(parts, out)
      val ord = RowOrdering.create(order, out)
      // keep the k first rows under `ord` per key: a max-heap (reverse
      // ordering) of size k, worst survivor on top
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row) // reused buffer; value-equality lookup
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](kk + 1, ord.reverse)
          heaps.put(key.copy(), h)
        }
        if (h.size < kk) h.add(row.copy())
        else if (ord.compare(row, h.peek()) < 0) { h.poll(); h.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): LocalTopKPerKeyExec =
    copy(child = newChild)
}
