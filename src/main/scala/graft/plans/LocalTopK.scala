package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Map-side partial top-k below ranking filters:
  * `row_number()/rank()/dense_rank() <= k`.
  *
  * `PARTITION BY key ORDER BY o` + `filter(rnk <= k)` is the universal
  * "top k per key" idiom, and Spark's physical plan for it shuffles the
  * ENTIRE input to the window's hash partitioning before computing a
  * single rank — at 100 TB that is a full-table shuffle to keep a
  * handful of rows per key. But top-k per key has the same algebraic
  * structure as an aggregation: a partition-local top-k is a correct
  * "partial" (the global top-k per key is contained in the union of
  * per-partition top-k per key), so each map task can prune before the
  * exchange — the map-side-combine story, applied to rank filters.
  * Shuffle volume drops from O(rows) to O(keys-per-partition × k)
  * (times the tie multiplicity for rank/dense_rank, which keep ties by
  * definition).
  *
  * What a partition must retain, per ranking function:
  *  - row_number: any k minimal rows under the sort order;
  *  - rank: every row whose sort key is ≤ the k-th smallest key
  *    (counting duplicates) — ties at the boundary are rank ≤ k;
  *  - dense_rank: every row in the k smallest *distinct*-key buckets.
  *
  * Soundness of leaving the filter in place (not just intuition): for a
  * kept row x whose pruned rank is ≤ k, any dropped row y strictly
  * before x would have had ≥ k rows (rank: ≥ k rows; dense_rank: ≥ k
  * distinct keys) strictly before it in y's own map partition, all of
  * which were retained and precede x — contradicting pruned-rank(x) ≤ k.
  * So no dropped row precedes any surviving row, pruned ranks equal
  * global ranks on the survivor set, and the final Window + Filter
  * produce identical output. (Ties never straddle the cut for
  * rank/dense_rank because retention is key-closed: a row equal to a
  * retained key is itself retained. For row_number with non-total
  * orders the choice among tied rows is nondeterministic by contract,
  * exactly as without the rewrite.)
  *
  * The pieces, wired through [[graft.GraftExtensions]]:
  *  - [[LocalTopKPerKey]]: logical marker node (output = child output);
  *  - [[PushLocalTopK]]: optimizer rule matching
  *    Filter(rnk cmp lit, Window(ranking fn over (p, o))) — the rule
  *    runs in the operator-optimization fixed point, so it is guarded
  *    idempotent and togglable via `spark.graft.localTopK.enabled`;
  *  - [[LocalTopKStrategy]] + [[LocalTopKPerKeyExec]]: one pass over
  *    each input partition with a sorted bucket map per key (bucket =
  *    rows sharing a sort key), evicting from the tail under the
  *    mode-specific invariant. Memory is O(keys-per-partition × k ×
  *    rowsize) for row_number, plus tie multiplicity (= the true output
  *    size) for rank/dense_rank; the rule caps k at
  *    [[PushLocalTopK.MaxK]] so the buckets stay task-memory-trivial.
  */
case class LocalTopKPerKey(
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    mode: RankMode,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalTopKPerKey =
    copy(child = newChild)
}

/** Which ranking function the retained set must be correct for. */
sealed trait RankMode extends Serializable
case object ByRowNumber extends RankMode
case object ByRank extends RankMode
case object ByDenseRank extends RankMode

object PushLocalTopK extends Rule[LogicalPlan] {
  /** Above this k the per-key retention stops being memory-trivial and
    * the shuffle saving stops being interesting; leave the plan alone.
    */
  val MaxK = 1000

  /** k such that `cond` implies rnk <= k, if any. */
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

  private def modeOf(fn: Expression): Option[RankMode] = fn match {
    case _: RowNumber => Some(ByRowNumber)
    case _: Rank      => Some(ByRank)
    case _: DenseRank => Some(ByDenseRank)
    case _            => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.localTopK.enabled", "true").toBoolean) plan
    else plan.transformUp {
      // exactly one window expression and it is a ranking function: any
      // other window function in the same node needs the full partition
      case f @ Filter(cond, w @ Window(
          Seq(alias @ Alias(WindowExpression(fn, _), _)),
          _, order, child, _))
          if order.nonEmpty && modeOf(fn).isDefined &&
            !child.isInstanceOf[LocalTopKPerKey] =>
        limit(cond, alias.toAttribute) match {
          case Some(k) if k > 0 && k <= MaxK =>
            f.copy(child = w.withNewChildren(Seq(
              LocalTopKPerKey(w.partitionSpec, order, k, modeOf(fn).get,
                child))))
          case _ => f
        }
    }
}

object LocalTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalTopKPerKey(p, o, k, m, child) =>
      LocalTopKPerKeyExec(p, o, k, m, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class LocalTopKPerKeyExec(
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    mode: RankMode,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  /** Rows of one key, as sorted buckets of order-key-equal rows. The
    * mode-specific invariant is restored by evicting tail buckets (the
    * before-count is monotone in bucket order, so the tail is always
    * the first evictable bucket):
    *  - row_number: total rows ≤ k (tail bucket may shed single rows);
    *  - rank: rows before the tail bucket < k;
    *  - dense_rank: at most k buckets.
    */
  private final class Retained(ord: Ordering[InternalRow], kk: Int, m: RankMode) {
    val buckets = new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](ord)
    private var total = 0

    def add(row: InternalRow): Unit = {
      // cheap reject: row past the current cut can never be retained
      if (!admissible(row)) return
      val copy = row.copy()
      var b = buckets.get(copy)
      if (b == null) { b = new java.util.ArrayList[InternalRow](1); buckets.put(copy, b) }
      b.add(copy); total += 1
      evict()
    }

    private def admissible(row: InternalRow): Boolean =
      buckets.isEmpty || (m match {
        case ByRowNumber => total < kk || ord.compare(row, buckets.lastKey()) < 0
        case ByRank => total < kk || ord.compare(row, buckets.lastKey()) <= 0
        case ByDenseRank =>
          buckets.size < kk || ord.compare(row, buckets.lastKey()) <= 0
      })

    private def evict(): Unit = m match {
      case ByRowNumber =>
        while (total > kk) {
          val tail = buckets.lastEntry()
          tail.getValue.remove(tail.getValue.size - 1); total -= 1
          if (tail.getValue.isEmpty) buckets.remove(tail.getKey)
        }
      case ByRank =>
        while (buckets.size > 1 && total - buckets.lastEntry().getValue.size >= kk) {
          total -= buckets.lastEntry().getValue.size
          buckets.remove(buckets.lastKey())
        }
      case ByDenseRank =>
        while (buckets.size > kk) {
          total -= buckets.lastEntry().getValue.size
          buckets.remove(buckets.lastKey())
        }
    }

    def rows: Iterator[InternalRow] = {
      import scala.jdk.CollectionConverters._
      buckets.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val (parts, order, kk, m) = (partitionExprs, orderExprs, k, mode)
    val chunkRows = conf.getConfString("spark.graft.localTopK.chunkRows",
      LocalTopKPerKeyExec.ChunkRows.toString).toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(parts, out)
      val ord = RowOrdering.create(order, out)
      // Chunked retention: with near-unique window keys the per-key map
      // would otherwise hold most of the input partition in memory.
      // Emitting each chunk's retained set and starting fresh is still
      // sound — retention may only ever keep a SUPERSET of the rows the
      // final Window + Filter need (the union of chunk-local top-k
      // contains the partition top-k contains the global top-k), and
      // every input row is emitted at most once. Memory is bounded by
      // chunkRows regardless of key cardinality; for few-key inputs the
      // chunk cut costs at most k extra rows per key per chunk.
      //
      // Retained-set BOUND per (chunk, key) — incl. the tie-heavy rank
      // boundary, the one case that looks unbounded: row_number ≤ k rows;
      // dense_rank ≤ k buckets; rank ≤ (k−1) rows + ONE tie bucket (the
      // invariant evicts any bucket with ≥ k rows before it, so at most
      // the boundary bucket survives whole). Emitted superset ≤ chunks ×
      // keys × ((k−1) + T), T = largest same-sort-key tie group. The tie
      // term is irreducible, not a leak: a boundary bucket that truly
      // ranks ≤ k IS output (keep-ties semantics), and one that doesn't
      // is confined to a single bucket per (chunk, key). Instantaneous
      // memory stays ≤ chunkRows rows in every case — a chunk only ever
      // admits that many. Adversarial spec: LocalTopKSpec "rank tie
      // storm".
      new Iterator[InternalRow] {
        private var outIt: Iterator[InternalRow] = Iterator.empty
        private def refill(): Unit = {
          val byKey = new java.util.HashMap[UnsafeRow, Retained]()
          var processed = 0
          while (iter.hasNext && processed < chunkRows) {
            val row = iter.next()
            val key = keyProj(row) // reused buffer; value-equality lookup
            var r = byKey.get(key)
            if (r == null) {
              r = new Retained(ord, kk, m); byKey.put(key.copy(), r)
            }
            r.add(row)
            processed += 1
          }
          import scala.jdk.CollectionConverters._
          outIt = byKey.values().iterator().asScala.flatMap(_.rows)
        }
        override def hasNext: Boolean = {
          while (!outIt.hasNext && iter.hasNext) refill()
          outIt.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          outIt.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): LocalTopKPerKeyExec =
    copy(child = newChild)
}

object LocalTopKPerKeyExec {
  /** Default rows per retention chunk — the memory bound of the operator.
    * Tunable via `spark.graft.localTopK.chunkRows` (tests shrink it to
    * exercise many-chunk behavior without generating ChunkRows-scale
    * inputs).
    */
  val ChunkRows: Int = 1 << 20
}
