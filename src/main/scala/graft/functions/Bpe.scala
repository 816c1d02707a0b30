package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer over a FIXED public merge table — the
  * GPT-2-style subword counter that makes the packing/budget/chunking
  * operators (q78b) token-exact instead of whitespace-approximate
  * (Sennrich et al. '16, arXiv:1508.07909; GPT-2's byte-level variant).
  *
  * The merge table is a small hand-written fixture of common English
  * digraphs/suffixes (a production deployment drops in a real learned
  * table — the algorithm is table-size-independent). Tokenization is
  * DEFINED as: start from single characters; repeat { find the adjacent
  * pair with the lowest merge rank, leftmost occurrence on ties; merge
  * that one occurrence }; stop when no adjacent pair is in the table.
  * One-occurrence-at-a-time with global re-selection is the
  * priority-queue formulation the reference BPE implementations use;
  * making it the *defined* contract lets the DuckDB oracle replay it
  * step-for-step (recursive CTE) with zero ambiguity.
  *
  * 100-TB posture: callers tokenize DISTINCT words once and join counts
  * back (the q101 count-table pattern) — per-batch work is
  * vocabulary-sized, not token-mass-sized, and the kernel itself is one
  * compiled static call inside whole-stage codegen (no UDF, no
  * serialization).
  */
object Bpe {

  /** The fixture merges; rank = position. Rendered verbatim into the
    * DuckDB oracle by [[sqlMergeList]] — one source of truth.
    */
  val Merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("h", "e"), ("a", "t"), ("e", "n"),
    ("e", "d"), ("o", "r"), ("s", "t"), ("a", "r"), ("o", "u"),
    ("i", "t"), ("i", "s"), ("e", "s"), ("in", "g"), ("an", "d"),
    ("t", "o"), ("o", "f"), ("l", "l"), ("l", "e"), ("c", "h"),
    ("s", "e"), ("r", "o"), ("m", "e"), ("d", "e"), ("c", "o"),
    ("t", "i"), ("ti", "on"), ("u", "s"), ("a", "l"), ("m", "a"),
    ("w", "h"), ("e", "x"), ("p", "r"), ("0", "0"), ("1", "2"),
    ("er", "s"), ("on", "g"), ("the", "r"), ("re", "s"), ("at", "e"),
    ("or", "d"), ("en", "t"), ("it", "y"))

  /** Unambiguous pair key: the bare "a|b" concatenation conflates
    * distinct pairs once tokens themselves contain '|' (key("a|","b") ==
    * key("a","|b")), corrupting rank lookups and trainer pair counts.
    * Length-prefixing the left side makes the key injective for ANY
    * token alphabet. (The DuckDB oracle replay still renders "a|b" keys
    * — its documented boundary is the fixture table, whose tokens never
    * contain '|'.)
    */
  private def pairKey(a: String, b: String): String =
    a.length + "|" + a + b

  private[graft] def rankMapOf(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(pairKey(a, b), i) }
    m
  }

  private val rank: java.util.HashMap[String, Integer] = rankMapOf(Merges)

  /** The merge table as a DuckDB list literal of "a|b" keys (1-based
    * list_position = rank + 1 — order-preserving, which is all the
    * argmin needs).
    */
  def sqlMergeList: String =
    Merges.map { case (a, b) => s"'$a|$b'" }.mkString("[", ", ", "]")

  /** Oracle fragment (use under WITH RECURSIVE): word occurrences
    * `bw(doc_id, w)` and per-DISTINCT-word BPE counts `bcnt(w, bpe)` —
    * the recursive CTE replays the defined merge procedure step-for-step
    * (each recursion level merges exactly one pair: the lowest-rank,
    * leftmost one). Reserves CTE names bw/bdw/btok/bfin/bcnt.
    */
  def sqlBpeCtes: String =
    s"""bw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |       FROM documents),
       |bdw AS (SELECT DISTINCT w FROM bw),
       |btok(w, toks) AS (
       |  SELECT w, [w[i] FOR i IN generate_series(1, len(w))] FROM bdw
       |  UNION ALL
       |  SELECT w, list_concat(list_concat(
       |      toks[1:b.i - 1], [toks[b.i] || toks[b.i + 1]]),
       |      toks[b.i + 2:len(toks)])
       |  FROM (SELECT w, toks,
       |      list_sort(list_filter(
       |        [{'r': list_position($sqlMergeList,
       |                toks[i] || '|' || toks[i + 1]), 'i': i}
       |         FOR i IN generate_series(1, len(toks) - 1)],
       |        x -> x.r IS NOT NULL AND x.r > 0))[1] AS b
       |    FROM btok)
       |  WHERE b IS NOT NULL),
       |bfin AS (SELECT w, toks FROM (
       |    SELECT w, toks, row_number() OVER (PARTITION BY w
       |      ORDER BY len(toks)) AS rn FROM btok) WHERE rn = 1),
       |bcnt AS (SELECT w, CAST(len(toks) AS BIGINT) AS bpe FROM bfin)"""
      .stripMargin

  /** Apply the defined merge procedure to one word. Seed tokens are
    * Unicode CODE POINTS, not UTF-16 code units: DuckDB's `w[i]` /
    * `len(w)` index characters, so a supplementary-plane char (emoji,
    * rare CJK) must be ONE seed token in both engines — charAt-seeding
    * would split it into two unpaired surrogates here and diverge from
    * the oracle on the first non-BMP word.
    */
  def tokenize(word: String): Array[String] = tokenizeWith(word, rank)

  /** The kernel body over an ARBITRARY merge table — the fixture path
    * and the trained-table path share one implementation, so the scale
    * measurement measures the shipping kernel. Per-word cost: each step
    * scans the current token seam (O(L)) and merges one occurrence, and
    * there are at most L−1 steps — O(L²) seam scans per word in the
    * worst case, where L is the CODE-POINT length. This is why callers
    * keep the count-table pattern (distinct words once): the quadratic
    * is paid per VOCABULARY entry, not per corpus token.
    */
  private[graft] def tokenizeWith(word: String,
      rk: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    val cps = word.codePoints().toArray
    var toks = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) {
      toks(i) = new String(Character.toChars(cps(i))); i += 1
    }
    var done = false
    while (!done && toks.length > 1) {
      var bi = -1
      var br = Int.MaxValue
      var j = 0
      while (j < toks.length - 1) {
        val r = rk.get(pairKey(toks(j), toks(j + 1)))
        if (r != null && r < br) { br = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val next = new Array[String](toks.length - 1)
        System.arraycopy(toks, 0, next, 0, bi)
        next(bi) = toks(bi) + toks(bi + 1)
        System.arraycopy(toks, bi + 2, next, bi + 1, toks.length - bi - 2)
        toks = next
      }
    }
    toks
  }

  // ---- interned kernel ----------------------------------------------------
  //
  // The string kernel above is the DEFINED contract (and what the DuckDB
  // oracle replays). Its cost law, measured at a dense 50k table
  // (SCALING.md round 11), was superquadratic in word length: O(L²) seam
  // scans × O(L) string-concat key bytes per probe. The interned kernel
  // removes both factors — the standard BPE implementation trick:
  //  - every token the table can produce is interned to an int id
  //    (BY STRING, so two rules producing the same text share one id);
  //  - a rule lookup is one probe of an open-addressed long→long map
  //    keyed by (leftId << 32 | rightId) — no key bytes materialized;
  //  - selection is a lazy-deletion binary heap of (rank << 32 | pos)
  //    packed longs over a doubly-linked token list, so a word costs
  //    O(L log L) instead of O(L) full seam rescans per merge.
  // Merge ORDER is unchanged: the heap pops the globally lowest rank,
  // smallest position — token positions keep their original index, which
  // is monotone in sequence order, so smallest-pos == leftmost, exactly
  // the string kernel's tie rule. Stale entries (the pair at that
  // position changed or vanished) fail the revalidation probe and are
  // discarded; new pairs formed by a merge are pushed eagerly. The spec
  // pins fast == string-path equality on the fixture table, the trained
  // 50k table, and adversarial words (repeats, non-BMP, unseen chars).

  /** A merge table compiled to int-pair form. Unknown characters map to
    * id −1, which no rule's key contains — they simply never merge.
    */
  private[graft] final class InternedTable(merges: Seq[(String, String)]) {
    private val idOf = new java.util.HashMap[String, Integer]()
    private def intern(t: String): Int = {
      val got = idOf.get(t)
      if (got != null) got.intValue
      else { val id = idOf.size(); idOf.put(t, id); id }
    }
    // open-addressed long→long map: key (a << 32 | b), value
    // (rank << 32 | outId). Power-of-two capacity, linear probing,
    // EMPTY = Long.MinValue (never a valid key: ids are >= 0).
    private val cap = {
      var c = 16
      while (c < merges.size * 4) c <<= 1
      c
    }
    private val keys = Array.fill[Long](cap)(Long.MinValue)
    private val vals = new Array[Long](cap)
    // Fibonacci-hash multiplier 0x9E3779B9 as a signed Int constant.
    private final val HashMul = -1640531527
    private def put(k: Long, v: Long): Unit = {
      var i = (java.lang.Long.hashCode(k) * HashMul) & (cap - 1)
      while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & (cap - 1)
      // last writer wins on a duplicate (a, b) rule — the string kernel's
      // HashMap.put behavior (ranks are unique per key in any real table,
      // so this matters only for degenerate inputs)
      keys(i) = k; vals(i) = v
    }
    /** rank << 32 | outId, or −1 if the pair is not a rule. */
    def lookup(a: Int, b: Int): Long = {
      if (a < 0 || b < 0) return -1L
      val k = (a.toLong << 32) | (b.toLong & 0xFFFFFFFFL)
      var i = (java.lang.Long.hashCode(k) * HashMul) & (cap - 1)
      while (true) {
        val kk = keys(i)
        if (kk == k) return vals(i)
        if (kk == Long.MinValue) return -1L
        i = (i + 1) & (cap - 1)
      }
      -1L
    }
    // single-code-point seed ids (only chars the table can consume)
    private val seedOf = new java.util.HashMap[Integer, Integer]()
    locally {
      merges.zipWithIndex.foreach { case ((a, b), r) =>
        val ia = intern(a); val ib = intern(b); val io = intern(a + b)
        put((ia.toLong << 32) | (ib.toLong & 0xFFFFFFFFL),
          (r.toLong << 32) | (io.toLong & 0xFFFFFFFFL))
      }
      idOf.forEach { (t, id) =>
        if (t.codePointCount(0, t.length) == 1)
          seedOf.put(t.codePointAt(0), id)
      }
    }
    def seedId(cp: Int): Int = {
      val got = seedOf.get(cp)
      if (got == null) -1 else got.intValue
    }
  }

  /** Token count of one word under an interned table: heap-driven exact
    * replay of the defined merge procedure. Allocation-light: three int
    * arrays + one growable long heap per call.
    */
  private[graft] def countInterned(word: String, tb: InternedTable): Long = {
    if (word.isEmpty) return 0L
    val n = word.codePointCount(0, word.length)
    if (n == 1) return 1L
    val ids = new Array[Int](n)
    var ci = 0
    var k = 0
    while (k < n) {
      val cp = word.codePointAt(ci)
      ids(k) = tb.seedId(cp)
      ci += Character.charCount(cp)
      k += 1
    }
    val prev = new Array[Int](n)
    val next = new Array[Int](n)
    var i = 0
    while (i < n) { prev(i) = i - 1; next(i) = i + 1; i += 1 }
    next(n - 1) = -1
    val alive = new Array[Boolean](n)
    java.util.Arrays.fill(alive, true)
    // binary min-heap of (rank << 32 | pos) packed longs
    var heap = new Array[Long](math.max(16, n))
    var hn = 0
    def push(v: Long): Unit = {
      if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
      heap(hn) = v; hn += 1
      var c = hn - 1
      while (c > 0 && heap((c - 1) >> 1) > heap(c)) {
        val p = (c - 1) >> 1
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    def pop(): Long = {
      val top = heap(0)
      hn -= 1
      heap(0) = heap(hn)
      var c = 0
      var going = true
      while (going) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < hn && heap(l) < heap(m)) m = l
        if (r < hn && heap(r) < heap(m)) m = r
        if (m == c) going = false
        else { val t = heap(m); heap(m) = heap(c); heap(c) = t; c = m }
      }
      top
    }
    def tryPush(pos: Int): Unit = {
      val nx = next(pos)
      if (nx >= 0) {
        val v = tb.lookup(ids(pos), ids(nx))
        if (v >= 0)
          push(((v >>> 32) << 32) | (pos.toLong & 0xFFFFFFFFL))
      }
    }
    i = 0
    while (i < n - 1) {
      val v = tb.lookup(ids(i), ids(i + 1))
      if (v >= 0) push(((v >>> 32) << 32) | (i.toLong & 0xFFFFFFFFL))
      i += 1
    }
    var count = n.toLong
    while (hn > 0) {
      val top = pop()
      val pos = (top & 0xFFFFFFFFL).toInt
      val rank = (top >>> 32).toInt
      if (alive(pos)) {
        val nx = next(pos)
        if (nx >= 0) {
          val v = tb.lookup(ids(pos), ids(nx))
          // revalidate: the popped entry may predate a merge that changed
          // either side; the CURRENT pair owns its own (newer) entry
          if (v >= 0 && (v >>> 32).toInt == rank) {
            ids(pos) = (v & 0xFFFFFFFFL).toInt
            alive(nx) = false
            val nn = next(nx)
            next(pos) = nn
            if (nn >= 0) prev(nn) = pos
            count -= 1
            val pv = prev(pos)
            if (pv >= 0) tryPush(pv)
            tryPush(pos)
          }
        }
      }
    }
    count
  }

  private lazy val fixtureInterned = new InternedTable(Merges)

  /** Codegen entry: BPE token count of one word (interned fast path;
    * spec-pinned equal to the string-path contract).
    */
  def count(word: UTF8String): Long =
    countInterned(word.toString, fixtureInterned)

  // ---- trained-table slot (bpe_count_trained) ----------------------------
  //
  // The fixture table above is the ORACLE contract (q39b/q78b replay it
  // in DuckDB — a 50k-entry list literal would make the recursive-CTE
  // oracle both unreadable and unrunnable, so the fixture size IS the
  // documented oracle contract). Realistic-scale tables go through this
  // second slot: [[train]] learns one from a corpus, [[installTrained]]
  // swaps it in, and the `bpe_count_trained` expression runs the SAME
  // compiled kernel against it. graft.BpeBench measures the kernel at
  // 50k merges / 200k-word vocabulary (SCALING.md).

  /** Both forms of the installed table behind ONE volatile reference, so
    * a reader never observes a torn (new rank map, old interned table)
    * pair across an [[installTrained]] racing a running job.
    */
  private final class TrainedTables(
      val rank: java.util.HashMap[String, Integer],
      val interned: InternedTable)

  @volatile private var trainedTables: TrainedTables =
    new TrainedTables(rank, fixtureInterned)

  /** The installed trained table through the string kernel — the spec's
    * reference path for fast==contract equality under the trained table.
    */
  private[graft] def trainedStringCount(word: String): Long =
    tokenizeWith(word, trainedTables.rank).length.toLong

  /** Install a trained table for `bpe_count_trained` (defaults to the
    * fixture until installed). Driver-side call; executors in local mode
    * share the JVM — a cluster deployment broadcasts the table instead.
    */
  def installTrained(merges: Seq[(String, String)]): Unit =
    trainedTables = new TrainedTables(rankMapOf(merges),
      new InternedTable(merges))

  def countTrained(word: UTF8String): Long =
    countInterned(word.toString, trainedTables.interned)

  /** Seed-token array for the distributed trainer: one element per
    * Unicode CODE POINT (the [[tokenizeWith]] seeding contract — charAt
    * would split a supplementary-plane char into two unpaired
    * surrogates). Codegen entry for [[CodePointSeed]].
    */
  def seedArray(w: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cps = w.toString.codePoints().toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cps.map(cp => UTF8String.fromString(new String(Character.toChars(cp)))
        .asInstanceOf[Any]))
  }

  /** DISTRIBUTED BPE trainer — the count-table formulation at corpus
    * scale (round-11 verdict #1's second half). The driver-side
    * [[train]] is vocabulary-bounded (the corpus never leaves the
    * cluster: extraction is a distributed groupBy count), which is the
    * right shape while the DISTINCT-WORD table fits one heap; this
    * trainer removes that bound too. Super-step form:
    *
    *   1. adjacent-pair counts: one distributed explode + sum over the
    *      current tokenization state (weighted by word count) — the
    *      count table, recomputed per round;
    *   2. the top candidates come to the driver (a bounded
    *      control-plane read, [[graft.operators.Dedup]]'s q131 class),
    *      and up to `batch` MUTUALLY NON-INTERFERING pairs are accepted
    *      per round — no accepted pair's token or concatenation equals
    *      another's token or concatenation, so their left-to-right
    *      applications commute and one distributed map applies them all;
    *   3. the merged state replaces the words frame (lineage cut per
    *      round) and the loop continues until `target` or saturation.
    *
    * Fidelity: with batch = 1 this IS sequential greedy — same counts,
    * same (count desc, length-prefixed-pair-key asc) tie rule as the
    * heap trainer, so the merge lists match exactly (spec-pinned).
    * Batched rounds deviate where a merge would have changed a later
    * pick inside the same round; the deviation is measured (TextKernel
    * spec + SCALING.md) as served-token-count agreement, not assumed.
    * A pair that RE-FORMS after its rule was emitted is re-applied but
    * never re-emitted (the [[train]] dup-rule guard). Cost per round:
    * one vocab-mass explode+agg and one vocab-mass map — rounds =
    * target/batch, every step distributed; the driver holds only the
    * candidate heads and the merge list.
    *
    * Round economics (round-13, after the r12 verdict flagged ~780
    * rounds at batch=64 extrapolating to ~65 min for a GPT-2-scale
    * table): the default batch is 256 with a batch×8 candidate head.
    * This is safe because DISJOINTNESS IS EXACTNESS here — a merge
    * (a, b)→ab perturbs only pair counts whose occurrences overlap an
    * (a, b) site, i.e. pairs containing a, b, or ab; every pair the
    * used-set admits therefore carries exactly the count sequential
    * greedy would have seen at its turn within the round. The only
    * drift channel is a NEWLY-FORMED pair (one containing a fresh ab)
    * that sequential greedy would have ranked above a later in-round
    * acceptance — it is delayed to the next round, never lost, which is
    * why measured drift stays ~0.1% while rounds drop 4× ([[lastDistRounds]]
    * + the TextKernelSpec gate carry the measurement).
    */
  /** Rounds the most recent [[trainDistributed]] run took — read by the
    * fidelity spec and BpeBench (single-threaded use; last call wins).
    */
  private[graft] val lastDistRounds =
    new java.util.concurrent.atomic.AtomicInteger(0)

  def trainDistributed(vocab: org.apache.spark.sql.DataFrame, target: Int,
      batch: Int = 256): Vector[(String, String)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    var words = vocab
      .select(call_function("bpe_seed", col("w")).as("toks"),
        col("n").cast("long").as("n"))
      .filter(size(col("toks")) > 1)
      .localCheckpoint(true)
    val merges = Vector.newBuilder[(String, String)]
    val emitted = new java.util.HashSet[String]()
    var n = 0
    var rounds = 0
    var exhausted = false
    while (n < target && !exhausted) {
      rounds += 1
      // guard every round, not just the seed: merges collapse words to
      // one token, and Spark's sequence(0, -1) is a DESCENDING [0, -1],
      // not empty (the q134 hazard)
      val top = words.filter(size(col("toks")) > 1)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2)," +
            " i -> struct(toks[i] AS a, toks[i + 1] AS b))")).as("p"),
          col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("c"))
        .filter(col("c") >= 2)
        // the heap trainer's exact tie rule: count desc, then the
        // length-prefixed pair key ascending. Spark's length() counts
        // code points and its string order is UTF-8-binary, vs the heap
        // trainer's UTF-16 units + compareTo — identical on ASCII,
        // which is the documented scope of the batch=1 exact-equality
        // contract; non-ASCII vocabularies still train correctly, with
        // tie order defined by THIS key
        .withColumn("k", concat(length(col("a")).cast("string"), lit("|"),
          col("a"), col("b")))
        .orderBy(col("c").desc, col("k"))
        .limit(math.max(batch * 16, 64))
        .select(col("a"), col("b"), col("c")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // Non-interfering subset under the EXACT interference rule
        // (round-13; the round-12 cut required {a, b, ab} pairwise
        // disjoint and measured ~17 acceptances/round on a 2048-row
        // head — the conservatism, not the head, was the round count).
        // Merging (a, b) → ab perturbs only pair counts of the forms
        // (x, a), (b, y), (a, b), and pairs naming the fresh ab. A
        // later candidate (c, d) therefore keeps its exact pre-round
        // count — and one left-to-right pass applies both rules in
        // sequential order — iff
        //   d ∉ F∪C,  c ∉ S∪C,  cd ∉ F∪S∪C
        // over the already-accepted firsts F, seconds S, concats C.
        // Sharing a FIRST element ((t,e),(t,h)) or a SECOND ((t,e),
        // (s,e)) is exact and admitted; chaining ((t,c) then (c,h)) and
        // fresh-token references stay excluded, which is where order
        // would have mattered.
        // FREQUENCY STRATUM: additionally, only candidates within 2× of
        // the round's top count are admitted. A newly-formed pair's
        // count is bounded by its parent's (every (x, ab) occurrence
        // contains an (a, b) one), so a merge the batch delays to the
        // next round can outrank an in-stratum acceptance by at most
        // the stratum factor — the staleness bound that holds measured
        // drift at ~0.1% where unstratified batch-256 read 5% (both in
        // the TextKernelSpec measurement).
        val topC = top.head._3
        val f = new java.util.HashSet[String]()
        val sSet = new java.util.HashSet[String]()
        val c = new java.util.HashSet[String]()
        val accepted = scala.collection.mutable.ArrayBuffer[(String, String)]()
        var i = 0
        while (i < top.length && top(i)._3 * 2 >= topC &&
            accepted.length < batch &&
            n + accepted.count { case (a, b) =>
              !emitted.contains(pairKey(a, b)) } < target) {
          val (a, b, _) = top(i)
          val ab = a + b
          if (!f.contains(b) && !c.contains(b) &&
              !sSet.contains(a) && !c.contains(a) &&
              !f.contains(ab) && !sSet.contains(ab) && !c.contains(ab)) {
            accepted += ((a, b))
            f.add(a); sSet.add(b); c.add(ab)
          }
          i += 1
        }
        if (accepted.isEmpty) exhausted = true
        else {
          accepted.foreach { case (a, b) =>
            if (emitted.add(pairKey(a, b))) { // re-formed pairs re-apply,
              merges += ((a, b))              // never re-emit
              n += 1
            }
          }
          // key lengths in CODE POINTS: the fold computes its lookup
          // key with Spark's length() (code points), so the build side
          // must match — Scala String.length counts UTF-16 units and a
          // supplementary-plane token would make every lookup miss, the
          // merge never apply, and the loop spin on a pair that never
          // drains (round-12 review; regression-spec'd on an emoji
          // vocabulary)
          val kvs: Seq[Column] = accepted.toSeq.flatMap { case (a, b) =>
            Seq(lit(a.codePointCount(0, a.length) + "|" + a + b),
              lit(a + b))
          }
          val mcol = map(kvs: _*)
          val applied = aggregate(col("toks"),
            array().cast("array<string>"),
            (acc, x) => {
              val lastT = element_at(acc, -1)
              val out = element_at(mcol, concat(
                length(lastT).cast("string"), lit("|"), lastT, x))
              when(size(acc) > 0 && out.isNotNull,
                concat(slice(acc, lit(1), size(acc) - 1), array(out)))
                .otherwise(concat(acc, array(x)))
            })
          // drop words collapsed to one token: they can never pair
          // again, and carrying them re-maps + re-checkpoints dead rows
          // every remaining round
          words = words.select(applied.as("toks"), col("n"))
            .filter(size(col("toks")) > 1)
            .localCheckpoint(true)
        }
      }
    }
    lastDistRounds.set(rounds)
    merges.result()
  }

  /** Greedy BPE trainer (Sennrich et al. '16, arXiv:1508.07909 — the
    * public algorithm): repeatedly merge the most frequent adjacent
    * token pair across the (count-weighted) vocabulary. Deterministic:
    * ties break on the lexicographically smallest (a, b). Incremental
    * bookkeeping — pair counts and pair→word postings are updated only
    * for the words a merge touches, with a lazy-deletion max-heap for
    * selection — so training 50k merges over a 200k-word vocabulary is
    * seconds, not hours. Stops early when no pair occurs twice
    * (saturation): on this repo's synthetic corpus that is ~100 merges
    * (31 distinct words), which is why the scale measurement uses a
    * generated vocabulary (graft.BpeBench).
    */
  def train(vocab: Seq[(String, Long)], target: Int): Vector[(String, String)] = {
    final class Word(var toks: Array[String], val n: Long)
    val words = vocab.iterator.filter(_._1.nonEmpty).map { case (w, c) =>
      val cps = w.codePoints().toArray
      new Word(cps.map(cp => new String(Character.toChars(cp))), c)
    }.toArray
    val pairCount = new java.util.HashMap[String, Long]()
    val pairWords = new java.util.HashMap[String, java.util.BitSet]()
    // key → (a, b): the key string is not parseable back (tokens may
    // themselves contain the separator), so the sides are kept alongside
    val pairAB = new java.util.HashMap[String, (String, String)]()
    def key(a: String, b: String) = pairKey(a, b)
    def addPairs(wi: Int, sign: Long): Unit = {
      val w = words(wi)
      var j = 0
      while (j < w.toks.length - 1) {
        val k = key(w.toks(j), w.toks(j + 1))
        val c = pairCount.getOrDefault(k, 0L) + sign * w.n
        if (c <= 0L) pairCount.remove(k) else pairCount.put(k, c)
        if (sign > 0) {
          pairWords.computeIfAbsent(k, _ => new java.util.BitSet()).set(wi)
          if (!pairAB.containsKey(k)) pairAB.put(k, (w.toks(j), w.toks(j + 1)))
        }
        j += 1
      }
    }
    // heap of (count, pairKey), max count first, lex-min key on ties;
    // stale entries (count != current) are discarded on pop and the
    // current value re-pushed so a decreased pair is never lost
    val heap = new java.util.PriorityQueue[(Long, String)](
      (x: (Long, String), y: (Long, String)) =>
        if (x._1 != y._1) java.lang.Long.compare(y._1, x._1)
        else x._2.compareTo(y._2))
    words.indices.foreach(addPairs(_, 1L))
    pairCount.forEach((k, c) => heap.add((c, k)))
    val merges = Vector.newBuilder[(String, String)]
    // A pair CAN re-form after its rule was emitted: a later merge whose
    // output string equals `a` (or `b`) creates new (a, b) adjacencies.
    // The rule already exists — at tokenize time the earlier rank fires —
    // so the trainer must APPLY it again (keeping its bookkeeping in sync
    // with what tokenization does) but must NOT emit a duplicate entry,
    // which under the rank map's last-wins would move the pair to the
    // later rank and change merge order vs the emitted list.
    val emitted = new java.util.HashSet[String]()
    var n = 0
    var exhausted = false
    while (n < target && !exhausted) {
      var picked: String = null
      while (picked == null && !heap.isEmpty) {
        val (c, k) = heap.poll()
        val cur = pairCount.getOrDefault(k, 0L)
        if (cur == c && c >= 2L) picked = k
        else if (cur >= 2L && cur < c) heap.add((cur, k)) // decreased: requeue
        // cur > c entries were re-pushed at increase time; cur < 2 drops
      }
      if (picked == null) exhausted = true
      else {
        val (a, b) = pairAB.get(picked)
        if (emitted.add(picked)) {
          merges += ((a, b))
          n += 1
        }
        val touched = pairWords.remove(picked)
        val merged = a + b
        var wi = if (touched == null) -1 else touched.nextSetBit(0)
        while (wi >= 0) {
          val w = words(wi)
          // only words still containing the pair (postings can be stale
          // after earlier merges rewrote the word)
          var has = false
          var j = 0
          while (!has && j < w.toks.length - 1) {
            has = w.toks(j) == a && w.toks(j + 1) == b; j += 1
          }
          if (has) {
            addPairs(wi, -1L)
            // merge ALL occurrences left-to-right (training-time rule)
            val out = new scala.collection.mutable.ArrayBuffer[String](
              w.toks.length)
            var i2 = 0
            while (i2 < w.toks.length) {
              if (i2 < w.toks.length - 1 && w.toks(i2) == a &&
                  w.toks(i2 + 1) == b) { out += merged; i2 += 2 }
              else { out += w.toks(i2); i2 += 1 }
            }
            w.toks = out.toArray
            addPairs(wi, 1L)
            var j2 = 0
            while (j2 < w.toks.length - 1) {
              val k2 = key(w.toks(j2), w.toks(j2 + 1))
              val c2 = pairCount.getOrDefault(k2, 0L)
              if (c2 >= 2L) heap.add((c2, k2))
              j2 += 1
            }
          }
          wi = touched.nextSetBit(wi + 1)
        }
      }
    }
    merges.result()
  }
}

/** string (one word) → array of code-point seed tokens — the
  * distributed trainer's seeding kernel ([[Bpe.seedArray]]).
  */
case class CodePointSeed(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_seed expects string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.seedArray(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.seedArray($c);")
  override def prettyName: String = "bpe_seed"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string (one word) → BPE token count under the INSTALLED trained
  * table ([[Bpe.installTrained]]; fixture until installed). Same
  * compiled kernel as [[BpeCount]], different table slot — the scale
  * measurement path (graft.BpeBench).
  */
case class BpeCountTrained(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count_trained expects string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.countTrained(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.countTrained($c);")
  override def prettyName: String = "bpe_count_trained"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** string (one word) → BPE token count under [[Bpe.Merges]]. */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count expects string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.count($c);")
  override def prettyName: String = "bpe_count"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
