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

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "|" + b, i) }
    m
  }

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
  def tokenize(word: String): Array[String] = {
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
        val r = rank.get(toks(j) + "|" + toks(j + 1))
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

  /** Codegen entry: BPE token count of one word. */
  def count(word: UTF8String): Long = tokenize(word.toString).length.toLong
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
