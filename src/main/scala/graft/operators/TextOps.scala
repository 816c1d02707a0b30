package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language ID, quality
  * scoring, token counting, fingerprinting. All narrow per-row column
  * work — no shuffle at all except the output ORDER BY, so they scale
  * linearly with input splits.
  *
  * The scoring formulas are pure rational arithmetic (no exp/log/sin) so
  * the DuckDB oracle reproduces them bit-for-bit: libm transcendentals are
  * the one place two engines can legally differ in the last ulp.
  */
object TextOps {
  import Shared._

  /** q115/q116 fingerprint-sum modulus: 2⁶¹ − 1 (Mersenne prime). The
    * sum accumulates in decimal(38,0) (DuckDB: HUGEINT) — exact to
    * ~10³⁸, so ~10¹⁸ documents of 60-bit hashes before precision is a
    * question — and reduces mod p to a portable BIGINT.
    */
  private[graft] val ManifestModP = 2305843009213693951L

  /** The manifest aggregate shared VERBATIM by q115 (batch), q116 (the
    * streaming twin — parity depends on these staying expression-
    * identical, which is why there is exactly one copy), and their
    * specs. Two complementary order-insensitive fingerprints: bit_xor
    * flips on any odd-multiplicity change but CANCELS even ones (two
    * copies of doc A swapped for two copies of doc B is xor-invisible);
    * the mod-p hash sum shifts by the multiset delta and has no such
    * parity blind spot. Neither is cryptographic — together they make
    * accidental corpus drift detectable, not adversarial tampering.
    */
  private[graft] def manifestAgg(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("n_chars"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))).cast("long").as("n_toks"),
        hash60(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        bit_xor(col("h")).as("fingerprint"),
        (sum(col("h").cast("decimal(38,0)")) % lit(ManifestModP))
          .cast("long").as("fingerprint_sum"))

  /** q123: merge two manifests by the monoid each column was DESIGNED to
    * be (the reason q115 chose these folds): counts/sums add, xor xors,
    * the mod-p sums add mod p (both operands < p = 2⁶¹−1, so the long
    * sum < 2p < 2⁶³ — exact). Full-outer with identity fill: a source
    * seen only in the batch (a brand-new source) or only in the base
    * merges correctly because 0 is each fold's identity.
    */
  private[graft] def mergeManifests(base: DataFrame,
      batch: DataFrame): DataFrame = {
    val b = base.columns.filter(_ != "source")
      .foldLeft(base)((f, c) => f.withColumnRenamed(c, s"b_$c"))
    val n = batch.columns.filter(_ != "source")
      .foldLeft(batch)((f, c) => f.withColumnRenamed(c, s"n_$c"))
    def z(c: String) = coalesce(col(c), lit(0L))
    Shared.fullOuterOnNullable(b, n, "source")
      .select(col("source"),
        (z("b_n_docs") + z("n_n_docs")).as("n_docs"),
        (z("b_n_tokens") + z("n_n_tokens")).as("n_tokens"),
        (z("b_n_chars") + z("n_n_chars")).as("n_chars"),
        z("b_fingerprint").bitwiseXOR(z("n_fingerprint")).as("fingerprint"),
        ((z("b_fingerprint_sum") + z("n_fingerprint_sum"))
          % lit(ManifestModP)).as("fingerprint_sum"))
  }

  /** q153: RETRACT a deleted-docs manifest from a base manifest — the
    * deletion twin of [[mergeManifests]], exact because every q115
    * column is not just a monoid but a GROUP: counts/sums subtract, xor
    * is its own inverse, and the mod-p hash sum subtracts as
    * `(b − g + p) mod p` (both operands < p = 2⁶¹−1, so `b + p < 2⁶³`
    * — no overflow). This is the property that makes takedown cheap at
    * 100 TB: the manifest of a deletion batch is aggregated over the
    * BATCH alone and folded in O(|sources|), never re-scanning the
    * corpus. (Contrast the non-invertible sketches: q138's HLL
    * registers are max-monoids and cannot retract — their deletion
    * story is the rebuild-on-compaction cadence, which is why manifest
    * columns were chosen group-shaped from the start.) A source whose
    * last doc is deleted leaves the manifest (n_docs = 0 filtered),
    * matching the from-scratch aggregate over the survivors.
    */
  private[graft] def retractManifest(base: DataFrame,
      gone: DataFrame): DataFrame = {
    val b = base.columns.filter(_ != "source")
      .foldLeft(base)((f, c) => f.withColumnRenamed(c, s"b_$c"))
    val g = gone.columns.filter(_ != "source")
      .foldLeft(gone)((f, c) => f.withColumnRenamed(c, s"g_$c"))
    def z(c: String) = coalesce(col(c), lit(0L))
    Shared.fullOuterOnNullable(b, g, "source")
      .select(col("source"),
        (z("b_n_docs") - z("g_n_docs")).as("n_docs"),
        (z("b_n_tokens") - z("g_n_tokens")).as("n_tokens"),
        (z("b_n_chars") - z("g_n_chars")).as("n_chars"),
        z("b_fingerprint").bitwiseXOR(z("g_fingerprint")).as("fingerprint"),
        ((z("b_fingerprint_sum") - z("g_fingerprint_sum")
          + lit(ManifestModP)) % lit(ManifestModP)).as("fingerprint_sum"))
      .filter(col("n_docs") > 0)
  }

  /** How many times the q123 base manifest was aggregated this JVM. */
  private[graft] val q123BaseWrites =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** The frozen published manifest: q115's aggregate over the corpus
    * nine-tenths (doc_id % 10 != 0 — the q120/q121/q122 split), staged
    * write-once. |sources| rows.
    */
  private[graft] def q123BaseArtifact(s: SparkSession, d: String): DataFrame =
    Bucketed.writeOnceBucketed(s, Bucketed.dbFor(d), "q123_manifest_base",
      s"$d/documents.parquet",
      {
        q123BaseWrites.incrementAndGet()
        manifestAgg(Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
      }, 1, Seq("source"))

  // ---- q129: incremental contamination-audit state -----------------------

  /** Spec counters: each frozen corpus pass must be paid at most once. */
  private[graft] val q129IndexWrites =
    new java.util.concurrent.atomic.AtomicInteger(0)
  private[graft] val q129TestWrites =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** q61's shingle frame over an arbitrary doc frame — one body for the
    * from-scratch audit, the frozen artifacts, and q129's batch fold, so
    * the three cannot hash different shingles.
    */
  private[graft] def contamShinglesOf(docs: DataFrame): DataFrame = {
    import graft.operators.Shared.hash60
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("toks")) - 4),
          i => hash60(concat_ws(" ", slice(col("toks"), i, lit(5))))))
        .as("sh"))
  }

  /** The exact-integer half-up overlap ratio (q38 lesson), shared by q61
    * and q129's merged readout.
    */
  private def contamRatio: Column =
    expr("(20000 * n_shared + n_shingles) div (2 * n_shingles)" +
      " / 10000.0D").as("overlap_ratio")

  private def q129Corpus(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0)

  /** Frozen train shingle index — distinct 60-bit shingle hashes of the
    * corpus train split, bucketed by hash so delta probes and index
    * appends land bucket-local.
    */
  private[graft] def q129TrainIndexArtifact(s: SparkSession,
      d: String): DataFrame =
    Bucketed.writeOnceBucketed(s, Bucketed.dbFor(d), "q129_train_shingles",
      s"$d/documents.parquet",
      {
        q129IndexWrites.incrementAndGet()
        contamShinglesOf(q129Corpus(s, d).filter(col("doc_id") % 10 < 8))
          .select(explode(col("sh")).as("h")).distinct()
      }, 16, Seq("h"))

  /** Frozen test-side shingle rows (doc_id, n_shingles, h) — the eval set
    * is fixed, so this is written once and probed per batch.
    */
  private[graft] def q129TestShinglesArtifact(s: SparkSession,
      d: String): DataFrame =
    Bucketed.writeOnceBucketed(s, Bucketed.dbFor(d), "q129_test_shingles",
      s"$d/documents.parquet",
      {
        q129TestWrites.incrementAndGet()
        contamShinglesOf(q129Corpus(s, d).filter(col("doc_id") % 10 >= 8))
          .select(col("doc_id"),
            size(col("sh")).cast("long").as("n_shingles"),
            explode(col("sh")).as("h"))
      }, 16, Seq("h"))

  /** The frozen audit itself — q61 over the corpus only, from the two
    * artifacts above (not a third corpus pass).
    */
  private[graft] def q129BaseArtifact(s: SparkSession, d: String): DataFrame =
    Bucketed.writeOnceBucketed(s, Bucketed.dbFor(d), "q129_base_contamination",
      s"$d/documents.parquet",
      q129TestShinglesArtifact(s, d)
        .join(q129TrainIndexArtifact(s, d), Seq("h"))
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(count(lit(1)).as("n_shared")),
      1, Seq("doc_id"))

  /** Marker stopwords per language (n-gram-heuristic language ID). */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "es" -> Seq("el", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est"),
    "zh" -> Seq("的", "是"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t))).cast("long")

  private def sqlCountIn(words: Seq[String]): String =
    s"len(list_filter(toks, t -> list_contains(${words.mkString("['", "', '", "']")}, t)))"

  /** q86 per-source token budget and the salt fan-out of its level-1 cut.
    * More salts = more parallelism on a dominant source AND a larger (but
    * still constant-in-corpus) survivor set; 32 matches the session's
    * shuffle parallelism and would be raised with the cluster.
    */
  private[graft] val TokenBudget = 800L
  private[graft] val BudgetSalts = 32

  /** Per-doc BPE token totals — (doc_id, ws_tokens, bpe_tokens) — via
    * the count-table pattern: tokenize each DISTINCT word once with the
    * compiled `bpe_count` kernel ([[graft.functions.Bpe]]), join the
    * counts back to word occurrences, sum per doc. Shared by q39b and
    * the token-exact packing twin q78b. Unordered; callers sort.
    */
  private[graft] def bpeDocTokens(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val wcnt = words.select(col("w")).distinct()
      .withColumn("bpe", call_function("bpe_count", col("w")))
    words.join(wcnt, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ws_tokens"), sum(col("bpe")).as("bpe_tokens"))
  }

  /** The q84 cleaning verdict as a reusable frame — (doc_id, n_tokens,
    * score, reasons, keep) — consumed by the q84 query itself and by the
    * composed corpus-build pipeline (q93). Unordered; callers sort.
    */
  private[graft] def q84Verdicts(s: SparkSession, d: String): DataFrame =
    q84VerdictsOf(Tables.documents(s, d))

  /** [[q84Verdicts]] over an arbitrary (doc_id, text) frame — the verdict
    * is a pure per-doc function, so q127's incremental scorecard can score
    * an arriving batch alone (O(|batch|)) and reuse frozen corpus verdicts.
    */
  private[graft] def q84VerdictsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val base = docs
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("u", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("st", countIn(col("toks"), markers.head._2))
      .withColumn("mk",
        markers.map { case (_, ws) => countIn(col("toks"), ws) }
          .reduce(_ + _))
    val top2 = base
      .select(col("doc_id"),
        // n >= 2 guard: sequence() DESCENDS when end < start, and the
        // descending [1, 0] would index element_at out of bounds on a
        // 1-token doc (caught by the degenerate-corpus test)
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1), i =>
            concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1))))
          .otherwise(array())).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top2"))
    base.join(top2, Seq("doc_id"), "left")
      .withColumn("top2", coalesce(col("top2"), lit(0L)))
      .withColumn("score", expr(
        "(20000 * (200 * st + 100 * u + n * least(n, 100L)) + 400 * n)" +
          " div (800 * n)"))
      .withColumn("reasons",
        when(col("n") < 20 || col("n") > 95, 1L).otherwise(0L) +
          when(col("score") < 2700, 2L).otherwise(0L) +
          when(col("top2") * 20 > col("n") - 1 ||
            (col("n") - col("u")) * 5 > col("n") * 3, 4L).otherwise(0L) +
          when(col("mk") === 0, 8L).otherwise(0L))
      .select(col("doc_id"), col("n").as("n_tokens"), col("score"),
        col("reasons"),
        // 0/1 long, not boolean: the gate's cross-engine hasher is only
        // exercised on int/double/varchar parquet-output types
        (col("reasons") === 0).cast("long").as("keep"))
  }

  /** DuckDB twin of [[q84Verdicts]] as a CTE chain ending in
    * `r(doc_id, n, score, reasons)` — shared by the q84 oracle and the
    * q93 composed-pipeline oracle. CTE names t/b/g2/t2/sc/r are reserved
    * by this fragment.
    */
  private[graft] lazy val sqlQ84Cte: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents),
       | b AS (SELECT doc_id, len(toks) AS n,
       |    len(list_distinct(toks)) AS u,
       |    ${sqlCountIn(markers.head._2)} AS st,
       |    ${markers.map { case (_, ws) => sqlCountIn(ws) }
              .mkString(" + ")} AS mk
       |  FROM t),
       | g2 AS (SELECT doc_id, unnest(list_transform(
       |     range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g
       |   FROM t),
       | t2 AS (SELECT doc_id, max(c) AS top2
       |   FROM (SELECT doc_id, g, count(*) AS c FROM g2
       |         GROUP BY doc_id, g) GROUP BY doc_id),
       | sc AS (SELECT b.doc_id, n, u, st, mk, COALESCE(top2, 0) AS top2,
       |    (20000 * (200 * st + 100 * u + n * least(n, 100))
       |     + 400 * n) // (800 * n) AS score
       |   FROM b LEFT JOIN t2 ON b.doc_id = t2.doc_id),
       | r AS (SELECT doc_id, n, score,
       |    (CASE WHEN n < 20 OR n > 95 THEN 1 ELSE 0 END
       |     + CASE WHEN score < 2700 THEN 2 ELSE 0 END
       |     + CASE WHEN top2 * 20 > n - 1 OR (n - u) * 5 > n * 3
       |            THEN 4 ELSE 0 END
       |     + CASE WHEN mk = 0 THEN 8 ELSE 0 END) AS reasons
       |   FROM sc)""".stripMargin

  /** q95's exploded bigram stream (one row per adjacent token pair).
    * Factored for [[graft.ScaleProbe]], which tracks the DISTINCT gram
    * count — the q95 shuffle-volume driver (the agg shuffles per-mapper
    * distinct grams, never token occurrences).
    */
  private[graft] def bigramsOf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1)))).as("g"))

  /** q110 core, factored over any (doc_id, text) frame so the spec can
    * prove the gates bite on planted repetitive documents.
    */
  private[graft] def repetitionGatesOver(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("toks", split(col("text"), " "))
    def grams(n: Int): DataFrame = base
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("toks"), i + k)): _*)))
          .as("g"))
    val top2 = grams(2)
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("g"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        (col("c") * length(col("g"))).cast("long").as("top2_chars"))
    val dup5 = grams(5)
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * length(col("g"))).cast("long").as("dup5_chars"))
    base.select(col("doc_id"), col("n_chars"))
      .join(top2, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top2_chars", "dup5_chars"))
      .withColumn("flag_top2", col("top2_chars") * 5 > col("n_chars"))
      .withColumn("flag_dup5", col("dup5_chars") * 20 > col("n_chars") * 3)
      .select(col("doc_id"), col("n_chars"), col("top2_chars"),
        col("dup5_chars"), col("flag_top2"), col("flag_dup5"))
      .orderBy(col("doc_id"))
  }

  /** q86 stage 0: per-doc integer quality score + whitespace-token count
    * (narrow, shuffle-free; the text column is dropped here so everything
    * downstream shuffles id + 3 ints only).
    */
  private[graft] def q86Scored(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("u", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("st", countIn(col("toks"), markers.head._2))
      .withColumn("score", expr(
        "(20000 * (200 * st + 100 * u + n * least(n, 100L)) + 400 * n)" +
          " div (800 * n)"))
      .select(col("doc_id"), col("source"), col("n"), col("score"))

  /** q86 level 1 — the skew-safe pre-cut. Each source is salted into
    * [[BudgetSalts]] sub-partitions (salt = doc_id mod S, any
    * deterministic hash works — the salt never affects the result, only
    * the pruning), and each (source, salt) keeps its rows whose EXCLUSIVE
    * running token sum — under the selection order (score desc, doc_id) —
    * is `< TokenBudget`. This is the full budget per salt, NOT budget/S:
    * a budget/S cut could drop rows the exact trim still needs.
    *
    * Why the survivor set is sufficient for an exact level-2 replay:
    * within one source, a row's salt-mates that precede it are a subset
    * of ALL rows that precede it, so exclusiveSaltCum(x) ≤
    * exclusiveGlobalCum(x). Hence every row with exclusiveGlobalCum <
    * budget survives — and that set P is exactly the prefix the global
    * cut needs: (a) each selected row (inclusiveGlobalCum ≤ budget, so
    * exclusive < budget since tokens ≥ 1) is in P, as is every row
    * preceding it, so the level-2 running sum over survivors equals the
    * true global sum for all of P; (b) any surviving row x beyond P has
    * the whole of P before it in level 2, and inclusiveGlobalCum(last of
    * P) ≥ budget whenever P has a successor (else the successor's
    * exclusive sum would still be < budget, putting it in P) — so x's
    * level-2 sum exceeds the budget and it is correctly dropped.
    *
    * Why the survivor set is bounded: tokens ≥ 1 per row (split() of any
    * string is non-empty), so at most `TokenBudget` rows per (source,
    * salt) have exclusive sum < TokenBudget → survivors ≤ S × budget
    * rows per source, CONSTANT in corpus size. The level-2 bare-source
    * window therefore sorts a few thousand rows per source no matter how
    * many billions the source holds; the unbounded corpus only ever
    * crosses a (source, salt) exchange.
    */
  private[graft] def q86Survivors(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSalt = Window
      .partitionBy(col("source"), col("salt"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("salt", pmod(col("doc_id"), lit(BudgetSalts.toLong)))
      .withColumn("scum", sum(col("n")).over(wSalt))
      .filter(col("scum") - col("n") < TokenBudget)
      .drop("salt", "scum")
  }

  /** q86 level 2 — the exact per-source trim, run only over the
    * budget-bounded survivor set from [[q86Survivors]] (see its proof).
    */
  private[graft] def q86Exact(survivors: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    survivors.withColumn("cum_tokens", sum(col("n")).over(w))
      .filter(col("cum_tokens") <= TokenBudget)
      .select(col("source"), col("doc_id"), col("score"),
        col("n").as("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  // ---- q169/q169b: bigram-LM surprisal filter -----------------------------

  /** Adjacent-bigram rows (doc_id, w1, w2) under the retrieval-family
    * tokenizer — shared by the self-scored q169 and the staged q169b.
    */
  private[graft] def bigramsOf(docs: DataFrame): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ws"))
      .filter(size(col("ws")) > 1)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 2)," +
          " i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** OOV surprisal cap (e4 fixed point): an unseen transition's
    * reciprocal probability is unbounded; 10,000× (1e8 in e4) sits above
    * any seen transition's score while keeping per-doc sums in range.
    */
  private[graft] val Q169OovE4 = 100000000L

  /** Spec counter: q169b's reference LM must train once per tier. */
  private[graft] val q169LmWrites =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** The frozen reference LM: corpus (nine tenths) bigram counts with
    * the prefix total denormalized per row, write-once, w1-bucketed.
    */
  private[graft] def q169LmArtifact(s: SparkSession, d: String): DataFrame =
    Bucketed.writeOnceBucketed(s, Bucketed.dbFor(d), "q169_lm",
      s"$d/documents.parquet", {
        q169LmWrites.incrementAndGet()
        val big = bigramsOf(
          Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
        val cb = big.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("cb"))
        val cp = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
        cb.join(cp, "w1").select(col("w1"), col("w2"), col("cb"), col("cp"))
      }, 8, Seq("w1"))

  /** The q169b serve body over ANY (w1, w2, cb, cp) reference frame —
    * shared by the staged serve and the q169c retracted serve.
    */
  private def lmServe(s: SparkSession, d: String,
      reference: DataFrame): DataFrame = {
    val lm = reference
      .withColumn("r_e4",
        round(col("cp").cast("double") / col("cb") * 10000).cast("long"))
      .select(col("w1"), col("w2"), col("r_e4"))
    bigramsOf(Tables.documents(s, d).filter(col("doc_id") % 10 === 0))
      .join(lm, Seq("w1", "w2"), "left")
      .withColumn("r", coalesce(col("r_e4"), lit(Q169OovE4)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("r_e4").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("r")).as("surprisal_e4"))
      .withColumn("mean_e4", expr("surprisal_e4 div n_bigrams"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q37 — language ID: marker-word scores, argmax with fixed tie order
    "q37_lang_id" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val scored = Tables.documents(s, d)
        .withColumn("toks", toks)
        .select(Seq(col("doc_id"), col("lang")) ++
          markers.map { case (l, ws) => countIn(col("toks"), ws).as(s"s_$l") }: _*)
      // argmax with ties broken by declaration order: a CASE chain where
      // branch l fires iff s_l >= every other score — first true wins.
      val pred = markers.foldRight(lit("und")) { case ((l, _), rest) =>
        val isMax = markers.filter(_._1 != l)
          .map { case (o, _) => col(s"s_$l") >= col(s"s_$o") }
          .reduce(_ && _)
        when(isMax, lit(l)).otherwise(rest)
      }
      scored
        .withColumn("pred_lang", pred)
        .withColumn("correct", (col("pred_lang") === col("lang")).cast("int").cast("long"))
        .select(Seq(col("doc_id"), col("pred_lang"), col("lang"),
          col("correct")) ++ markers.map { case (l, _) => col(s"s_$l") }: _*)
        .orderBy(col("doc_id"))
    }),

    // Q38 — quality score. All ratios and the composite score are EXACT
    // integer arithmetic with explicit half-up rounding at 4dp
    // (`(2·10⁴·N + D) div (2·D)` for N/D ≥ 0): rounding a computed double
    // can land on an exact half-way case — at sf0.1, doc 2259 hits score
    // = 0.31375 and Spark/DuckDB double chains disagree by 1 ulp around
    // it, flipping the 4th decimal. Integer math cannot disagree.
    // score = (2·stop + uniq + min(n,100)/100) / 4 over denominator 400n.
    // q169b — the STAGED LM filter (the production deployment shape):
    // the bigram LM trains ONCE on the frozen corpus (nine tenths, the
    // q120/q157 split convention) into a write-once w1-bucketed table
    // with the prefix total denormalized onto every row (the q152
    // posting-header layout — serving needs no second vocabulary join),
    // and the ARRIVING tenth scores against that frozen reference — the
    // shape a filtering pipeline actually runs (score new crawl against
    // last month's LM), which q169's self-scored form cannot express.
    // The new semantics OOV forces into the open: a transition the
    // reference never saw has reciprocal probability ∞ — capped at
    // [[Q169OovE4]] (10,000× in e4 fixed point, above any seen
    // transition's score) and counted per doc (n_oov is itself the
    // classic quality signal). Oracle replays the split, the left join,
    // and the cap exactly.
    "q169b_lm_filter_staged" -> ((s, d) =>
      lmServe(s, d, q169LmArtifact(s, d))),

    // q169c — LM DELETION: the retraction verb for the 7th staged
    // family. Bigram counts are a group (the q153 manifest algebra), so
    // a takedown retracts EXACTLY: the tombstoned corpus docs' bigram
    // counts (O(|tombstones|) work — the base is never rescanned)
    // subtract from cb AND from the denormalized prefix total cp, rows
    // hitting zero drop, and the batch re-scores against the retracted
    // reference. The oracle is the from-scratch replay over the
    // SURVIVING corpus — retraction == retrain, hash-proven. Audit
    // note: unlike the doc-keyed stores q160 sweeps (labels, postings,
    // codes), an aggregated count store has no per-row doc attribution
    // to count — the takedown invariant IS this count equality, which
    // the oracle checks stronger than any row filter could.
    // q169d — LM INSERTION fold: the arriving tenth's bigram counts fold
    // INTO the frozen reference in O(|batch| + |LM|) — bigram counts are
    // a group (the q123/q153 manifest algebra), so the fold is two
    // full-outer count merges with zero fill: cb adds per (w1, w2), and
    // the denormalized prefix total cp re-joins from the w1-keyed merge
    // of the base's distinct (w1, cp) rows with the batch's prefix
    // increments (a batch bigram under an EXISTING w1 must raise cp on
    // every base row of that prefix, which a row-keyed merge alone
    // cannot see). The corpus is never rescanned; the LM table is
    // vocabulary-bounded (the q169 scale argument), so the fold is
    // vocabulary-sized, not corpus-sized. Completes insert/compact/
    // delete symmetry for the 7th staged family (q169b train-once /
    // q169c retract / fold-forward here). Oracle: from-scratch LM over
    // corpus ∪ batch = ALL documents, scoring the tenth — fold ==
    // retrain, hash-proven. (OOV cannot fire post-fold — every batch
    // transition is now in the LM — and the oracle's n_oov = 0 column
    // proves that too.)
    "q169d_lm_incremental" -> ((s, d) => {
      val base = q169LmArtifact(s, d)
      val bBig = bigramsOf(
        Tables.documents(s, d).filter(col("doc_id") % 10 === 0))
      val bcb = bBig.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("bcb"))
      val bcp = bcb.groupBy(col("w1")).agg(sum(col("bcb")).as("bcp"))
      val cb2 = base.select(col("w1"), col("w2"), col("cb"))
        .join(bcb, Seq("w1", "w2"), "full_outer")
        .select(col("w1"), col("w2"),
          (coalesce(col("cb"), lit(0L)) +
            coalesce(col("bcb"), lit(0L))).as("cb"))
      val cp2 = base.select(col("w1"), col("cp")).distinct()
        .join(bcp, Seq("w1"), "full_outer")
        .select(col("w1"),
          (coalesce(col("cp"), lit(0L)) +
            coalesce(col("bcp"), lit(0L))).as("cp"))
      lmServe(s, d, cb2.join(cp2, "w1"))
    }),

    "q169c_lm_tombstone" -> ((s, d) => {
      val tombs = Dedup.tombstonesOf(Tables.documents(s, d))
      val tBig = bigramsOf(Tables.documents(s, d)
        .filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(tombs), Seq("doc_id"), "left_semi"))
      val tcb = tBig.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("tcb"))
      val tcp = tcb.groupBy(col("w1")).agg(sum(col("tcb")).as("tcp"))
      val retracted = q169LmArtifact(s, d)
        .join(tcb, Seq("w1", "w2"), "left")
        .join(tcp, Seq("w1"), "left")
        .select(col("w1"), col("w2"),
          (col("cb") - coalesce(col("tcb"), lit(0L))).as("cb"),
          (col("cp") - coalesce(col("tcp"), lit(0L))).as("cp"))
        .filter(col("cb") > 0)
      lmServe(s, d, retracted)
    }),

    // q169 — LM SURPRISAL filter: the CCNet/Gopher-class language-model
    // quality gate (docs whose token transitions are improbable under a
    // corpus-trained LM are boilerplate/garbled/foreign — the standard
    // pretraining-corpus filter beside the q38 heuristics). The LM is a
    // corpus-trained bigram model; the statistic is the mean RECIPROCAL
    // transition probability 1/p(w2|w1) = cp(w1)/cb(w1,w2) — a RATIONAL
    // surprisal (log-perplexity's monotone cousin: rank-equivalent per
    // transition), chosen because the suite's oracle contract excludes
    // transcendentals — fixed-pointed per DISTINCT bigram (round 1e4,
    // the scoreE4 pattern) before the integer per-doc sum, so both
    // engines aggregate exact integers in any order. 100-TB posture:
    // the LM is the bigram count table (vocabulary²-bounded, in
    // practice corpus-vocabulary-sized), built with map-side-combined
    // aggs and joined back vocabulary-keyed — the count-table pattern;
    // no corpus-quadratic stage, no driver state. High mean_e4 = keep
    // for inspection / drop for training, the caller's threshold.
    "q169_lm_surprisal" -> ((s, d) => {
      val big = bigramsOf(Tables.documents(s, d))
      val cb = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val cp = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
      val lm = cb.join(cp, "w1")
        .withColumn("r_e4",
          round(col("cp").cast("double") / col("cb") * 10000).cast("long"))
      big.join(lm, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("r_e4")).as("surprisal_e4"))
        .withColumn("mean_e4", expr("surprisal_e4 div n_bigrams"))
        .orderBy(col("doc_id"))
    }),

    "q38_quality_score" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .withColumn("toks", toks)
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("u", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("st", countIn(col("toks"), markers.head._2))
        .select(col("doc_id"), col("n_toks"),
          expr("(20000 * u + n_toks) div (2 * n_toks) / 10000.0D")
            .as("uniq_ratio"),
          expr("(20000 * st + n_toks) div (2 * n_toks) / 10000.0D")
            .as("stop_ratio"),
          expr("""(20000 * (200 * st + 100 * u
                           + n_toks * least(n_toks, 100L))
                  + 400 * n_toks) div (800 * n_toks) / 10000.0D""")
            .as("score"))
        .orderBy(col("doc_id"))
    }),

    // Q39 — token counting: whitespace + BPE-ish regex word count
    "q39_token_count" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          regexp_count(lower(col("text")), lit("[a-z0-9]+")).cast("long")
            .as("word_tokens"),
          length(col("text")).cast("long").as("n_chars"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    // q134 — the DISTRIBUTED half of tokenizer training: weighted
    // vocabulary extraction + the initial character-pair count table —
    // exactly the state [[graft.functions.Bpe.train]]'s greedy loop
    // seeds from. At 100 TB this is the part that must be a Spark job
    // (one corpus scan, one vocabulary-sized shuffle); the merge loop
    // itself is vocabulary-sized driver work over THESE counts, so the
    // operator is the honest seam between cluster and driver. The top
    // row of this table IS the trainer's first merge (spec-pinned
    // against Bpe.train); counts < 2 are dropped because the trainer
    // never merges a pair it cannot see twice. The guard length >= 2
    // matters in BOTH engines: Spark's sequence(1, 0) is a DESCENDING
    // [1, 0], not empty like DuckDB's generate_series.
    "q134_bpe_pair_counts" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(length(col("w")) >= 2)
        .select(col("n"), explode(expr(
          """transform(sequence(1, length(w) - 1),
            |  i -> struct(substring(w, i, 1) AS l,
            |              substring(w, i + 1, 1) AS r))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("l"), col("r"))
    }),

    // q168 — FULLY distributed tokenizer training: q134 built the
    // distributed half (vocabulary + seed pair counts) and handed the
    // merge loop to the driver; q168 closes the loop as the super-step
    // batched-greedy trainer ([[graft.functions.Bpe.trainDistributed]]):
    // per round, ONE distributed pair-count agg over the current
    // tokenization state and ONE distributed merge map, with only the
    // bounded candidate heads on the driver — so training no longer
    // requires the distinct-word table to fit one heap (the 100-TB
    // vocabulary regime: URLs/code identifiers push distinct words into
    // the billions). batch=1 is spec-pinned EQUAL to the sequential
    // greedy trainer; the corpus saturates (~89 merges) inside one
    // batch, so this query's table matches the driver trainer's and the
    // served counts are deterministic. no_oracle by design (a batched
    // training loop has no SQL replay — the q12b class); the gate is
    // TextKernelSpec's equality + agreement asserts.
    "q168_bpe_train_distributed" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      val merges = graft.functions.Bpe.trainDistributed(vocab, 50000)
      graft.functions.Bpe.installTrained(merges)
      vocab.select(col("w"),
          call_function("bpe_count_trained", col("w")).as("n_tokens"),
          col("n"))
        .orderBy(col("w"))
    }),

    // q39b — token counts made TOKENIZER-EXACT: per-doc subword counts
    // under the fixed BPE merge table ([[graft.functions.Bpe]]) beside
    // the whitespace count q39 reports. The count-table pattern keeps it
    // scale-sane: each DISTINCT word is tokenized once by the compiled
    // `bpe_count` kernel (vocabulary-sized work — at 100 TB the
    // vocabulary is millions while token mass is trillions), and the
    // per-occurrence join fans out 1:1 on unique word keys.
    "q39b_bpe_token_count" -> ((s, d) => {
      bpeDocTokens(s, d).orderBy(col("doc_id"))
    }),

    // Q40 — document fingerprinting: md5 + sha256 + min-shingle-hash.
    // Repartition first: single-file input would otherwise run the
    // per-shingle hash fold on one core.
    "q40_fingerprint" -> ((s, d) => {
      val norm = lower(trim(col("text")))
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          md5(norm).as("fp_md5"),
          sha2(norm, 256).as("fp_sha256"),
          coalesce(array_min(transform(shingles3(col("text")),
            s => hash60(s))), lit(-1L)).as("min_shingle_hash"))
        .orderBy(col("doc_id"))
    }),

    // q82 — TF-IDF top-3 terms per document: the corpus-statistics
    // keyword extractor (salient-term readout / filter features). Terms
    // are the q39 word-token contract ([a-z0-9]+ on lowercased text).
    // Ranking is INTEGER-deterministic — tf desc, then rarer term (df
    // asc), then term — so the cut never depends on float rounding; the
    // emitted score keeps this file's transcendental-free contract by
    // using the rational idf core (n_docs+1)/(df+1) instead of its log:
    // same per-tf ordering, bit-identical in both engines (two correctly-
    // rounded IEEE ops). At 100 TB: explode is narrow; tf aggregates on
    // (doc_id, term) with map-side combine; df on term; the scalar doc
    // count broadcasts; the rank filter is the LocalTopK shape (mappers
    // pre-prune below the per-doc window exchange).
    "q82_tfidf_topterms" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = tf.select(countDistinct(col("doc_id")).as("n_docs"))
      tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
        .withColumn("score", round(
          col("tf") * (col("n_docs") + lit(1.0d)) / (col("df") + lit(1.0d)),
          4))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("tf").desc, col("df"), col("term"))).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rk"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // q83 — within-document repetition profile: the Gopher-family
    // repetition quality filter (Rae et al. '21 §A1.1 use character
    // fractions over lines/n-grams; this corpus is single-line
    // whitespace-token text, so the stats are token-based): fraction of
    // tokens that are repeats (1 - distinct/n), fraction of 2-grams
    // taken by the single most frequent 2-gram, fraction of 3-grams
    // occurring more than once. All counts are exact integers aggregated
    // per (doc, gram) with map-side combine — shuffle keys carry the doc
    // id, so the three stat aggs co-partition — and each emitted fraction
    // is ONE correctly-rounded IEEE division, keeping this file's
    // transcendental-free oracle contract. At 100 TB this is the same
    // shape as q82: narrow gram expansion into keyed hash aggs, no
    // quadratic anywhere.
    "q83_repetition" -> ((s, d) => {
      def grams(toks: Column, k: Int): Column =
        when(size(toks) >= k, // sequence() descends when end < start
          transform(sequence(lit(1), size(toks) - (k - 1)), i =>
            concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
          .otherwise(array())
      val base = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      def stat(k: Int): DataFrame = base
        .select(col("doc_id"), explode(grams(col("toks"), k)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(
          sum(col("c")).as(s"n$k"),            // total k-grams
          count(lit(1)).as(s"d$k"),            // distinct k-grams
          max(col("c")).as(s"top$k"),          // most frequent k-gram count
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as(s"dup$k"))
      // LEFT joins: a doc with < k tokens has no k-grams and is absent
      // from stat(k) — it must still be profiled (frac 0.0, no repetition
      // evidence), not silently dropped. Inner joins here lost 1-2-token
      // docs; caught by the degenerate-corpus test.
      stat(1).join(stat(2), Seq("doc_id"), "left")
        .join(stat(3), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n1").as("n_tokens"),
          round((col("n1") - col("d1")).cast("double") / col("n1"), 4)
            .as("dup_token_frac"),
          when(col("n2").isNull, 0.0d)
            .otherwise(round(col("top2").cast("double") / col("n2"), 4))
            .as("top_2gram_frac"),
          when(col("n3").isNull, 0.0d)
            .otherwise(round(col("dup3").cast("double") / col("n3"), 4))
            .as("dup_3gram_frac"))
        .orderBy(col("doc_id"))
    }),

    // q84 — composed keep/drop quality verdict: the materialization a
    // cleaning pipeline runs over the per-doc signals (q37 language
    // evidence, q38 composite score, q83 repetition). Every threshold is
    // an INTEGER comparison — score is q38's exact 4dp integer form,
    // repetition uses cross-multiplied fractions (20·top2 > n2 ⟺
    // top2/n2 > 5%; 5·(n−u) > 3·n ⟺ dup-token frac > 0.6) — so the
    // verdict can never flip on a float ulp. reasons bitmask: 1 = length
    // outside [20,95] tokens, 2 = score < 0.27, 4 = repetitive,
    // 8 = zero language-marker evidence; keep ⟺ reasons = 0. Same scale
    // shape as q82/q83: one narrow pass + one (doc,gram) hash agg joined
    // back on doc_id.
    "q84_quality_filter" -> ((s, d) =>
      q84Verdicts(s, d).orderBy(col("doc_id"))),

    // q86 — token-budgeted selection: the mixture-construction step that
    // fills each source's token budget with its best documents (rank by
    // the q38 integer quality score, cumulative whitespace-token sum,
    // cut at 800 tokens/source). Ordering and the cut are all-integer
    // (score desc, doc_id asc; inclusive running sum ≤ budget) so the
    // selection is bit-stable across engines. Implemented as a TWO-LEVEL
    // cut ([[q86Survivors]]/[[q86Exact]]) so that no window over the
    // unbounded corpus ever partitions by bare `source` — one dominant
    // source at 100 TB would otherwise push billions of rows through a
    // single sort task. Level 1 salts each source into [[BudgetSalts]]
    // sub-partitions and cuts each at the FULL budget; level 2 replays
    // the exact per-source cut over the survivors, whose count is
    // budget-bounded (≤ salts × budget rows/source) regardless of corpus
    // size. Shuffled rows stay narrow throughout (id + 3 ints, not text).
    "q86_token_budget" -> ((s, d) =>
      q86Exact(q86Survivors(q86Scored(Tables.documents(s, d))))),

    // q88 — quality-weighted subsampling: keep each document with
    // probability proportional to its integer quality score (the
    // CCNet/Gopher-style "sample better documents more often" recipe)
    // with ZERO randomness: keep iff an independent salted hash stream's
    // bucket-of-10000 falls below the q38/q86 score, which lives on the
    // same 0..10000 integer scale — so the keep rate IS score/10000 and
    // a re-run (or another engine) selects the identical subset. Pure
    // narrow map over the corpus, no shuffle but the output ORDER BY;
    // the sampling decision needs no coordination at any scale, same
    // contract as q49/q50 ([[Sampling]]).
    "q88_quality_weighted_sample" -> ((s, d) => {
      val scored = q86Scored(Tables.documents(s, d))
      val bucket = pmod(
        hash60(concat(lit("qws|"), col("doc_id").cast("string"))),
        lit(10000))
      scored
        .withColumn("keep_bucket", bucket)
        .filter(col("keep_bucket") < col("score"))
        .select(col("doc_id"), col("source"), col("score"),
          col("keep_bucket"))
        .orderBy(col("doc_id"))
    }),

    // Q72 — text normalization: the standard pre-tokenization cleanup
    // pass (lowercase, strip non-alphanumeric to spaces, collapse runs of
    // whitespace, trim). Pure narrow column work, one codegen'd pass; the
    // md5 of the normalized form doubles as the dedup key a cleaning
    // pipeline would write. Regex classes restricted to ASCII so Java
    // regex and RE2 agree.
    // Q77 — per-language character-trigram profile (top-10 by count):
    // the fingerprint a statistical language-ID model is trained from
    // (Cavnar & Trenkle '94 n-gram text categorization) and the corpus
    // QA readout for mixed-language shards. explode(transform(sequence))
    // emits |text| rows per doc into a hash aggregate — map-side combine
    // collapses to distinct (lang, trigram) before the shuffle — and the
    // top-10 rank filter is exactly the LocalTopK shape, so mappers
    // pre-prune below the window exchange. Integers and strings only:
    // no float rounding anywhere.
    "q77_trigram_profile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tg = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("lang"), lower(col("text")).as("t"))
        .filter(length(col("t")) >= 3)
        .select(col("lang"), explode(expr(
          "transform(sequence(1, char_length(t) - 2), i -> substr(t, i, 3))"))
          .as("tg"))
      tg.groupBy(col("lang"), col("tg")).agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("cnt").desc, col("tg"))))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("rk").cast("long").as("rk"),
          col("tg"), col("cnt"))
        .orderBy(col("lang"), col("rk"))
    }),

    "q72_normalize" -> ((s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len_raw"),
          length(norm).cast("long").as("len_norm"),
          md5(norm).as("norm_md5"))
        .orderBy(col("doc_id"))
    }),

    // Q60 — entity/PII redaction: regexp_replace over the corpus with a
    // match count per document. The term list stands in for the usual
    // email/phone/SSN patterns (this corpus is synthetic word-salad with
    // no digits); the operator — one codegen'd regex pass per row, zero
    // shuffle — is identical whatever the pattern. \b is an ASCII word
    // boundary in both Java regex and RE2, so the engines agree.
    "q60_redact" -> ((s, d) => {
      val pat = "\\b(customer|spark)\\b"
      val red = regexp_replace(col("text"), pat, "<ENT>")
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_count(col("text"), lit(pat)).cast("long").as("n_redacted"),
          md5(red).as("redacted_md5"),
          length(red).cast("long").as("redacted_len"))
        .orderBy(col("doc_id"))
    }),

    // Q67 — portable table checksum: bit_xor of a 60-bit row hash per
    // group. XOR is commutative/associative, so the checksum is
    // independent of row order, partitioning, and partial-aggregation
    // shape — one narrow scan + tiny hash agg at any scale. The row
    // rendering uses only exactly-portable column types (ints, strings,
    // dates; quantity is integral-by-contract) so the same SQL in any
    // engine reproduces the checksum — the cross-system copy-validation
    // primitive of a data pipeline.
    "q67_table_checksum" -> ((s, d) => {
      val row = concat_ws("|",
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        // round() before the long cast: Spark's double->long cast
        // truncates while DuckDB's rounds; an ever-non-integral quantity
        // would flip the whole group checksum otherwise
        col("l_suppkey"), round(col("l_quantity"), 0).cast("long"),
        col("l_returnflag"), col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd"))
      Tables.lineitem(s, d)
        .withColumn("h", hash60(row))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("checksum"))
        .orderBy(col("l_returnflag"))
    }),

    // Q61 — train/test contamination check: 5-token shingles of every test
    // document (doc_id mod 10 in {8,9}) probed against the distinct
    // shingle set of the train split. Shingles are hashed to portable
    // 60-bit longs before the join — at 100 TB the shuffle moves fixed
    // 8-byte keys instead of ~50-byte strings, and the join is a plain
    // hash-partitioned equi-join on the hash (map-side distinct collapses
    // repeated shingles first). Output: contaminated test docs with the
    // overlap count and ratio. n=5 is a tunable; production
    // decontamination typically runs 8-13-gram.
    "q61_contamination" -> ((s, d) => {
      val docs = contamShinglesOf(Tables.documents(s, d))
      val train = docs.filter(col("doc_id") % 10 < 8)
        .select(explode(col("sh")).as("h")).distinct()
      val test = docs.filter(col("doc_id") % 10 >= 8)
        .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
          explode(col("sh")).as("h"))
      test.join(train, "h")
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(count(lit(1)).as("n_shared"))
        // exact integer half-up rounding: small-integer ratios are the
        // class where engine-native double rounding diverges (q38 lesson)
        .select(col("doc_id"), col("n_shingles"), col("n_shared"),
          contamRatio)
        .orderBy(col("doc_id"))
    }),

    // q129 — INCREMENTAL contamination audit: the production direction of
    // q61's check — the eval set is FIXED, the training corpus ingests
    // daily, and the audit must stay current without re-deriving the
    // corpus-wide train shingle set per refresh. The algebra is a set
    // monoid with exact additivity: the fold anti-joins the batch's
    // shingles against the frozen train index, so the new-shingle delta
    // is DISJOINT from the index by construction and every test doc's
    // n_shared' = n_shared + |sh(doc) ∩ delta| — no overlap possible, no
    // double count (a batch re-shipping an already-indexed shingle adds
    // nothing, which the planted spec pins). The correction probes the
    // h-bucketed test shingle table with the delta-bounded new-shingle
    // set; the train corpus is never rescanned. Docs newly contaminated
    // by this batch ENTER via the full-outer merge (their n_shingles
    // carried on the correction side). Oracle = from-scratch q61 over
    // corpus+batch verbatim — maintenance must be invisible.
    "q129_incremental_contamination" -> ((s, d) => {
      val batch = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
      val newH = contamShinglesOf(batch)
        .select(explode(col("sh")).as("h")).distinct()
        .join(q129TrainIndexArtifact(s, d), Seq("h"), "left_anti")
      val corr = q129TestShinglesArtifact(s, d)
        .join(newH, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(first(col("n_shingles")).as("ns_c"),
          count(lit(1)).as("d_shared"))
      q129BaseArtifact(s, d)
        .withColumnRenamed("n_shingles", "ns_b")
        .join(corr, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("ns_b"), col("ns_c")).as("n_shingles"),
          (coalesce(col("n_shared"), lit(0L)) +
            coalesce(col("d_shared"), lit(0L))).as("n_shared"))
        .select(col("doc_id"), col("n_shingles"), col("n_shared"),
          contamRatio)
        .orderBy(col("doc_id"))
    }),

    // q95 — corpus-wide heavy hitters: the top-25 word bigrams by exact
    // count, the "what is this corpus full of" QA readout (boilerplate
    // detection, stop-phrase lists, template discovery). The aggregate is
    // partial+final on the gram key — shuffle volume is DISTINCT grams per
    // mapper, not token count — and the global top-k lowers to
    // TakeOrderedAndProject: 25 rows leave each partition, no global sort
    // ever materializes the full gram table. That pair of properties is
    // the whole 100-TB story: cost is one scan + one bounded shuffle.
    // Ties broken by the gram string so the 25-row cut is deterministic.
    "q95_heavy_hitters" -> ((s, d) =>
      bigramsOf(s, d).groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("g"))
        .limit(25)),

    // q115 — corpus RELEASE MANIFEST: the per-source summary a dataset
    // release ships and a consumer re-verifies before training — doc /
    // token / char totals plus TWO order-insensitive content
    // fingerprints over each document's portable 60-bit text hash (see
    // [[manifestAgg]] for why both: xor flips on odd-multiplicity
    // changes but cancels even ones; the mod-p hash sum covers that
    // parity blind spot). Both folds are commutative+associative
    // (partial+final agg, any partitioning, any row order — same value)
    // and overflow-free (xor by construction, the sum via decimal(38,0)
    // reduced mod 2⁶¹−1) — the cheap practical answer to "is the corpus
    // you trained on the corpus I published?", detecting drift, not
    // adversaries. One scan, one tiny source-keyed hash agg with
    // map-side combine; nothing else.
    "q115_manifest" -> ((s, d) =>
      manifestAgg(Tables.documents(s, d)).orderBy(col("source"))),

    // q153 — manifest RETRACTION: the deletion verb of manifest
    // maintenance (see [[retractManifest]]). The deletion batch shares
    // the q154 tombstone rule, so the whole takedown cycle (labels +
    // manifest) is driven by one deletion set. Base manifest = q115's
    // corpus aggregate; gone = the same aggregate over the tombstoned
    // docs only — O(|batch|) work, corpus never re-read.
    "q153_manifest_retract" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      retractManifest(
        manifestAgg(docs),
        manifestAgg(docs.filter(
          pmod(col("doc_id"), lit(Dedup.TombMod)) === Dedup.TombRes)))
        .orderBy(col("source"))
    }),

    // q123 — INCREMENTAL manifest maintenance: the payoff of q115's
    // design choice. Because every manifest column is a commutative
    // monoid fold (counts add, xor xors, mod-p sums add mod p), folding
    // a new batch into the frozen published manifest is EXACT algebra:
    // aggregate the batch alone (O(|batch|) scan + map-side combine to
    // |sources| rows) and merge per source ([[mergeManifests]]) — the
    // corpus is never re-read. Output provably equals the from-scratch
    // q115 over corpus+batch (the oracle IS that replay); a 100-TB
    // release updates its manifest for the price of the day's increment.
    // The same algebra is why q116's streaming twin can fold forever in
    // |sources| rows of state.
    "q123_incremental_manifest" -> ((s, d) =>
      mergeManifests(
        q123BaseArtifact(s, d),
        manifestAgg(Tables.documents(s, d).filter(col("doc_id") % 10 === 0)))
        .orderBy(col("source"))),

    // q110 — Gopher-style intra-document repetition gates (Rae et al.
    // '21, appendix A1.1: the published removal heuristics for
    // self-repetitive documents — boilerplate, listicles, degenerate
    // generations). Two of the family, in exact integer arithmetic:
    // fraction of characters covered by the MOST FREQUENT word 2-gram
    // (> 0.20 flags) and by DUPLICATED word 5-grams (count > 1, > 0.15
    // flags). Character coverage = occurrences × gram string length
    // (overlaps uncounted — deterministic and engine-portable, where
    // span-union coverage is q91's job). Ties on the top 2-gram break
    // lexicographically.
    //
    // 100-TB posture: the gram explode is token-linear and keyed
    // (doc_id, gram) — partial+final hash agg, no cross-doc fanout; the
    // per-doc top-1 is a rank-1 window LocalTopKPerKey prunes map-side;
    // everything after the aggs is doc_id-keyed joins of narrow rows.
    // No corpus sort, no all-pairs anything.
    "q110_repetition_gates" -> ((s, d) =>
      repetitionGatesOver(Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id")))),

    // q98 — per-source quality calibration: keep each source's top half
    // by quality score WITHOUT sorting the corpus per source. Quality
    // scores are integers on a fixed 0..10000 scale (q38/q86 contract),
    // so the per-source score distribution is an exact HISTOGRAM of at
    // most 10001 rows per source: aggregate (source, score) counts
    // (partial+final, map-side combine), run the descending cumulative
    // sum over that tiny table, pick the k-th-largest score as the
    // cutoff (k = ceil(n/2); "score >= cutoff" keeps the ties at the
    // boundary, so kept >= k — the standard calibration semantics), and
    // broadcast the per-source cutoffs back over the corpus as a filter.
    // A percent_rank() formulation would sort every source's full row
    // set inside one window partition — one task per source at 100 TB;
    // here the only corpus-wide ops are a narrow scan, a hash agg whose
    // output is bounded by sources x 10001, and a broadcast-join filter.
    "q98_source_calibration" -> ((s, d) => {
      val scored = q86Scored(Tables.documents(s, d))
      val hist = scored.groupBy(col("source"), col("score"))
        .agg(count(lit(1)).as("cnt"))
      val wcum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("score").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val cuts = hist
        .withColumn("cum", sum(col("cnt")).over(wcum))
        .withColumn("n_docs",
          sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))))
        .filter(col("cum") >= expr("(n_docs + 1) div 2"))
        .groupBy(col("source"))
        .agg(max(col("score")).as("cutoff"), max(col("n_docs")).as("n_docs"))
      scored.join(broadcast(cuts), "source")
        .filter(col("score") >= col("cutoff"))
        .select(col("doc_id"), col("source"), col("score"), col("cutoff"),
          col("n_docs"))
        .orderBy(col("doc_id"))
    }),

    // q101 — statistical-LM quality proxy: score each document by the
    // corpus-trained bigram model's mean transition likelihood — the
    // cheap stand-in for the perplexity filter (CCNet/KenLM style) every
    // pretraining recipe runs, trained here ON the corpus itself (no
    // external model ships in this container, and self-scoring is the
    // standard boilerplate/outlier detector: template docs score high,
    // token soup scores low).
    //
    // Exactness: no log/exp anywhere (libm is not cross-engine
    // bit-stable) — per bigram g = (w1 w2) the score is the integer MLE
    // ratio (10⁶·c₂(g)) div c₁(w1), and the doc score the integer mean
    // over its bigrams. c₁ counts ALL occurrences of w1 (not just
    // bigram-history positions) — a documented denominator choice that
    // keeps both engines' arithmetic identical and the ranking
    // equivalent. Docs under 2 tokens have no bigrams and are absent,
    // as in any LM scorer.
    //
    // 100-TB posture: the c₁/c₂ count tables are the "trained model" —
    // corpus-level artifacts (vocab- and bigram-vocab-sized) built by
    // one map-side-combined agg each, joined back by key. The per-
    // occurrence join fans out 1:1 (count tables are unique per key), so
    // shuffle is linear in token mass; common-token skew is AQE's
    // skew-join case, and when the vocab fits (it usually does — c₂ is
    // the q95 heavy-hitter table's domain) both sides broadcast.
    "q101_lm_score" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("toks", split(col("text"), " "))
      val grams = toks.filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1)).as("g")))).as("p"))
        .select(col("doc_id"), col("p.w1"), col("p.g"))
      val c2 = grams.groupBy(col("g")).agg(count(lit(1)).as("c2"))
      val c1 = toks.select(explode(col("toks")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      grams.join(c2, "g").join(c1, "w1")
        .withColumn("sg", expr("(1000000 * c2) div c1"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(sg) div count(1)").as("lm_score"))
        .orderBy(col("doc_id"))
    }),

    // q106 — DSIR-style importance selection (Xie et al. '23,
    // arXiv:2302.03169): pick raw-corpus documents that look like a
    // TARGET domain by the ratio of hashed-feature language models —
    // the data-selection recipe behind domain-tuned pretraining mixes.
    // Target here = src0 (the curated tier of the q50 mixture); features
    // = unigrams hashed into 4096 buckets (DSIR's hashing trick — the
    // model is two fixed-width count vectors however large the vocab).
    //
    // Exactness: DSIR's log-importance weight Σ log(p_t(f)/p_r(f)) is
    // replaced by the integer surrogate Σ (10⁶·(ct+1)) div (cr+1) —
    // a per-occurrence scaled likelihood ratio in Laplace-smoothed
    // counts, mean-per-token via integer div (the q101 contract: no
    // libm on either engine). The global normalizer Nt/Nr multiplies
    // every doc identically, so dropping it preserves the ranking the
    // selection consumes.
    //
    // 100-TB posture: the "trained model" is a 4096-row count table per
    // side — two map-side-combined aggs, broadcast back; per-occurrence
    // joins fan out 1:1 and shuffle is linear in token mass. Selection
    // is a global top-N by (score, doc_id) = TakeOrderedAndProject (per-
    // partition top-200, never a corpus sort).
    "q106_dsir_importance" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .withColumn("b", pmod(Shared.hash60(col("w")), lit(4096)))
      val cr = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"))
      val ct = toks.filter(col("source") === "src0")
        .groupBy(col("b")).agg(count(lit(1)).as("ct"))
      toks.join(cr, "b").join(ct, Seq("b"), "left")
        .withColumn("sg",
          expr("(1000000 * (coalesce(ct, 0) + 1)) div (cr + 1)"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_tok"),
          expr("sum(sg) div count(1)").as("dsir_score"))
        .orderBy(col("dsir_score").desc, col("doc_id"))
        .limit(200)
    })
  )

  def oracleSql: Map[String, String] = {
    val scoreCols = markers
      .map { case (l, ws) => s"${sqlCountIn(ws)} AS s_$l" }.mkString(",\n  ")
    // argmax CASE chain, same tie order as the Spark side (first true wins)
    val predCase = markers.map { case (l, _) =>
      val conds = markers.filter(_._1 != l)
        .map { case (o, _) => s"s_$l >= s_$o" }.mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")

    Map(
      "q37_lang_id" ->
        s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
           |           FROM documents),
           |  sc AS (SELECT doc_id, lang,
           |  $scoreCols
           |  FROM t),
           |  p AS (SELECT *, $predCase AS pred_lang FROM sc)
           |SELECT doc_id, pred_lang, lang,
           |  CAST(pred_lang = lang AS BIGINT) AS correct,
           |  ${markers.map { case (l, _) => s"s_$l" }.mkString(", ")}
           |FROM p ORDER BY doc_id""".stripMargin,

      // exact integer half-up rounding, mirroring the Spark side — see
      // the q38 comment in `queries` (double rounding flips at half-way
      // cases like score=0.31375, first seen at sf0.1)
      // q169b: the frozen-reference replay — LM from the nine tenths,
      // batch = the tenth, LEFT join + the OOV cap
      "q169b_lm_filter_staged" ->
        s"""WITH tok AS (SELECT doc_id,
          |     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
          |   FROM documents),
          | bp AS (SELECT doc_id, unnest([{'w1': ws[i], 'w2': ws[i + 1]}
          |     FOR i IN generate_series(1, len(ws) - 1)]) AS p
          |   FROM tok WHERE len(ws) > 1),
          | big AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bp),
          | cb AS (SELECT w1, w2, count(*) AS cb FROM big
          |   WHERE doc_id % 10 <> 0 GROUP BY w1, w2),
          | cp AS (SELECT w1, sum(cb) AS cp FROM cb GROUP BY w1),
          | lm AS (SELECT cb.w1, cb.w2,
          |     CAST(ROUND(cp.cp::DOUBLE / cb.cb * 10000) AS BIGINT) AS r_e4
          |   FROM cb JOIN cp ON cb.w1 = cp.w1),
          | sc AS (SELECT b.doc_id, lm.r_e4,
          |     COALESCE(lm.r_e4, $Q169OovE4) AS r
          |   FROM big b LEFT JOIN lm
          |     ON b.w1 = lm.w1 AND b.w2 = lm.w2
          |   WHERE b.doc_id % 10 = 0)
          |SELECT doc_id, count(*) AS n_bigrams,
          |  CAST(sum(CASE WHEN r_e4 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_oov,
          |  CAST(sum(r) AS BIGINT) AS surprisal_e4,
          |  CAST(sum(r) // count(*) AS BIGINT) AS mean_e4
          |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // q169d: fold == retrain — the identical replay with the LM
      // trained over corpus ∪ batch = ALL documents (no split filter on
      // cb); n_oov is identically zero, which the hash proves too
      "q169d_lm_incremental" ->
        s"""WITH tok AS (SELECT doc_id,
          |     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
          |   FROM documents),
          | bp AS (SELECT doc_id, unnest([{'w1': ws[i], 'w2': ws[i + 1]}
          |     FOR i IN generate_series(1, len(ws) - 1)]) AS p
          |   FROM tok WHERE len(ws) > 1),
          | big AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bp),
          | cb AS (SELECT w1, w2, count(*) AS cb FROM big
          |   GROUP BY w1, w2),
          | cp AS (SELECT w1, sum(cb) AS cp FROM cb GROUP BY w1),
          | lm AS (SELECT cb.w1, cb.w2,
          |     CAST(ROUND(cp.cp::DOUBLE / cb.cb * 10000) AS BIGINT) AS r_e4
          |   FROM cb JOIN cp ON cb.w1 = cp.w1),
          | sc AS (SELECT b.doc_id, lm.r_e4,
          |     COALESCE(lm.r_e4, $Q169OovE4) AS r
          |   FROM big b LEFT JOIN lm
          |     ON b.w1 = lm.w1 AND b.w2 = lm.w2
          |   WHERE b.doc_id % 10 = 0)
          |SELECT doc_id, count(*) AS n_bigrams,
          |  CAST(sum(CASE WHEN r_e4 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_oov,
          |  CAST(sum(r) AS BIGINT) AS surprisal_e4,
          |  CAST(sum(r) // count(*) AS BIGINT) AS mean_e4
          |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // q169c: retraction == retrain — the identical replay with the
      // tombstoned docs excluded from the reference LM's counts
      "q169c_lm_tombstone" ->
        s"""WITH tok AS (SELECT doc_id,
          |     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
          |   FROM documents),
          | bp AS (SELECT doc_id, unnest([{'w1': ws[i], 'w2': ws[i + 1]}
          |     FOR i IN generate_series(1, len(ws) - 1)]) AS p
          |   FROM tok WHERE len(ws) > 1),
          | big AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bp),
          | cb AS (SELECT w1, w2, count(*) AS cb FROM big
          |   WHERE doc_id % 10 <> 0
          |     AND doc_id % ${Dedup.TombMod} <> ${Dedup.TombRes}
          |   GROUP BY w1, w2),
          | cp AS (SELECT w1, sum(cb) AS cp FROM cb GROUP BY w1),
          | lm AS (SELECT cb.w1, cb.w2,
          |     CAST(ROUND(cp.cp::DOUBLE / cb.cb * 10000) AS BIGINT) AS r_e4
          |   FROM cb JOIN cp ON cb.w1 = cp.w1),
          | sc AS (SELECT b.doc_id, lm.r_e4,
          |     COALESCE(lm.r_e4, $Q169OovE4) AS r
          |   FROM big b LEFT JOIN lm
          |     ON b.w1 = lm.w1 AND b.w2 = lm.w2
          |   WHERE b.doc_id % 10 = 0)
          |SELECT doc_id, count(*) AS n_bigrams,
          |  CAST(sum(CASE WHEN r_e4 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_oov,
          |  CAST(sum(r) AS BIGINT) AS surprisal_e4,
          |  CAST(sum(r) // count(*) AS BIGINT) AS mean_e4
          |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // q169: the corpus-bigram LM + per-distinct-bigram fixed-point
      // reciprocal probability, replayed with the identical expression
      // tree (cp::DOUBLE / cb * 10000, ROUND half-up) — integer sums
      // thereafter, order-free
      "q169_lm_surprisal" ->
        """WITH tok AS (SELECT doc_id,
          |     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
          |   FROM documents),
          | bp AS (SELECT doc_id, unnest([{'w1': ws[i], 'w2': ws[i + 1]}
          |     FOR i IN generate_series(1, len(ws) - 1)]) AS p
          |   FROM tok WHERE len(ws) > 1),
          | big AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bp),
          | cb AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
          | cp AS (SELECT w1, sum(cb) AS cp FROM cb GROUP BY w1),
          | lm AS (SELECT cb.w1, cb.w2,
          |     CAST(ROUND(cp.cp::DOUBLE / cb.cb * 10000) AS BIGINT) AS r_e4
          |   FROM cb JOIN cp ON cb.w1 = cp.w1)
          |SELECT big.doc_id, count(*) AS n_bigrams,
          |  CAST(sum(lm.r_e4) AS BIGINT) AS surprisal_e4,
          |  CAST(sum(lm.r_e4) // count(*) AS BIGINT) AS mean_e4
          |FROM big JOIN lm ON big.w1 = lm.w1 AND big.w2 = lm.w2
          |GROUP BY big.doc_id ORDER BY big.doc_id""".stripMargin,

      "q38_quality_score" ->
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |           FROM documents),
           |  m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
           |    CAST(len(list_distinct(toks)) AS BIGINT) AS u,
           |    CAST(${sqlCountIn(markers.head._2)} AS BIGINT) AS st
           |  FROM t)
           |SELECT doc_id, n_toks,
           |  (20000 * u + n_toks) // (2 * n_toks) / 10000.0 AS uniq_ratio,
           |  (20000 * st + n_toks) // (2 * n_toks) / 10000.0 AS stop_ratio,
           |  (20000 * (200 * st + 100 * u + n_toks * least(n_toks, 100))
           |   + 400 * n_toks) // (800 * n_toks) / 10000.0 AS score
           |FROM m ORDER BY doc_id""".stripMargin,

      "q39_token_count" ->
        """SELECT doc_id,
          | len(string_split(text, ' ')) AS ws_tokens,
          | len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word_tokens,
          | length(text) AS n_chars,
          | octet_length(encode(text)) AS n_bytes
          |FROM documents ORDER BY doc_id""".stripMargin,

      // q134: weighted vocab + character-pair sums, replayed with
      // DuckDB's character indexing (w[i] = one code point, matching the
      // Spark side's substring semantics on this corpus)
      "q134_bpe_pair_counts" ->
        """WITH wd AS (SELECT unnest(string_split(text, ' ')) AS w
          |            FROM documents),
          |  dw AS (SELECT w, COUNT(*) AS n FROM wd
          |         WHERE w <> '' GROUP BY w),
          |  pr AS (SELECT w[i] AS l, w[i+1] AS r, n
          |         FROM dw, LATERAL unnest(
          |           generate_series(1, len(w) - 1)) AS g(i)
          |         WHERE len(w) >= 2)
          |SELECT l, r, CAST(SUM(n) AS BIGINT) AS cnt
          |FROM pr GROUP BY l, r HAVING SUM(n) >= 2
          |ORDER BY cnt DESC, l, r""".stripMargin,

      // q39b: the recursive CTE replays the DEFINED merge procedure
      // (lowest-rank leftmost pair per step) over distinct words — same
      // count-table shape as the Spark side
      "q39b_bpe_token_count" ->
        s"""WITH RECURSIVE ${graft.functions.Bpe.sqlBpeCtes}
           |SELECT bw.doc_id, COUNT(*) AS ws_tokens,
           |  CAST(SUM(bcnt.bpe) AS BIGINT) AS bpe_tokens
           |FROM bw JOIN bcnt USING (w)
           |GROUP BY bw.doc_id ORDER BY bw.doc_id""".stripMargin,

      // same association order as the Spark side: (tf * (n+1)) / (df+1) —
      // two correctly-rounded IEEE ops, bit-identical across engines
      "q82_tfidf_topterms" ->
        """WITH tok AS (SELECT doc_id,
          |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          |  FROM documents),
          | tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
          |        GROUP BY doc_id, term),
          | df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
          | n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
          | sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
          |     ROUND(tf.tf * (n.n_docs + 1.0) / (df.df + 1.0), 4) AS score,
          |     row_number() OVER (PARTITION BY tf.doc_id
          |                        ORDER BY tf.tf DESC, df.df, tf.term) AS rk
          |   FROM tf JOIN df USING (term), n)
          |SELECT doc_id, term, tf, df, score, rk FROM sc WHERE rk <= 3
          |ORDER BY doc_id, rk""".stripMargin,

      // k-gram expansion mirrors the Spark side; each fraction is one
      // IEEE division rounded to 4dp (no transcendentals)
      "q83_repetition" ->
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
          |           FROM documents),
          | g1 AS (SELECT doc_id, unnest(toks) AS g FROM t),
          | g2 AS (SELECT doc_id, unnest(list_transform(
          |     range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g
          |   FROM t),
          | g3 AS (SELECT doc_id, unnest(list_transform(
          |     range(1, len(toks) - 1),
          |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
          |   FROM t),
          | s1 AS (SELECT doc_id, sum(c) AS n1, count(*) AS d1
          |   FROM (SELECT doc_id, g, count(*) AS c FROM g1
          |         GROUP BY doc_id, g) GROUP BY doc_id),
          | s2 AS (SELECT doc_id, sum(c) AS n2, max(c) AS top2
          |   FROM (SELECT doc_id, g, count(*) AS c FROM g2
          |         GROUP BY doc_id, g) GROUP BY doc_id),
          | s3 AS (SELECT doc_id, sum(c) AS n3,
          |     COALESCE(sum(c) FILTER (c > 1), 0) AS dup3
          |   FROM (SELECT doc_id, g, count(*) AS c FROM g3
          |         GROUP BY doc_id, g) GROUP BY doc_id)
          |SELECT doc_id, n1::BIGINT AS n_tokens,
          |  ROUND((n1 - d1)::DOUBLE / n1, 4) AS dup_token_frac,
          |  CASE WHEN n2 IS NULL THEN 0.0
          |       ELSE ROUND(top2::DOUBLE / n2, 4) END AS top_2gram_frac,
          |  CASE WHEN n3 IS NULL THEN 0.0
          |       ELSE ROUND(dup3::DOUBLE / n3, 4) END AS dup_3gram_frac
          |FROM s1 LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      // integer thresholds mirrored from the Spark side bit-for-bit
      "q84_quality_filter" ->
        s"""WITH $sqlQ84Cte
           |SELECT doc_id, n::BIGINT AS n_tokens, score::BIGINT AS score,
           |  reasons::BIGINT AS reasons,
           |  (CASE WHEN reasons = 0 THEN 1 ELSE 0 END)::BIGINT AS keep
           |FROM r ORDER BY doc_id""".stripMargin,

      // identical integer ordering + inclusive running sum + cut
      "q86_token_budget" ->
        s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
           |           FROM documents),
           | b AS (SELECT doc_id, source, len(toks) AS n,
           |    len(list_distinct(toks)) AS u,
           |    ${sqlCountIn(markers.head._2)} AS st
           |  FROM t),
           | sc AS (SELECT doc_id, source, n,
           |    (20000 * (200 * st + 100 * u + n * least(n, 100))
           |     + 400 * n) // (800 * n) AS score
           |  FROM b),
           | c AS (SELECT doc_id, source, score, n,
           |    sum(n) OVER (PARTITION BY source
           |                 ORDER BY score DESC, doc_id
           |                 ROWS UNBOUNDED PRECEDING) AS cum
           |   FROM sc)
           |SELECT source, doc_id, score::BIGINT AS score,
           |  n::BIGINT AS n_tokens, cum::BIGINT AS cum_tokens
           |FROM c WHERE cum <= 800 ORDER BY source, cum_tokens""".stripMargin,

      // q88: identical integer score, independent salted hash stream,
      // keep iff bucket < score — row-set equality, not statistics
      "q88_quality_weighted_sample" ->
        s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
           |           FROM documents),
           | b AS (SELECT doc_id, source, len(toks) AS n,
           |    len(list_distinct(toks)) AS u,
           |    ${sqlCountIn(markers.head._2)} AS st
           |  FROM t),
           | sc AS (SELECT doc_id, source,
           |    (20000 * (200 * st + 100 * u + n * least(n, 100))
           |     + 400 * n) // (800 * n) AS score
           |  FROM b),
           | k AS (SELECT doc_id, source, score,
           |    ${sqlHash60("concat('qws|', CAST(doc_id AS VARCHAR))")} % 10000
           |      AS keep_bucket
           |  FROM sc)
           |SELECT doc_id, source, score::BIGINT AS score,
           |  keep_bucket::BIGINT AS keep_bucket
           |FROM k WHERE keep_bucket < score ORDER BY doc_id""".stripMargin,

      "q95_heavy_hitters" ->
        """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
          |  g AS (SELECT unnest(list_transform(range(1, len(toks)),
          |          i -> toks[i] || ' ' || toks[i+1])) AS g
          |        FROM t WHERE len(toks) >= 2)
          |SELECT g, COUNT(*) AS cnt FROM g GROUP BY g
          |ORDER BY cnt DESC, g LIMIT 25""".stripMargin,

      // q115: same portable hash60, same xor fold (bit_xor is exact and
      // order-insensitive in both engines), same HUGEINT-exact mod-p sum
      "q115_manifest" ->
        s"""SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
           |    AS BIGINT) AS n_tokens,
           |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           |  bit_xor(${Shared.sqlHash60("text")}) AS fingerprint,
           |  CAST(SUM(CAST(${Shared.sqlHash60("text")} AS HUGEINT))
           |    % $ManifestModP AS BIGINT) AS fingerprint_sum
           |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      // q153 retracts by the group inverses; the result is provably the
      // manifest of the SURVIVORS, so the oracle is q115's from-scratch
      // replay over documents minus the tombstone set
      "q153_manifest_retract" ->
        s"""SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
           |    AS BIGINT) AS n_tokens,
           |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           |  bit_xor(${Shared.sqlHash60("text")}) AS fingerprint,
           |  CAST(SUM(CAST(${Shared.sqlHash60("text")} AS HUGEINT))
           |    % $ManifestModP AS BIGINT) AS fingerprint_sum
           |FROM documents
           |WHERE doc_id % ${Dedup.TombMod} <> ${Dedup.TombRes}
           |GROUP BY source ORDER BY source""".stripMargin,

      // q123 merges base+batch manifests by their monoids; the result is
      // provably the full-corpus manifest, so the oracle is q115's
      // from-scratch replay over ALL documents
      "q123_incremental_manifest" ->
        s"""SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
           |    AS BIGINT) AS n_tokens,
           |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           |  bit_xor(${Shared.sqlHash60("text")}) AS fingerprint,
           |  CAST(SUM(CAST(${Shared.sqlHash60("text")} AS HUGEINT))
           |    % $ManifestModP AS BIGINT) AS fingerprint_sum
           |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      // q110: same gram construction as q95 (separator-inclusive string
      // length, 1-based token indexing); integer threshold tests so both
      // engines compare exactly
      "q110_repetition_gates" ->
        """WITH t AS (SELECT doc_id, len(text) AS n_chars,
          |             string_split(text, ' ') AS toks FROM documents),
          | g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
          |          i -> toks[i] || ' ' || toks[i+1])) AS g
          |        FROM t WHERE len(toks) >= 2),
          | c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
          | t2 AS (SELECT doc_id, c * len(g) AS top2_chars,
          |          row_number() OVER (PARTITION BY doc_id
          |            ORDER BY c DESC, g) AS rn
          |        FROM c2),
          | g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
          |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          |               || ' ' || toks[i+3] || ' ' || toks[i+4])) AS g
          |        FROM t WHERE len(toks) >= 5),
          | c5 AS (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2),
          | d5 AS (SELECT doc_id, SUM(c * len(g)) AS dup5_chars
          |        FROM c5 WHERE c > 1 GROUP BY doc_id)
          |SELECT t.doc_id, CAST(t.n_chars AS BIGINT) AS n_chars,
          |  CAST(COALESCE(t2.top2_chars, 0) AS BIGINT) AS top2_chars,
          |  CAST(COALESCE(d5.dup5_chars, 0) AS BIGINT) AS dup5_chars,
          |  COALESCE(t2.top2_chars, 0) * 5 > t.n_chars AS flag_top2,
          |  COALESCE(d5.dup5_chars, 0) * 20 > t.n_chars * 3 AS flag_dup5
          |FROM t LEFT JOIN (SELECT * FROM t2 WHERE rn = 1) t2 USING (doc_id)
          |       LEFT JOIN d5 USING (doc_id)
          |ORDER BY t.doc_id""".stripMargin,

      // q98: identical integer score; cutoff = k-th largest score per
      // source (k = ceil(n/2)) from the exact score histogram; keep
      // score >= cutoff (boundary ties kept)
      "q98_source_calibration" ->
        s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
           |           FROM documents),
           | b AS (SELECT doc_id, source, len(toks) AS n,
           |    len(list_distinct(toks)) AS u,
           |    ${sqlCountIn(markers.head._2)} AS st
           |  FROM t),
           | sc AS (SELECT doc_id, source,
           |    (20000 * (200 * st + 100 * u + n * least(n, 100))
           |     + 400 * n) // (800 * n) AS score
           |  FROM b),
           | h AS (SELECT source, score, COUNT(*) AS cnt
           |       FROM sc GROUP BY source, score),
           | c AS (SELECT source, score,
           |    SUM(cnt) OVER (PARTITION BY source ORDER BY score DESC
           |                   ROWS UNBOUNDED PRECEDING) AS cum,
           |    SUM(cnt) OVER (PARTITION BY source) AS n_docs
           |   FROM h),
           | cut AS (SELECT source, MAX(score) AS cutoff,
           |           MAX(n_docs) AS n_docs
           |         FROM c WHERE cum >= (n_docs + 1) // 2
           |         GROUP BY source)
           |SELECT sc.doc_id, sc.source, sc.score::BIGINT AS score,
           |  cut.cutoff::BIGINT AS cutoff, cut.n_docs::BIGINT AS n_docs
           |FROM sc JOIN cut ON sc.source = cut.source
           |WHERE sc.score >= cut.cutoff
           |ORDER BY sc.doc_id""".stripMargin,

      // q101: identical integer MLE ratios; the only casts are the
      // HUGEINT→BIGINT narrowings DuckDB's SUM forces
      "q101_lm_score" ->
        """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
          |            FROM documents),
          | grams AS (SELECT doc_id,
          |     unnest(list_transform(range(1, len(toks)),
          |       i -> struct_pack(w1 := toks[i],
          |                        g := toks[i] || ' ' || toks[i+1]))) AS p
          |   FROM tk WHERE len(toks) >= 2),
          | ge AS (SELECT doc_id, p.w1 AS w1, p.g AS g FROM grams),
          | c2 AS (SELECT g, COUNT(*) AS c2 FROM ge GROUP BY g),
          | c1 AS (SELECT w1, COUNT(*) AS c1
          |        FROM (SELECT unnest(toks) AS w1 FROM tk) GROUP BY w1)
          |SELECT doc_id, COUNT(*) AS n_bigrams,
          |  CAST(SUM((1000000 * c2.c2) // c1.c1) AS BIGINT) // COUNT(*)
          |    AS lm_score
          |FROM ge JOIN c2 USING (g) JOIN c1 USING (w1)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // q106: same hashed-bucket count tables and integer ratio; the
      // LIMIT's (score desc, doc_id) order is total, so the top-200 SET
      // is deterministic on both engines
      "q106_dsir_importance" ->
        s"""WITH t AS (SELECT doc_id, source,
           |      unnest(string_split(text, ' ')) AS w
           |    FROM documents),
           | tb AS (SELECT doc_id, source,
           |      ${sqlHash60("w")} % 4096 AS b FROM t),
           | cr AS (SELECT b, COUNT(*) AS cr FROM tb GROUP BY b),
           | ct AS (SELECT b, COUNT(*) AS ct FROM tb
           |        WHERE source = 'src0' GROUP BY b),
           | sg AS (SELECT tb.doc_id, tb.source,
           |      (1000000 * (COALESCE(ct.ct, 0) + 1)) // (cr.cr + 1) AS sg
           |    FROM tb JOIN cr USING (b) LEFT JOIN ct USING (b))
           |SELECT doc_id, source, COUNT(*) AS n_tok,
           |  CAST(SUM(sg) AS BIGINT) // COUNT(*) AS dsir_score
           |FROM sg GROUP BY doc_id, source
           |ORDER BY dsir_score DESC, doc_id LIMIT 200""".stripMargin,

      "q40_fingerprint" ->
        s"""WITH s AS ($sqlShingles3),
           |  d AS (SELECT doc_id, md5(lower(trim(text))) AS fp_md5,
           |          sha256(lower(trim(text))) AS fp_sha256
           |        FROM documents)
           |SELECT d.doc_id, d.fp_md5, d.fp_sha256,
           |  COALESCE(list_min([${sqlHash60("x")} FOR x IN s.sh]), -1)
           |    AS min_shingle_hash
           |FROM d LEFT JOIN s ON d.doc_id = s.doc_id
           |ORDER BY d.doc_id""".stripMargin,

      "q77_trigram_profile" ->
        """WITH tg AS (
          |    SELECT lang,
          |      unnest([t[i:i+2] FOR i IN generate_series(1, len(t) - 2)])
          |        AS tg
          |    FROM (SELECT lang, lower(text) AS t FROM documents)
          |    WHERE len(t) >= 3),
          |  c AS (SELECT lang, tg, COUNT(*) AS cnt FROM tg GROUP BY 1, 2),
          |  r AS (SELECT lang, tg, cnt,
          |          ROW_NUMBER() OVER (PARTITION BY lang
          |            ORDER BY cnt DESC, tg) AS rk
          |        FROM c)
          |SELECT lang, rk, tg, cnt FROM r WHERE rk <= 10
          |ORDER BY lang, rk""".stripMargin,

      "q72_normalize" ->
        """SELECT doc_id, length(text) AS len_raw,
          | length(trim(regexp_replace(regexp_replace(lower(text),
          |   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS len_norm,
          | md5(trim(regexp_replace(regexp_replace(lower(text),
          |   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q60_redact" ->
        """SELECT doc_id,
          | len(regexp_extract_all(text, '\b(customer|spark)\b'))
          |   AS n_redacted,
          | md5(regexp_replace(text, '\b(customer|spark)\b', '<ENT>', 'g'))
          |   AS redacted_md5,
          | length(regexp_replace(text, '\b(customer|spark)\b', '<ENT>', 'g'))
          |   AS redacted_len
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q67_table_checksum" ->
        s"""SELECT l_returnflag, COUNT(*) AS n,
           |  bit_xor(${sqlHash60(
              "concat_ws('|', l_orderkey, l_linenumber, l_partkey, " +
              "l_suppkey, CAST(ROUND(l_quantity) AS BIGINT), l_returnflag, " +
              "l_linestatus, strftime(l_shipdate, '%Y-%m-%d'))")})
           |    AS checksum
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin,

      "q61_contamination" -> sqlQ61,

      // q129: incremental maintenance must be invisible — from-scratch
      // q61 over corpus+batch, verbatim
      "q129_incremental_contamination" -> sqlQ61
    )
  }

  /** The q61 audit oracle — shared verbatim with q129, whose incremental
    * maintenance must be invisible against it.
    */
  private lazy val sqlQ61: String = {
    import graft.operators.Shared.sqlHash60
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents),
       |  sh AS (SELECT doc_id, list_distinct(
       |           [${sqlHash60("array_to_string(toks[i:i+4], ' ')")}
       |            FOR i IN generate_series(1, len(toks)-4)]) AS sh
       |         FROM d WHERE len(toks) >= 5),
       |  train AS (SELECT DISTINCT unnest(sh) AS h FROM sh
       |            WHERE doc_id % 10 < 8),
       |  test AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS h
       |           FROM sh WHERE doc_id % 10 >= 8)
       |SELECT t.doc_id, t.n_shingles, COUNT(*) AS n_shared,
       |  (20000 * COUNT(*) + t.n_shingles) // (2 * t.n_shingles)
       |    / 10000.0 AS overlap_ratio
       |FROM test t JOIN train USING (h)
       |GROUP BY t.doc_id, t.n_shingles
       |ORDER BY t.doc_id""".stripMargin
  }
}
