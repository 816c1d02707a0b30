package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data sampling operators: deterministic hash-based splitting
  * and weighted mixture sampling over the `documents` table.
  *
  * Both derive every decision from [[Shared.hash60]] of the document id —
  * never from `rand()` or row position. That is the only splitting scheme
  * that survives 100 TB: it is reproducible across runs and engines,
  * needs no coordination (each row decides locally — a narrow map with no
  * shuffle), is stable under repartitioning/backfill (a re-run assigns
  * every document to the same split), and sidesteps the classic
  * TABLESAMPLE trap where the sample changes with the scan's split
  * layout. The DuckDB oracle computes the identical assignment, so the
  * checks are exact row-set equality, not statistical.
  */
object Sampling {
  import Q._
  import Shared.{hash60, sqlHash60}

  /** Per-mille keep-threshold by source tier for Q50: curated low-index
    * sources (src0-src4) keep 90%, mid-tier half, the tail 20% — the
    * "mixture weights" knob of a pretraining data recipe.
    */
  private def tierPermille(srcNum: Column): Column =
    when(srcNum < 5, 900).when(srcNum < 10, 500).otherwise(200)

  /** q114 shard count — the number of contiguous curriculum buckets. */
  private[graft] val CurriculumShards = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q49 — train/val/test split: hash bucket 0-99 → 80/10/10. The
    // aggregate proves the assignment (counts + chars per split × lang);
    // the assignment expression itself is the operator a pipeline reuses
    // as `withColumn("split", ...)`.
    "q49_hash_split" -> ((s, d) => {
      val bucket = pmod(hash60(col("doc_id").cast("string")), lit(100))
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise(lit("test")))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"), col("lang"))
    }),

    // Q50 — weighted mixture sampling: per-source keep rates applied via
    // an independent hash stream (salted "mix|" prefix so the sampling
    // decision is uncorrelated with the q49 split assignment). Row-level
    // output: both engines must select the IDENTICAL document subset.
    "q50_mixture_sample" -> ((s, d) => {
      val srcNum = regexp_replace(col("source"), "^src", "").cast("int")
      val bucket =
        pmod(hash60(concat(lit("mix|"), col("doc_id").cast("string"))),
          lit(1000))
      Tables.documents(s, d)
        .withColumn("keep", bucket < tierPermille(srcNum))
        .filter(col("keep"))
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Q74 — stratified cap: at most K documents per source, chosen by
    // deterministic hash order (class-balancing / per-domain caps in a
    // data recipe). The rank filter is the idiom the custom LocalTopK
    // rule rewrites: each mapper pre-prunes to its local top-K per
    // source BELOW the window exchange, so the shuffle carries
    // O(sources × K) rows instead of the whole table — the difference
    // between sampling 100 TB and shuffling 100 TB (plan-asserted in
    // PlanSpec).
    "q74_stratified_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ord = hash60(concat(lit("cap|"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("source"))
        .orderBy(ord, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy(col("source"), col("rn"))
    }),

    // q92 — deterministic training-order sharding: the "global shuffle"
    // a pipeline runs LAST, so the training loader reads examples in a
    // reproducible pseudo-random order. Each doc hashes (salted stream,
    // independent of the q49/q50 decisions) to a shard = hash mod K and
    // a position = rank of the hash within the shard. No global sort:
    // shard assignment is a narrow map, and each shard orders
    // independently — at 100 TB, K is thousands (shards sized to the
    // loader's file target), so the per-shard sort is the parallel unit
    // and the whole corpus never passes through one range partitioner.
    // Hash-ordering within the shard is exactly the order a re-run,
    // a backfill, or a different engine reproduces bit-for-bit —
    // `ORDER BY rand()` reproduces nothing and TABLESAMPLE depends on
    // split layout. K=8 here so the testdata exercises multi-row shards.
    "q92_train_order" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("k"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          hash60(concat(lit("ord|"), col("doc_id").cast("string"))).as("k"))
        .withColumn("shard", pmod(col("k"), lit(8)).cast("long"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    }),

    // q100 — temperature-scaled source mixture (α-sampling, the
    // multilingual/multi-source rebalancing recipe of XLM-R / mBERT
    // lineage, α = 0.5): sample source s at a rate ∝ n_s^α / n_s, so
    // high-resource sources are down-weighted and the tail up-weighted
    // relative to natural proportions. q50's fixed per-tier rates are
    // the hand-tuned knob; this derives the rates from the corpus itself.
    //
    // Exactness: w_s = floor(sqrt(n_s)) — IEEE-754 sqrt is correctly
    // rounded in both engines, so the floor is bit-deterministic (the
    // reason α is 1/2 and not an ln/exp-powered float). Expected sample
    // size T = 200: keep rate r_s = min(1, T·w_s / (W·n_s)) with
    // W = Σw_s, applied per doc as the integer test
    // u·W·n_s < T·w_s·10⁶ over an independent salted hash stream
    // u ∈ [0, 10⁶). The left side is evaluated in decimal(38,0) (DuckDB:
    // HUGEINT) because at 100-TB scale it exceeds int64 — u~10⁶ ×
    // W~10⁷ × n_s~10¹⁰ ≈ 10²³, which int64 would wrap silently in Spark
    // while DuckDB errors; 38-digit decimal is exact to 10³⁸ and the
    // product is integer-valued, so both engines stay bit-deterministic.
    //
    // 100-TB posture: one tiny per-source count agg (map-side combined),
    // a sources-row rate table broadcast back, and a narrow filter — the
    // corpus is scanned once and never shuffled.
    "q100_alpha_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rates = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_s"))
        .withColumn("w_s", floor(sqrt(col("n_s").cast("double"))).cast("long"))
        .withColumn("w_tot", sum(col("w_s")).over(Window.partitionBy()))
      val u = pmod(
        hash60(concat(lit("alpha|"), col("doc_id").cast("string"))),
        lit(1000000L))
      Tables.documents(s, d)
        .join(broadcast(rates), "source")
        .filter(u.cast("decimal(38,0)") * col("w_tot") * col("n_s") <
          lit(200L) * col("w_s") * lit(1000000L))
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // q114 — CURRICULUM SHARDING: assign every document an exact global
    // rank by a quality score (descending) and cut the ranked corpus
    // into [[CurriculumShards]] contiguous shards — the "easy/clean
    // first" ordered-training prep. The interesting part is HOW the
    // rank is computed at scale: a global row_number() is an
    // unpartitioned window (single task — the one shape this codebase
    // bans), so the rank is built as a distributed COUNTING SORT over
    // the bounded score domain:
    //
    //   1. score = distinct-token count — integer, domain bounded by
    //      vocabulary/doc length (~hundreds), computed in the scan
    //      projection (array_distinct, no shuffle);
    //   2. per-(score, salt) counts, salt = doc_id % 16 — a tiny
    //      aggregate (|domain| × 16 rows);
    //   3. exclusive prefix offsets over that TINY frame ordered by the
    //      global curriculum order (score DESC, salt) — a single-task
    //      window over the score DOMAIN, not the corpus;
    //   4. row_number within (score, salt) — partitioned window whose
    //      partitions are corpus/(|domain|·16), the salt keeping any
    //      popular score from concentrating in one task;
    //   5. rank = offset + within-rank; shard = (rank-1)·S div n.
    //
    // The tie-break order is (score DESC, salt, doc_id): the salt
    // participates in the global order BY DESIGN — within equal scores
    // any total order is curriculum-equivalent, and this one is what
    // makes step 4 shuffle-skew-free. Deterministic end to end; the
    // oracle replays the identical order as one row_number.
    "q114_curriculum_shard" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val S = CurriculumShards
      val scored = Tables.documents(s, d)
        .select(col("doc_id"),
          size(array_distinct(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0)))).cast("long").as("score"))
        .withColumn("salt", pmod(col("doc_id"), lit(16L)))
      val counts = scored.groupBy(col("score"), col("salt"))
        .agg(count(lit(1)).as("cnt"))
      val offsets = counts
        .withColumn("off",
          coalesce(sum(col("cnt")).over(
            Window.orderBy(col("score").desc, col("salt"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("score"), col("salt"), col("off"))
      val n = scored.select(count(lit(1)).as("n"))
      scored
        .join(broadcast(offsets), Seq("score", "salt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("score"), col("salt"))
            .orderBy(col("doc_id"))).cast("long"))
        .withColumn("rank", col("off") + col("rn"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("score"), col("rank"), {
          // exact integer floor-div: `/` on longs is DOUBLE division in
          // Spark while the oracle's `//` is exact — a double is only
          // trustworthy to ~2^52 and the operator's contract is exact
          // arithmetic at ANY corpus size. Naive decimal division is no
          // better (Spark rounds the quotient HALF_UP at scale 6, which
          // flips floor() once n reaches ~2e6), so make the division
          // itself exact: subtract the remainder first, then divide —
          // the quotient is integral, so scale-6 rounding is a no-op.
          // Product via decimal(38,0), the q50 HUGEINT-parity pattern.
          val p = ((col("rank").cast("decimal(38,0)") - 1) * S)
          ((p - pmod(p, col("n"))) / col("n")).cast("long").as("shard")
        })
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q49_hash_split" ->
      s"""SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM (SELECT lang, n_chars,
         |        ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 AS b
         |      FROM documents)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q50_mixture_sample" ->
      s"""SELECT doc_id, source, lang, n_chars
         |FROM (SELECT *,
         |        CAST(regexp_replace(source, '^src', '') AS INT) AS sn,
         |        ${sqlHash60("concat('mix|', CAST(doc_id AS VARCHAR))")} % 1000 AS b
         |      FROM documents)
         |WHERE b < (CASE WHEN sn < 5 THEN 900 WHEN sn < 10 THEN 500
         |           ELSE 200 END)
         |ORDER BY doc_id""".stripMargin,

    "q74_stratified_cap" ->
      s"""SELECT doc_id, source, rn
         |FROM (SELECT doc_id, source,
         |        CAST(row_number() OVER (PARTITION BY source
         |          ORDER BY ${sqlHash60("concat('cap|', CAST(doc_id AS VARCHAR))")},
         |            doc_id) AS BIGINT) AS rn
         |      FROM documents)
         |WHERE rn <= 10
         |ORDER BY source, rn""".stripMargin,

    "q92_train_order" ->
      s"""SELECT doc_id, k % 8 AS shard,
         |  CAST(row_number() OVER (PARTITION BY k % 8
         |    ORDER BY k, doc_id) AS BIGINT) AS pos
         |FROM (SELECT doc_id,
         |        ${sqlHash60("concat('ord|', CAST(doc_id AS VARCHAR))")} AS k
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q100_alpha_sample" ->
      s"""WITH ws AS (SELECT source, COUNT(*) AS n_s,
         |    CAST(floor(sqrt(COUNT(*)::DOUBLE)) AS BIGINT) AS w_s
         |  FROM documents GROUP BY source),
         | wt AS (SELECT *, SUM(w_s) OVER () AS w_tot FROM ws)
         |SELECT d.doc_id, d.source, d.lang
         |FROM documents d JOIN wt USING (source)
         |WHERE CAST(${sqlHash60("concat('alpha|', CAST(doc_id AS VARCHAR))")}
         |    % 1000000 AS HUGEINT) * wt.w_tot * wt.n_s
         |  < 200 * wt.w_s * 1000000
         |ORDER BY d.doc_id""".stripMargin,

    // q114: the counting-sort rank collapses to ONE row_number over the
    // identical total order (score DESC, salt, doc_id) — the oracle
    // proves the distributed two-level construction equals the global
    // window it replaces.
    "q114_curriculum_shard" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(list_distinct(
         |      regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
         |      AS score
         |  FROM documents),
         | n AS (SELECT COUNT(*) AS n FROM t),
         | r AS (SELECT doc_id, score,
         |    CAST(row_number() OVER (
         |      ORDER BY score DESC, doc_id % 16, doc_id) AS BIGINT)
         |      AS rank
         |   FROM t)
         |SELECT doc_id, score, rank,
         |  CAST((rank - 1) * $CurriculumShards // n AS BIGINT) AS shard
         |FROM r, n ORDER BY doc_id""".stripMargin
  )
}
