package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Portable mergeable sketches as DATA — the distinct-count and frequency
  * scale paths made exact-hash-checkable.
  *
  * The engine-native sketches (q12b approx_count_distinct, q44b
  * approx_percentile) are correct scale answers but their estimates are
  * engine-specific, so they are the inventory's only rows without a DuckDB
  * oracle. This family closes that gap for the two sketch shapes whose
  * internals are pure integer arithmetic: the sketch STATE ITSELF (HLL
  * register table, Count-Min counter table) is computed from the portable
  * 60-bit md5 hash ([[Shared.hash60]]) and is therefore bit-identical in
  * both engines — the oracle hash-checks the registers, not a float
  * estimate. The float readout (harmonic-mean estimate) stays out of the
  * oracle contract and is tolerance-asserted in SketchSpec against exact
  * counts.
  *
  * Why this matters at 100 TB: distinct counts and frequency tables over
  * 100 TB are ALWAYS served from mergeable sketch state, not exact
  * re-aggregation. Both shapes here are commutative monoids — HLL registers
  * merge by per-cell max, CMS counters by per-cell sum — so (a) Spark's
  * partial+final hash aggregate computes them in one scan with map-side
  * combine and register/counter-bounded shuffle (never row-bounded), and
  * (b) a frozen published sketch folds a new batch in O(|batch| + |sketch|)
  * without re-reading the corpus (q139), the exact algebra q123 proved for
  * the manifest monoids.
  *
  * Reference scope note: the reference (a syslog→Kafka ingest pipeline,
  * `/root/reference/syslog/syslog_producer.go`) has no analytics surface;
  * these operators extend the declared training-pipeline inventory
  * (SURVEY §2.3 extensions).
  */
object Sketches {

  /** HLL precision: p=12 → 4096 registers, ~1.6% standard error. */
  private[graft] val HllP = 12
  private[graft] val HllM = 1 << HllP // 4096
  /** hash60 is 60 bits; after the 12 index bits, w has 48 bits, so
    * rho(w) = leading-zeros(w)+1 = 49 - bitlength(w), and rho = 49 for the
    * (probability 2^-48) all-zero suffix.
    */
  private[graft] val HllRhoMax = 61 - HllP // 49

  /** CMS geometry: d=4 rows x w=1024 counters (eps=2e/w ~ 0.5% of mass). */
  private[graft] val CmsRows = 4
  private[graft] val CmsW = 1024

  /** HLL register table of `keyStr` grouped by `grp`: one row per
    * (group, register index) with the max rho observed. Pure integer
    * arithmetic over [[Shared.hash60]]:
    *   idx = h mod 2^p, w = h >> p, rho = 49 - bitlength(w)  (49 if w=0).
    * bitlength is the length of the unpadded binary string — Spark
    * `conv(w,10,2)` and DuckDB `bin(w)` render it identically.
    */
  private[graft] def hllRegisters(df: DataFrame, grp: String,
      keyStr: org.apache.spark.sql.Column): DataFrame = {
    val h = Shared.hash60(keyStr)
    val w = shiftright(h, HllP)
    val rho = when(w === 0L, lit(HllRhoMax))
      .otherwise(lit(HllRhoMax) - length(conv(w, 10, 2)))
    df.select(col(grp), pmod(h, lit(HllM.toLong)).as("idx"), rho.as("rho"))
      .groupBy(col(grp), col("idx"))
      .agg(max(col("rho")).cast("long").as("maxrho"))
  }

  /** DuckDB twin of [[hllRegisters]] as a SQL snippet: registers of
    * expression `x` (a VARCHAR), with group expression `grpExpr` emitted
    * as column `grpOut`, over `from`.
    */
  private[graft] def sqlHllRegisters(grpOut: String, grpExpr: String,
      x: String, from: String): String =
    s"""WITH h AS (SELECT $grpExpr AS $grpOut, ${Shared.sqlHash60(x)} AS h
       |           FROM $from)
       |SELECT $grpOut, h % $HllM AS idx,
       |  CAST(MAX(CASE WHEN h // $HllM = 0 THEN $HllRhoMax
       |       ELSE $HllRhoMax - length(bin(h // $HllM)) END) AS BIGINT)
       |    AS maxrho
       |FROM h GROUP BY $grpOut, idx""".stripMargin

  /** Driver-side HLL readout for specs: the standard HLL estimate (with
    * the small-range linear-counting correction) from a register table.
    * Never part of a query plan — registers are the data contract.
    */
  private[graft] def hllEstimate(regs: Seq[(Long, Long)]): Double = {
    val m = HllM.toDouble
    val filled = regs.size
    val zeros = m - filled
    val sum = regs.map { case (_, r) => math.pow(2.0, -r.toDouble) }.sum +
      zeros * 1.0
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else e
  }

  /** Per-doc-source distinct-text register aggregate over a documents
    * frame — the unit both q139's base artifact and its batch fold share,
    * so fold-equals-from-scratch is algebra, not coincidence.
    */
  private[graft] def docRegisters(docs: DataFrame): DataFrame =
    hllRegisters(docs, "source", col("text"))

  /** Spec counter: the q139 corpus pass must be paid at most once. */
  private[graft] val q139BaseWrites =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Frozen corpus register store for q139 (sources x <=4096 rows, tiny),
    * bucketed by source like the other staged per-source artifacts.
    */
  private[graft] def q139BaseArtifact(s: SparkSession, d: String): DataFrame =
    Bucketed.writeOnceBucketed(s, Bucketed.dbFor(d), "q139_reg_base",
      s"$d/documents.parquet",
      {
        q139BaseWrites.incrementAndGet()
        docRegisters(Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
      }, 1, Seq("source"))

  /** Merge register tables: registers are a (max, per (source, idx)) monoid,
    * so the merge is union + re-aggregate — register-bounded, never
    * corpus-bounded. Null-safe on source via the group key itself (groupBy
    * folds nulls into one group, matching SQL GROUP BY).
    */
  private[graft] def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("source"), col("idx"))
      .agg(max(col("maxrho")).as("maxrho"))

  /** CMS counter table over a word-bigram COUNT TABLE (g, cnt): d
    * independent portable hash rows (seeded by row index), w counters
    * each. Counter = exact occurrence sum per (row, idx) — pure integers,
    * so the whole sketch state hash-checks. The cell explode runs over
    * the VOCABULARY (4 structs per DISTINCT gram, counts summed), never
    * the token stream — the count-table pattern that keeps the build
    * vocabulary-sized at 100 TB (the q141b plan spec asserts it).
    */
  private[graft] def cmsCounters(gramCounts: DataFrame): DataFrame = {
    val rows = (0 until CmsRows).map { r =>
      struct(lit(r.toLong).as("row"),
        pmod(Shared.hash60(concat(lit(s"cms$r:"), col("g"))),
          lit(CmsW.toLong)).as("idx"))
    }
    gramCounts.select(col("cnt"), explode(array(rows: _*)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.idx").as("idx"))
      .agg(sum(col("cnt")).as("c"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q138 — HLL register table, exact-checkable: the distinct-count
    // sketch q12b answers with an engine-specific estimate, rebuilt here
    // from portable arithmetic so the DuckDB oracle hash-checks the full
    // register state (3 groups x <=4096 rows). The estimate derived from
    // these registers is asserted within tolerance of the exact q12
    // counts in SketchSpec — the float readout is deliberately NOT a
    // column (libm is not cross-engine bit-stable; the state is).
    // 100-TB posture: one scan, partial+final agg keyed (group, idx) —
    // shuffle bounded by groups x 4096 rows regardless of row count, and
    // the register table is the mergeable artifact a fleet of 1000
    // executors (or 30 daily corpus snapshots) max-folds without ever
    // exchanging raw keys.
    "q138_hll_registers" -> ((s, d) =>
      hllRegisters(
        Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
          col("l_partkey")),
        "flag", col("l_partkey").cast("string"))
        .orderBy(col("flag"), col("idx"))),

    // q139 — INCREMENTAL distinct maintenance: q123's fold-don't-rescan
    // algebra applied to the HLL register monoid. The frozen corpus
    // (doc_id % 10 != 0) register store is a staged write-once artifact;
    // the day's batch (doc_id % 10 = 0) is aggregated alone —
    // O(|batch|) scan — and max-merged per (source, idx). The oracle is
    // the FROM-SCRATCH register table over all documents, so
    // fold(base) + merge(batch) = rebuild(corpus+batch) is hash-proven,
    // not asserted: the 100-TB deployment updates its published distinct
    // counts for the price of the increment.
    "q139_incremental_distinct" -> ((s, d) =>
      mergeRegisters(
        q139BaseArtifact(s, d),
        docRegisters(Tables.documents(s, d).filter(col("doc_id") % 10 === 0)))
        .orderBy(col("source"), col("idx"))),

    // q149 — HLL PRECISION SWEEP: the register-size knob's tuning curve
    // (what q141b is for CMS width, q148 for the layout grid). For each
    // p in {8, 10, 12}: the occupied-register count per group over the
    // same keys — the integer state the estimate derives from, so the
    // curve itself hash-checks; SketchSpec derives the estimates and
    // asserts the error law (mean |est-exact|/exact shrinks as p grows,
    // within the ~1.04/sqrt(2^p) analytic band's generosity). The p-bit
    // index and the (61-p)-bit rho both derive from ONE hash60 per row —
    // the sweep costs one scan + a (groups x 3 x 2^12)-bounded agg.
    "q149_hll_precision_sweep" -> ((s, d) => {
      val h = Shared.hash60(col("l_partkey").cast("string"))
      val ps = Seq(8, 10, 12)
      val cells = ps.map { p =>
        struct(lit(p.toLong).as("p"),
          pmod(h, lit((1L << p))).as("idx"))
      }
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          explode(array(cells: _*)).as("cell"))
        .select(col("flag"), col("cell.p").as("p"), col("cell.idx").as("idx"))
        .distinct()
        .groupBy(col("flag"), col("p"))
        .agg(count(lit(1)).as("n_regs"))
        .orderBy(col("flag"), col("p"))
    }),

    // q146 — sketch SET OPERATIONS audit: per source pair, the register
    // overlap the inclusion-exclusion distinct-intersection estimate is
    // built from. Union registers merge EXACTLY (max-monoid, the q139
    // law) but intersection is DERIVED — |A∩B| ≈ est(A) + est(B) −
    // est(A∪B) — and its relative error blows up as the true
    // intersection shrinks, which is precisely what a deployment must
    // audit before trusting sketch overlaps (the q112/q117 posture).
    // The hash-checked output is pure integers: per ordered pair,
    // each side's register count and the count of SHARED register
    // indices (the quantity the union merge saturates on); SketchSpec
    // derives the estimates driver-side and compares them against q102's
    // exact source overlaps. Register-sized work: the pair join runs on
    // the (source, idx) register table, never on documents.
    "q146_register_overlap" -> ((s, d) => {
      val regs = docRegisters(Tables.documents(s, d))
        .select(col("source"), col("idx"))
      val counts = regs.groupBy(col("source")).agg(count(lit(1)).as("nr"))
      val a = regs.toDF("sa", "idx")
      val b = regs.toDF("sb", "idx")
      val common = a.join(b, "idx").filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("r_common"))
      common
        .join(counts.toDF("sa", "ra"), "sa")
        .join(counts.toDF("sb", "rb"), "sb")
        .select(col("sa"), col("sb"), col("ra"), col("rb"), col("r_common"))
        .orderBy(col("sa"), col("sb"))
    }),

    // q141 — Count-Min frequency sketch with an exact-checkable readout:
    // the frequency twin of q138. The counter table (4 rows x 1024
    // counters of exact bigram-occurrence sums) is integer state the
    // oracle replays bit-for-bit; the readout joins q95's exact top-25
    // bigrams back through the sketch and reports each gram's CMS
    // estimate (min over its 4 counters) beside its true count. CMS
    // never underestimates — cms_est >= cnt for every row, asserted in
    // SketchSpec and visible in the hash-checked output. Counters are a
    // sum-monoid: partial+final agg with map-side combine, shuffle
    // bounded by 4096 cells, and shard sketches add cell-wise — the
    // property that makes frequency tables maintainable at 100 TB
    // without re-reading history.
    "q141_cms_frequency" -> ((s, d) => {
      // ONE corpus pass: the gram count table feeds both the counters
      // (explode 4 cells per DISTINCT gram — ~285x fewer rows than a
      // per-occurrence explode at sf~1) and the exact top-25
      val gc = TextOps.bigramsOf(s, d)
        .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      val counters = cmsCounters(gc)
      val top = gc.orderBy(col("cnt").desc, col("g")).limit(25)
      val probes = (0 until CmsRows).map { r =>
        struct(lit(r.toLong).as("row"),
          pmod(Shared.hash60(concat(lit(s"cms$r:"), col("g"))),
            lit(CmsW.toLong)).as("idx"))
      }
      top.select(col("g"), col("cnt"), explode(array(probes: _*)).as("p"))
        .select(col("g"), col("cnt"), col("p.row").as("row"),
          col("p.idx").as("idx"))
        .join(counters, Seq("row", "idx"))
        .groupBy(col("g"), col("cnt"))
        .agg(min(col("c")).as("cms_est"))
        .orderBy(col("cnt").desc, col("g"))
    }),

    // q141b — CMS WIDTH SWEEP: the w-tuning curve a deployment measures
    // before trusting a fixed-width sketch at a new scale (the q117/q137
    // honest-audit pattern, applied to frequency sketching). Motivated by
    // a real measurement: the q141 4x1024 sketch reads its top-25 grams
    // back exactly at sf0.01-0.1 (23/25) but SATURATES at the sf~1 stress
    // tier (0/25 exact; distinct grams outgrow the cells, and CMS error
    // is an additive ~N*e/w). For each width in {256, 1024, 4096, 16384}:
    // exact-readback count, max and total overestimate over the top-25,
    // beside the corpus mass the error law scales with — all integers,
    // hash-checked, so the curve itself is oracle-proven. Cost: the
    // count-table pattern (grams aggregated FIRST, then the 16
    // (width x row) cells explode over the VOCABULARY, not the token
    // stream) — shuffle bounded by 4*(256+...+16384) ~ 87k cells.
    "q141b_cms_width_sweep" -> ((s, d) => {
      val widths = Seq(256L, 1024L, 4096L, 16384L)
      val gc = TextOps.bigramsOf(s, d)
        .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      val cells = widths.flatMap(w => (0 until CmsRows).map { r =>
        struct(lit(w).as("w"), lit(r.toLong).as("row"),
          pmod(Shared.hash60(concat(lit(s"cms$r:"), col("g"))),
            lit(w)).as("idx"))
      })
      val counters = gc.select(col("cnt"), explode(array(cells: _*)).as("cell"))
        .groupBy(col("cell.w").as("w"), col("cell.row").as("row"),
          col("cell.idx").as("idx"))
        .agg(sum(col("cnt")).as("c"))
      val top = gc.orderBy(col("cnt").desc, col("g")).limit(25)
      val est = top
        .select(col("g"), col("cnt"), explode(array(cells: _*)).as("cell"))
        .select(col("g"), col("cnt"), col("cell.w").as("w"),
          col("cell.row").as("row"), col("cell.idx").as("idx"))
        .join(counters, Seq("w", "row", "idx"))
        .groupBy(col("w"), col("g"), col("cnt"))
        .agg(min(col("c")).as("est"))
      val mass = gc.agg(sum(col("cnt")).cast("long").as("n_mass"),
        count(lit(1)).as("n_distinct"))
      est.groupBy(col("w"))
        .agg(sum(when(col("est") === col("cnt"), 1L).otherwise(0L))
            .cast("long").as("n_exact"),
          max(col("est") - col("cnt")).cast("long").as("max_overshoot"),
          sum(col("est") - col("cnt")).cast("long").as("sum_overshoot"))
        .crossJoin(broadcast(mass))
        .orderBy(col("w"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q138_hll_registers" ->
      s"""${sqlHllRegisters("flag", "l_returnflag",
            "CAST(l_partkey AS VARCHAR)", "lineitem")}
         |ORDER BY flag, idx""".stripMargin,

    "q139_incremental_distinct" ->
      s"""${sqlHllRegisters("source", "source", "text", "documents")}
         |ORDER BY source, idx""".stripMargin,

    "q149_hll_precision_sweep" ->
      s"""WITH h AS (SELECT l_returnflag AS flag,
         |    ${Shared.sqlHash60("CAST(l_partkey AS VARCHAR)")} AS h
         |  FROM lineitem),
         | p AS (SELECT unnest([8, 10, 12]) AS p)
         |SELECT flag, CAST(p.p AS BIGINT) AS p,
         |  CAST(COUNT(DISTINCT h % (1::BIGINT << p.p)) AS BIGINT) AS n_regs
         |FROM h CROSS JOIN p GROUP BY flag, p ORDER BY flag, p""".stripMargin,

    "q146_register_overlap" ->
      s"""WITH h AS (SELECT source, ${Shared.sqlHash60("text")} AS h
         |           FROM documents),
         |  r AS (SELECT DISTINCT source, h % $HllM AS idx FROM h),
         |  n AS (SELECT source, COUNT(*) AS nr FROM r GROUP BY source)
         |SELECT a.source AS sa, b.source AS sb,
         |  CAST(MIN(na.nr) AS BIGINT) AS ra, CAST(MIN(nb.nr) AS BIGINT) AS rb,
         |  COUNT(*) AS r_common
         |FROM r a JOIN r b ON a.idx = b.idx AND a.source < b.source
         |JOIN n na ON na.source = a.source
         |JOIN n nb ON nb.source = b.source
         |GROUP BY sa, sb ORDER BY sa, sb""".stripMargin,

    "q141_cms_frequency" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         |  g AS (SELECT unnest(list_transform(range(1, len(toks)),
         |          i -> toks[i] || ' ' || toks[i+1])) AS g
         |        FROM t WHERE len(toks) >= 2),
         |  probe AS (SELECT g.g, r.r AS row,
         |      ${Shared.sqlHash60("concat('cms', r.r, ':', g.g)")} % $CmsW
         |        AS idx
         |    FROM g CROSS JOIN (SELECT unnest(range(0, $CmsRows)) AS r) r),
         |  counters AS (SELECT row, idx, COUNT(*) AS c
         |    FROM probe GROUP BY row, idx),
         |  top AS (SELECT g, COUNT(*) AS cnt FROM g GROUP BY g
         |    ORDER BY cnt DESC, g LIMIT 25),
         |  tp AS (SELECT t.g, t.cnt, r.r AS row,
         |      ${Shared.sqlHash60("concat('cms', r.r, ':', t.g)")} % $CmsW
         |        AS idx
         |    FROM top t CROSS JOIN (SELECT unnest(range(0, $CmsRows)) AS r) r)
         |SELECT tp.g, CAST(MIN(tp.cnt) AS BIGINT) AS cnt,
         |  CAST(MIN(c.c) AS BIGINT) AS cms_est
         |FROM tp JOIN counters c ON tp.row = c.row AND tp.idx = c.idx
         |GROUP BY tp.g ORDER BY cnt DESC, g""".stripMargin,

    "q141b_cms_width_sweep" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         |  g AS (SELECT unnest(list_transform(range(1, len(toks)),
         |          i -> toks[i] || ' ' || toks[i+1])) AS g
         |        FROM t WHERE len(toks) >= 2),
         |  gc AS (SELECT g, COUNT(*) AS cnt FROM g GROUP BY g),
         |  cfg AS (SELECT w.w, r.r
         |    FROM (SELECT unnest([256, 1024, 4096, 16384]) AS w) w
         |    CROSS JOIN (SELECT unnest(range(0, $CmsRows)) AS r) r),
         |  counters AS (SELECT cfg.w, cfg.r,
         |      ${Shared.sqlHash60("concat('cms', cfg.r, ':', gc.g)")} % cfg.w
         |        AS idx, SUM(gc.cnt) AS c
         |    FROM gc CROSS JOIN cfg GROUP BY cfg.w, cfg.r, idx),
         |  top AS (SELECT g, cnt FROM gc ORDER BY cnt DESC, g LIMIT 25),
         |  tp AS (SELECT t.g, t.cnt, cfg.w, cfg.r,
         |      ${Shared.sqlHash60("concat('cms', cfg.r, ':', t.g)")} % cfg.w
         |        AS idx
         |    FROM top t CROSS JOIN cfg),
         |  est AS (SELECT tp.w, tp.g, tp.cnt, MIN(c.c) AS est
         |    FROM tp JOIN counters c
         |      ON tp.w = c.w AND tp.r = c.r AND tp.idx = c.idx
         |    GROUP BY tp.w, tp.g, tp.cnt),
         |  mass AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_mass,
         |      COUNT(*) AS n_distinct FROM gc)
         |SELECT CAST(w AS BIGINT) AS w,
         |  CAST(SUM(CASE WHEN est = cnt THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_exact,
         |  CAST(MAX(est - cnt) AS BIGINT) AS max_overshoot,
         |  CAST(SUM(est - cnt) AS BIGINT) AS sum_overshoot,
         |  n_mass, n_distinct
         |FROM est, mass GROUP BY w, n_mass, n_distinct ORDER BY w""".stripMargin
  )
}
