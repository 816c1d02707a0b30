package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational operator inventory Q01–Q21 (SURVEY.md §2.3).
  *
  * Each query is a declarative DataFrame program: filters/projections reach
  * the parquet scan via Catalyst pushdown, joins pick broadcast vs
  * sort-merge via the planner (we hint `broadcast` only where a side is a
  * dimension table that stays small at every scale factor), aggregations
  * run as partial+final HashAggregate, and top-k lowers to
  * TakeOrderedAndProject. Nothing here collects to the driver.
  *
  * Determinism contract (FIXTURES.md §B): total ORDER BY, doubles through
  * Q.dsum/Q.davg (exact decimal accumulation), timestamps as UTC strings.
  */
object Relational {
  import Q._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q01 — scan + projection
    "q01_scan_project" -> ((s, d) => {
      Tables.region(s, d)
        .select(col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))
    }),

    // Q02 — conjunctive ∧ disjunctive predicates, pushed to the scan
    "q02_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(
          (col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_quantity") < 10) ||
            col("l_discount") > 0.09)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_discount"), 4).as("l_discount"),
          dstr(col("l_shipdate")).as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Q03 — inner equi-join. `customer` is fact-scale (grows linearly with
    // SF), so it carries NO broadcast hint: Catalyst/AQE picks BHJ while the
    // side is under the threshold and falls back to a shuffled join at
    // scale. Hints are reserved for the fixed-cardinality dims
    // (region=5, nation=25 rows at every SF).
    "q03_join_broadcast" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_name"),
          round(col("o_totalprice"), 4).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Q04 — multi-way join + agg + top-k (TPC-H Q3 shape)
    "q04_join_agg_topk" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          dstr(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q05 — left outer join (customers with zero orders survive, n=0)
    "q05_left_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // Q06 — left semi join (EXISTS)
    "q06_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Q07 — left anti join (NOT EXISTS); anti-joins against high-value
    // orders so the result is non-empty at every SF (every customer has
    // *some* order in this data, so a plain anti-join would be vacuous).
    "q07_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 4).as("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // Q08 — full outer join over disjoint-ish aggregates (nulls both sides)
    "q08_full_outer" -> ((s, d) => {
      val sa = Tables.supplier(s, d).filter(col("s_nationkey") < 13)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      val ca = Tables.customer(s, d).filter(col("c_nationkey") >= 7)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      sa.join(ca, sa("s_nationkey") === ca("c_nationkey"), "full_outer")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("n_supp"), lit(-1L)).as("n_supp"),
          coalesce(col("n_cust"), lit(-1L)).as("n_cust"))
        .orderBy(col("nationkey"))
    }),

    // Q09 — non-equi / range join: equi key + date-range residual; lowers
    // to a shuffled join on the equi key with the range as post-filter (no
    // cartesian — safe at scale).
    "q09_range_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o,
          l("l_orderkey") === o("o_orderkey") &&
            l("l_shipdate") >= o("o_orderdate") &&
            l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("rev"))
        .orderBy(col("ym"))
    }),

    // Q10 — as-of (latest event per user at-or-before a cutoff): composes
    // from row_number, no custom operator needed.
    "q10_asof_latest" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .filter(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), tstr(col("ts")).as("ts_s"),
          col("event_type"))
        .orderBy(col("user_id"))
    }),

    // Q11 — hash aggregation (TPC-H Q1 shape); partial+final HashAggregate
    "q11_agg_q1" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q12 — exact distinct counts (expand-based multi-distinct)
    "q12_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Q13 — ROLLUP with GROUPING markers
    "q13_rollup" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping(col("r_name")).cast("int").as("g_r"),
          grouping(col("n_name")).cast("int").as("g_n"),
          dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n_ord"))
        .select(coalesce(col("r_name"), lit("(all)")).as("r_name"),
          coalesce(col("n_name"), lit("(all)")).as("n_name"),
          col("g_r"), col("g_n"), col("rev"), col("n_ord"))
        .orderBy(col("g_r"), col("g_n"), col("r_name"), col("n_name"))
    }),

    // Q14 — ranking windows (rank/dense_rank keep ties; row_number gets a
    // total tiebreak so it is deterministic)
    // Q56 — CUBE: all 2^n grouping sets in one pass. Physically a single
    // Expand (one replicated row per grouping set) feeding one hash
    // aggregate — the row multiplier is the grouping-set count (4 here),
    // paid map-side before the combine, never an n-pass re-scan.
    "q56_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_f"),
          grouping(col("l_linestatus")).cast("int").as("g_s"),
          count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("g_f"), col("g_s"), col("n"), col("sum_qty"))
        .orderBy(col("g_f"), col("g_s"), col("l_returnflag"),
          col("l_linestatus"))
    }),

    // Q68 — explicit GROUPING SETS: exactly the (flag), (status), ()
    // combinations — neither rollup nor cube — via SQL (the DataFrame API
    // has no direct grouping-sets method). Lowers to the same single
    // Expand + one hash-agg pass as q13/q56: rows×|sets| expansion
    // map-side, partial aggregation before the shuffle.
    "q68_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q68_lineitem")
      s.sql(
        s"""SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
           |  COALESCE(l_linestatus, '(all)') AS l_linestatus,
           |  CAST(GROUPING(l_returnflag) AS INT) AS g_f,
           |  CAST(GROUPING(l_linestatus) AS INT) AS g_s,
           |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
           |FROM q68_lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY g_f, g_s, l_returnflag, l_linestatus""".stripMargin)
    }),

    // Q57 — ntile: equal-frequency bucketing per key. Over the total
    // order the bucket assignment is deterministic; aggregating per
    // bucket yields quartile summaries (the windowed cousin of q44's
    // percentiles).
    "q57_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy(col("l_returnflag"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 4).as("lo"),
          round(max(col("l_extendedprice")), 4).as("hi"))
        .orderBy(col("l_returnflag"), col("quartile"))
    }),

    "q14_window_rank" -> ((s, d) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      val total = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(total))
        .withColumn("rnk", rank().over(byPrice))
        .withColumn("drnk", dense_rank().over(byPrice))
        .filter(col("rn") <= 5)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 4).as("o_totalprice"),
          col("rn"), col("rnk"), col("drnk"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Q51 — top-k per key through the LocalTopK rewrite
    // (graft/plans/LocalTopK.scala): the row_number()<=k idiom over the
    // full lineitem fact, where the injected rule prunes each map
    // partition to k rows per key BEFORE the window's shuffle — at 100 TB
    // the exchange carries O(keys x k) instead of O(rows). PlanSpec
    // asserts the LocalTopKPerKey operator is present below the shuffle;
    // OperatorSpec re-runs with the rule disabled and compares.
    "q51_local_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 4).as("l_extendedprice"),
          col("rn").cast("long").as("rn"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    // Q52/Q53 — keep-ties top-k through the same LocalTopK rewrite:
    // rank() and dense_rank() filters over a massively tied order key
    // (l_quantity has ~50 distinct values), where the retained set is
    // value-determined — all boundary ties survive — so the output is
    // deterministic even though the order is not total.
    "q52_rank_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 2)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("l_returnflag"), col("rnk"), col("l_orderkey"),
          col("l_linenumber"))
    }),

    "q53_dense_rank_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("drnk") <= 3)
        .groupBy(col("l_returnflag"), col("drnk"),
          col("l_quantity").cast("double").as("l_quantity"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("drnk"))
    }),

    // Q15 — analytic window fns + ROWS frame running sum (decimal-exact)
    "q15_window_lag_runsum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_v",
          round(lag(col("value"), 1).over(w).cast(DoubleType), 4))
        .withColumn("next_v",
          round(lead(col("value"), 1).over(w).cast(DoubleType), 4))
        .withColumn("run_sum",
          round(sum(col("value").cast(DecimalType(38, 10)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType), 4))
        .select(col("user_id"), col("event_id"), col("prev_v"), col("next_v"),
          col("run_sum"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Q16 — RANGE frame: 10-minute moving average per user over epoch-ms
    "q16_window_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
        .rangeBetween(-600000L, 0L)
      Tables.events(s, d)
        .withColumn("ts_ms", unix_millis(col("ts")))
        .withColumn("mov_avg",
          round(sum(col("value").cast(DecimalType(38, 10))).over(w)
            .cast(DoubleType) / count(col("value")).over(w), 4))
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("mov_avg"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Q17 — global top-k (TakeOrderedAndProject; never a full sort at scale)
    "q17_topk" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 4).as("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(20)
    }),

    // Q18 — set operations with op markers (single deterministic result)
    "q18_setops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_acctbal") > 7000).select(col("c_custkey"))
      val b = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      a.union(b).distinct().withColumn("op", lit("union"))
        .unionByName(a.union(b).withColumn("op", lit("union_all")))
        .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .select(col("op"), col("c_custkey"))
        .orderBy(col("op"), col("c_custkey"))
    }),

    // Q19 — string functions (all codegen'd built-ins)
    "q19_strings" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_type")).as("type_u"),
          lower(col("p_brand")).as("brand_l"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          col("p_name").like("%a%").cast("int").as("has_a"),
          regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
          trim(concat(lit("  "), col("p_type"), lit("  "))).as("type_trim"),
          split(col("p_name"), " ").getItem(0).as("first_tok"))
        .orderBy(col("p_partkey"))
    }),

    // Q20 — date/time functions (session TZ = UTC)
    "q20_dates" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dstr(date_trunc("quarter", col("o_orderdate"))).as("qtr_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"),
          dstr(last_day(col("o_orderdate"))).as("month_end"))
        .orderBy(col("o_orderkey"))
    }),

    // Q21 — math functions
    "q21_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price_r2"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
          (col("l_partkey") % 7).as("pk_mod7"),
          round(pow(col("l_quantity"), 2.0), 4).as("qty_sq"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          signum(col("l_discount") - 0.05).cast("int").as("disc_sign"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Q71 — as-of join between two relations: each click matched to the
    // latest signup at-or-before it, per user. NOT a range join (whose
    // candidate set explodes as |left|×|right| per key): both sides union
    // into one relation, one window pass per user carries the last-seen
    // right row forward, and left rows read it. One shuffle on user_id,
    // O(rows) state — the scale-safe as-of, same trick MERGE_ASOF-style
    // engines lower to. Right-before-left on ts ties (side 0 < 1) gives
    // the <= semantics of DuckDB's native ASOF JOIN, which is the oracle.
    "q71_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("us"), lit(0).as("side"),
          col("event_id").as("eid"),
          col("event_id").as("signup_eid"),
          lit(null).cast("long").as("click_eid"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("us"), lit(1).as("side"),
          col("event_id").as("eid"),
          lit(null).cast("long").as("signup_eid"),
          col("event_id").as("click_eid"))
      // eid tiebreak makes the order TOTAL: without it, two signups at
      // the same microsecond would leave which one wins to shuffle order
      // (DuckDB's ASOF pick is equally arbitrary on such ties; this data
      // has none, but the determinism contract must not depend on that)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("side"), col("eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      signups.unionByName(clicks)
        .withColumn("asof_eid",
          last(col("signup_eid"), ignoreNulls = true).over(w))
        .withColumn("asof_us",
          last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("user_id"), col("click_eid"), col("us").as("click_us"),
          col("asof_eid").as("signup_eid"), col("asof_us").as("signup_us"))
        .orderBy(col("user_id"), col("click_eid"))
    }),

    // Q58 — ordered string aggregation (LISTAGG): nations per region as a
    // sorted comma-joined list. collect_list is per-group bounded (25
    // nations max regardless of fact-table scale); sorting inside the
    // group makes the result independent of partial-aggregation order.
    "q58_string_agg" -> ((s, d) => {
      Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    }),

    // Q66 — window distribution functions: percent_rank / cume_dist plus
    // whole-partition first/nth value. Same single-shuffle window shape
    // as q14; the whole-partition frame is an explicit ROWS UNBOUNDED
    // BOTH-WAYS frame so Spark and DuckDB agree on what first/nth see.
    "q66_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val whole = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      // pr/cd are computed from rank+count with exact integer half-up
      // rounding, not round(percent_rank(), 4): ratios of small integers
      // are exactly the class where engine-native double rounding
      // diverges at 4dp half-way points (the q38 lesson; OperatorSpec
      // asserts these formulas equal the built-ins pre-rounding). The
      // ordering is total (tiebreak o_orderkey) so rank = row_number.
      Tables.orders(s, d)
        .withColumn("r", rank().over(w).cast("long"))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("o_custkey"))))
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("n") === 1, lit(0.0d)).otherwise(
            expr("(20000 * (r - 1) + (n - 1)) div (2 * (n - 1)) / 10000.0D"))
            .as("pr"),
          expr("(20000 * r + n) div (2 * n) / 10000.0D").as("cd"),
          round(first(col("o_totalprice")).over(whole), 4).as("cheapest"),
          round(nth_value(col("o_totalprice"), 3).over(whole), 4)
            .as("third_cheapest"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Q59 — correlated scalar subquery (TPC-H Q17 shape): lineitems whose
    // quantity is below half the average for their part. Written as the
    // correlated form on purpose: Catalyst DECORRELATES it into a
    // partial+final aggregate on l_partkey joined back to lineitem — the
    // only shape that survives at 100 TB (a per-row subquery execution
    // would be O(rows × rows)). Both engines evaluate the same decorrelated
    // plan semantics; the half-average threshold is exact decimal math.
    "q59_corr_subquery" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q59_lineitem")
      s.sql(
        s"""SELECT l.l_partkey, COUNT(*) AS n_low,
           |  ${sqlDsum("l.l_extendedprice")} AS low_revenue
           |FROM q59_lineitem l
           |WHERE l.l_quantity < (
           |  SELECT 0.5 * AVG(l2.l_quantity) FROM q59_lineitem l2
           |  WHERE l2.l_partkey = l.l_partkey)
           |GROUP BY l.l_partkey
           |ORDER BY l.l_partkey""".stripMargin)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q71_asof_join" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |             epoch_ns(ts) // 1000 AS us FROM events),
        |  s AS (SELECT user_id, us, event_id FROM e
        |        WHERE event_type = 'signup'),
        |  c AS (SELECT user_id, us, event_id FROM e
        |        WHERE event_type = 'click')
        |SELECT c.user_id, c.event_id AS click_eid, c.us AS click_us,
        |  s.event_id AS signup_eid, s.us AS signup_us
        |FROM c ASOF LEFT JOIN s
        |  ON c.user_id = s.user_id AND c.us >= s.us
        |ORDER BY c.user_id, click_eid""".stripMargin,

    "q58_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        | COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q68_grouping_sets" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
         |  COALESCE(l_linestatus, '(all)') AS l_linestatus,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_f,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_s,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY g_f, g_s, l_returnflag, l_linestatus""".stripMargin,

    "q66_window_dist" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |    CAST(rank() OVER w AS BIGINT) AS r,
        |    COUNT(*) OVER (PARTITION BY o_custkey) AS n,
        |    first_value(o_totalprice) OVER wf AS fv,
        |    nth_value(o_totalprice, 3) OVER wf AS nv
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice, o_orderkey),
        |    wf AS (PARTITION BY o_custkey
        |           ORDER BY o_totalprice, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT o_orderkey, o_custkey,
        | CASE WHEN n = 1 THEN 0.0
        |      ELSE (20000 * (r - 1) + (n - 1)) // (2 * (n - 1)) / 10000.0
        | END AS pr,
        | (20000 * r + n) // (2 * n) / 10000.0 AS cd,
        | ROUND(fv, 4) AS cheapest,
        | ROUND(nv, 4) AS third_cheapest
        |FROM t ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q59_corr_subquery" ->
      s"""SELECT l.l_partkey, COUNT(*) AS n_low,
         |  ${sqlDsum("l.l_extendedprice")} AS low_revenue
         |FROM lineitem l
         |WHERE l.l_quantity < (
         |  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
         |  WHERE l2.l_partkey = l.l_partkey)
         |GROUP BY l.l_partkey
         |ORDER BY l.l_partkey""".stripMargin,
    "q01_scan_project" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | ROUND(l_discount, 4) AS l_discount,
        | strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE (l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        |   AND l_quantity < 10) OR l_discount > 0.09
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT o_orderkey, c_name, ROUND(o_totalprice, 4) AS o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q04_join_agg_topk" ->
      s"""SELECT l_orderkey,
         | ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
         |FROM customer
         | JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |  AND l_shipdate > TIMESTAMP '1999-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q05_left_outer" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         | ${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS total_spent
         |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q08_full_outer" ->
      """WITH sa AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
        |            WHERE s_nationkey < 13 GROUP BY s_nationkey),
        |     ca AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
        |            WHERE c_nationkey >= 7 GROUP BY c_nationkey)
        |SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
        |       COALESCE(n_supp, -1) AS n_supp, COALESCE(n_cust, -1) AS n_cust
        |FROM sa FULL OUTER JOIN ca ON s_nationkey = c_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q09_range_join" ->
      s"""SELECT (year(o_orderdate) * 100 + month(o_orderdate)) AS ym,
         | COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS rev
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | AND l_shipdate >= o_orderdate
         | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
         |GROUP BY ym ORDER BY ym""".stripMargin,

    // NOTE: oracle truncates ts to microseconds (make_timestamp of
    // epoch_ns floor-div 1000) so both engines order/filter at the same
    // precision — Spark reads the nanos column as micros (Tables.events).
    "q10_asof_latest" ->
      """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        | event_type
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts)
        |            FROM events)
        |      WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q11_agg_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sqlDsum("l_quantity")} AS sum_qty,
         | ${sqlDsum("l_extendedprice")} AS sum_base_price,
         | ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         | ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         | ${sqlDavg("l_quantity")} AS avg_qty,
         | ${sqlDavg("l_extendedprice")} AS avg_price,
         | ${sqlDavg("l_discount")} AS avg_disc,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q12_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        | COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q13_rollup" ->
      s"""SELECT COALESCE(r_name, '(all)') AS r_name,
         | COALESCE(n_name, '(all)') AS n_name,
         | GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n,
         | ${sqlDsum("o_totalprice")} AS rev, COUNT(*) AS n_ord
         |FROM orders
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY g_r, g_n, r_name, n_name""".stripMargin,

    "q56_cube" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
         | COALESCE(l_linestatus, '(all)') AS l_linestatus,
         | GROUPING(l_returnflag) AS g_f, GROUPING(l_linestatus) AS g_s,
         | COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY g_f, g_s, l_returnflag, l_linestatus""".stripMargin,

    "q57_ntile" ->
      """SELECT l_returnflag, quartile, COUNT(*) AS n,
        | ROUND(MIN(l_extendedprice), 4) AS lo,
        | ROUND(MAX(l_extendedprice), 4) AS hi
        |FROM (SELECT l_returnflag, l_extendedprice,
        |  CAST(NTILE(4) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT)
        |    AS quartile
        | FROM lineitem)
        |GROUP BY l_returnflag, quartile
        |ORDER BY l_returnflag, quartile""".stripMargin,

    "q14_window_rank" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice,
        | rn, rnk, drnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC) AS drnk
        | FROM orders)
        |WHERE rn <= 5 ORDER BY o_custkey, rn""".stripMargin,

    "q51_local_topk" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        | ROUND(l_extendedprice, 4) AS l_extendedprice, rn
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,

    "q52_rank_topk" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        | CAST(l_quantity AS DOUBLE) AS l_quantity, rnk
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  RANK() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity DESC) AS rnk
        | FROM lineitem)
        |WHERE rnk <= 2
        |ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber""".stripMargin,

    "q53_dense_rank_topk" ->
      """SELECT l_returnflag, drnk, CAST(l_quantity AS DOUBLE) AS l_quantity,
        | COUNT(*) AS n_rows
        |FROM (SELECT l_returnflag, l_quantity,
        |  DENSE_RANK() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity DESC) AS drnk
        | FROM lineitem)
        |WHERE drnk <= 3
        |GROUP BY l_returnflag, drnk, l_quantity
        |ORDER BY l_returnflag, drnk""".stripMargin,

    "q15_window_lag_runsum" ->
      """SELECT user_id, event_id,
        | ROUND(CAST(LAG(value, 1) OVER w AS DOUBLE), 4) AS prev_v,
        | ROUND(CAST(LEAD(value, 1) OVER w AS DOUBLE), 4) AS next_v,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
        |   AS run_sum
        |FROM (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts)
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q16_window_range" ->
      """SELECT user_id, event_id, ts_ms,
        | ROUND(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER w AS DOUBLE)
        |   / COUNT(value) OVER w, 4) AS mov_avg
        |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q17_topk" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(l_extendedprice, 4) AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q18_setops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7000),
        |     b AS (SELECT c_custkey FROM customer
        |           WHERE c_mktsegment = 'BUILDING')
        |SELECT 'union' AS op, c_custkey FROM
        |  (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
        |UNION ALL SELECT 'union_all' AS op, c_custkey FROM
        |  (SELECT c_custkey FROM a UNION ALL SELECT c_custkey FROM b)
        |UNION ALL SELECT 'intersect' AS op, c_custkey FROM
        |  (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
        |UNION ALL SELECT 'except' AS op, c_custkey FROM
        |  (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
        |ORDER BY op, c_custkey""".stripMargin,

    "q19_strings" ->
      """SELECT p_partkey,
        | UPPER(p_type) AS type_u, LOWER(p_brand) AS brand_l,
        | LENGTH(p_name) AS name_len, SUBSTR(p_name, 1, 5) AS name_pfx,
        | CONCAT(p_brand, ':', p_type) AS brand_type,
        | CAST(p_name LIKE '%a%' AS INT) AS has_a,
        | regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
        | TRIM(CONCAT('  ', p_type, '  ')) AS type_trim,
        | string_split(p_name, ' ')[1] AS first_tok
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_dates" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | dayofmonth(o_orderdate) AS dom,
        | strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start,
        | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |   AS days_since,
        | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q21_math" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(l_extendedprice, 2) AS price_r2,
        | ROUND(ABS(l_discount - 0.05), 4) AS disc_dev,
        | (l_partkey % 7) AS pk_mod7,
        | ROUND(POWER(l_quantity, 2.0), 4) AS qty_sq,
        | CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        | CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        | CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
