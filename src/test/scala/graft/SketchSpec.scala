package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Portable-sketch invariants the DuckDB hash check cannot express:
  * estimate accuracy against exact counts (the float readout deliberately
  * kept out of the oracle contract) and the merge-monoid laws that make
  * the sketches maintainable at 100 TB.
  */
class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q138: HLL estimate from the register table lands within 3% of exact") {
    val regs = SparkEntry.queries("q138_hll_registers")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(regs.keySet == exact.keySet)
    regs.foreach { case (flag, rows) =>
      val est = Sketches.hllEstimate(rows.map(t => (t._2, t._3)).toSeq)
      val nd = exact(flag).toDouble
      assert(math.abs(est - nd) / nd < 0.03,
        s"flag=$flag est=$est exact=$nd")
    }
  }

  test("q138: registers are a max-monoid — shard-wise build + merge == whole") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"), col("l_partkey"))
    def regsOf(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "flag", col("l_partkey").cast("string"))
    val whole = regsOf(li)
    val merged = regsOf(li.filter(col("l_partkey") % 2 === 0))
      .unionByName(regsOf(li.filter(col("l_partkey") % 2 =!= 0)))
      .groupBy(col("flag"), col("idx"))
      .agg(max(col("maxrho")).as("maxrho"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("q139: fold equals from-scratch rebuild; corpus pass paid at most once") {
    val before = Sketches.q139BaseWrites.get()
    val fold = SparkEntry.queries("q139_incremental_distinct")(spark, sf)
    val scratch = Sketches.docRegisters(Tables.documents(spark, sf))
    assert(fold.exceptAll(scratch).isEmpty && scratch.exceptAll(fold).isEmpty)
    // second serve folds again without re-reading the corpus base
    SparkEntry.queries("q139_incremental_distinct")(spark, sf).count()
    val after = Sketches.q139BaseWrites.get()
    assert(after - before <= 1, s"corpus register pass paid ${after - before}x")
  }

  test("q141: CMS never underestimates and is exact for uncollided grams") {
    val rows = SparkEntry.queries("q141_cms_frequency")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 25)
    rows.foreach { case (g, cnt, est) =>
      assert(est >= cnt, s"CMS underestimated '$g': est=$est < cnt=$cnt")
    }
    // the sketch is useful, not vacuous: the heavy end of a zipfy corpus
    // collides rarely, so most top grams read back exactly
    val exactBack = rows.count { case (_, cnt, est) => est == cnt }
    assert(exactBack >= 15, s"only $exactBack/25 grams read back exactly")
  }

  test("q141b: width sweep is monotone — wider never reads back worse") {
    val rows = SparkEntry.queries("q141b_cms_width_sweep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256L, 1024L, 4096L, 16384L))
    rows.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 >= a._2, s"n_exact fell ${a._1}->${b._1}")
      assert(b._3 <= a._3, s"max_overshoot rose ${a._1}->${b._1}")
      assert(b._4 <= a._4, s"sum_overshoot rose ${a._1}->${b._1}")
    }
    // overshoot is the only error mode CMS has: never an underestimate
    rows.foreach { case (w, _, maxOver, sumOver) =>
      assert(maxOver >= 0 && sumOver >= 0, s"w=$w underestimated")
    }
  }

  /** Linear-counting estimate from an occupied-register count (the
    * regime every q146 pair sits in at fixture fill levels).
    */
  private def lcEst(occupied: Long): Double = {
    val m = Sketches.HllM.toDouble
    m * math.log(m / (m - occupied))
  }

  test("q146: corpus audit reads the noise floor — no material cross-source overlap") {
    val rows = SparkEntry.queries("q146_register_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // ground truth on this corpus: zero shared texts across sources
    val byText = Tables.documents(spark, sf)
      .select(col("source"), col("text")).distinct()
    val exactShared = byText.as("a").join(byText.as("b"),
      col("a.text") === col("b.text") && col("a.source") < col("b.source"))
      .count()
    assert(exactShared == 0L, "fixture assumption: no cross-source dup texts")
    // the sketch must agree at the resolution that matters: every
    // inclusion-exclusion estimate sits at the hash-collision noise
    // floor (a few), never at a material overlap
    rows.foreach { case (sa, sb, ra, rb, rc) =>
      val est = lcEst(ra) + lcEst(rb) - lcEst(ra + rb - rc)
      assert(est < 5.0, s"pair $sa/$sb read a phantom overlap of $est")
    }
  }

  test("q146: the estimator is accurate when the intersection is material") {
    import spark.implicits._
    // planted: A and B share 300 texts; each holds 500 more of its own
    val docs = ((0 until 300).flatMap(i =>
      Seq(("A", s"shared_$i"), ("B", s"shared_$i"))) ++
      (0 until 500).map(i => ("A", s"only_a_$i")) ++
      (0 until 500).map(i => ("B", s"only_b_$i")))
      .toDF("source", "text")
    val regs = Sketches.docRegisters(docs)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ra = regs.count(_._1 == "A").toLong
    val rb = regs.count(_._1 == "B").toLong
    val union = regs.map(_._2).distinct.length.toLong
    val est = lcEst(ra) + lcEst(rb) - lcEst(union)
    assert(math.abs(est - 300.0) / 300.0 < 0.2,
      s"planted overlap 300 estimated as $est")
  }

  test("q149: precision sweep — the error band tightens as p grows") {
    val rows = SparkEntry.queries("q149_hll_precision_sweep")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (p <- Seq(8L, 10L, 12L)) {
      val m = (1L << p).toDouble
      val band = math.max(0.02, 4.0 / math.sqrt(m))
      rows.filter(_._2 == p).foreach { case (flag, _, nRegs) =>
        assert(nRegs < m, s"p=$p saturated — sweep tier too big for the test")
        val est = m * math.log(m / (m - nRegs))
        val nd = exact(flag).toDouble
        assert(math.abs(est - nd) / nd < band,
          s"p=$p flag=$flag est=$est exact=$nd band=$band")
      }
    }
  }

  test("q147: counting-sort percentiles equal percentile() exactly") {
    val viaHist = SparkEntry.queries("q147_histogram_percentiles")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val viaSort = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"),
        round(expr("percentile(l_quantity, 0.99)"), 4).as("p99"))
      .collect()
    viaSort.foreach { r =>
      val flag = r.getString(0)
      assert(viaHist((flag, 50L)) == r.getDouble(1), s"$flag p50")
      assert(viaHist((flag, 95L)) == r.getDouble(2), s"$flag p95")
      assert(viaHist((flag, 99L)) == r.getDouble(3), s"$flag p99")
    }
    // the windows consume the HISTOGRAM by construction (they are
    // defined over the (flag, v, c) aggregate); what makes that a scale
    // win is the DOMAIN bound the design rests on — verify it holds on
    // the data: the histogram is <= groups x 50 rows while the raw table
    // is orders of magnitude larger
    val histRows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .distinct().count()
    val rawRows = Tables.lineitem(spark, sf).count()
    assert(histRows <= 3 * 50 && histRows < rawRows,
      s"histogram not domain-bounded: $histRows rows (raw=$rawRows)")
  }

  test("q138 plan: register agg is partial+final with no Expand") {
    val df = SparkEntry.queries("q138_hll_registers")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_max"), "register max must map-side combine")
    assert(!p.contains("Expand"), "no input duplication for the registers")
    assert(!p.contains("CartesianProduct"))
  }

  test("q141b plan: cell explode is vocabulary-bounded, not token-bounded") {
    val df = SparkEntry.queries("q141b_cms_width_sweep")(spark, sf)
    df.collect()
    val gens = TestSpark.planNodes(df.queryExecution.executedPlan).collect {
      // only the (width x row) CELL explodes — the bigram explode that
      // feeds the count table is inherently token-bounded and not at issue
      case g: org.apache.spark.sql.execution.GenerateExec
          if g.generatorOutput.exists(_.name == "cell") => g
    }
    assert(gens.nonEmpty, "expected the (width x row) cell explode")
    val exploded = gens.map(_.metrics("numOutputRows").value).sum
    val nd = operators.TextOps.bigramsOf(spark, sf)
      .select(col("g")).distinct().count()
    // 16 cells per DISTINCT gram (+ the 16x25 probe explode) — the
    // vocabulary bound itself IS the claim: at 100 TB the 16x occurrence
    // explode this pattern avoids would be per-token, and the gap widens
    // with corpus size (at this fixture tier it is only ~1.9x; asserting
    // against token mass here would make the test hostage to the
    // fixture's vocabulary richness)
    assert(exploded <= 16 * (nd + 25),
      s"explode produced $exploded rows for $nd distinct grams")
  }

  test("q141: counters are a sum-monoid — shard-wise build + merge == whole") {
    val grams = operators.TextOps.bigramsOf(spark, sf)
      .withColumn("h", operators.Shared.hash60(col("g")))
    def gcOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val whole = Sketches.cmsCounters(gcOf(grams))
    val merged = Sketches.cmsCounters(gcOf(grams.filter(col("h") % 2 === 0)))
      .unionByName(Sketches.cmsCounters(gcOf(grams.filter(col("h") % 2 =!= 0))))
      .groupBy(col("row"), col("idx"))
      .agg(sum(col("c")).as("c"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }
}
