package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout invariants: the layout is invisible to results, the box
  * scan actually prunes partitions (the whole point), and the layout build
  * is paid at most once per session/source.
  */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("zCell/zId agree and are a bijection on the 8x8 grid") {
    val ids = for (t <- 0 until 8; u <- 0 until 8) yield Layout.zId(t, u)
    assert(ids.toSet == (0 until 64).toSet)
    import spark.implicits._
    val df = (for (t <- 0L until 8L; u <- 0L until 8L) yield (t, u))
      .toDF("t", "u")
      .withColumn("z", Layout.zCell(col("t"), col("u")))
      .collect()
    df.foreach { r =>
      assert(r.getInt(2) == Layout.zId(r.getLong(0).toInt, r.getLong(1).toInt))
    }
  }

  test("q140: layout is invisible — box over z-layout == box over raw events") {
    val viaLayout = SparkEntry.queries("q140_zorder_box")(spark, sf)
    // raw replay: same box arithmetic straight off the events table
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("tsc"), col("user_id"),
        col("event_type"), col("value"))
    val c = ev.agg(min(col("tsc")), max(col("tsc")),
      min(col("user_id")), max(col("user_id"))).head()
    val (tlo, thi, ulo, uhi) =
      Layout.boxOf(c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    val raw = ev.filter(col("tsc").between(tlo, thi) &&
        col("user_id").between(ulo, uhi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("sum_value"))
    assert(viaLayout.exceptAll(raw).isEmpty && raw.exceptAll(viaLayout).isEmpty)
  }

  test("q140: the scan carries PartitionFilters and reads fewer files") {
    val df = SparkEntry.queries("q140_zorder_box")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zcell"),
      s"no partition filter on zcell in:\n$plan")
    df.collect() // populate metrics
    val scans = TestSpark.planNodes(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = scans.map(_.relation.location.inputFiles.length).sum
    assert(filesRead < totalFiles,
      s"no pruning: read $filesRead of $totalFiles layout files")
    // upper bound from the same cut arithmetic the query uses: the box
    // spans at most (tb range) x (ub range) cells of the 8x8 grid
    val c = Tables.events(spark, sf)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
        min(col("user_id")), max(col("user_id"))).head()
    val (tmin, tmax, umin, umax) =
      (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    val (tlo, thi, ulo, uhi) = Layout.boxOf(tmin, tmax, umin, umax)
    def b(v: Long, mn: Long, mx: Long) = ((v - mn) * 8 / (mx - mn + 1)).toInt
    val nCells = (b(thi, tmin, tmax) - b(tlo, tmin, tmax) + 1) *
      (b(uhi, umin, umax) - b(ulo, umin, umax) + 1)
    assert(filesRead <= nCells && nCells < 64,
      s"box read $filesRead files (candidate cells $nCells of 64)")
  }

  test("q142: clamp pins out-of-span rows to edge cells; in-span unchanged") {
    import spark.implicits._
    val cuts = Seq((0L, 799L, 0L, 799L)).toDF("tmin", "tmax", "umin", "umax")
    val rows = Seq(
      (1L, 10000L, 10000L, "a", 1.0), // beyond both maxes -> (7,7)
      (2L, -50L, 3L, "a", 1.0), // before tmin -> (0, 0)
      (3L, 100L, 100L, "a", 1.0), // in span -> (1, 1)
      (4L, 799L, 0L, "a", 1.0) // at the edges -> (7, 0)
    ).toDF("event_id", "tsc", "user_id", "event_type", "value")
    val got = Layout.withCells(rows, cuts, clamp = true)
      .select(col("event_id"), col("zcell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == Layout.zId(7, 7))
    assert(got(2L) == Layout.zId(0, 0))
    assert(got(3L) == Layout.zId(1, 1))
    assert(got(4L) == Layout.zId(7, 0))
  }

  test("q142: fold + serve == box over all raw events; corpus files untouched") {
    val viaLayout = SparkEntry.queries("q142_zorder_incremental")(spark, sf)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("tsc"),
        col("user_id"), col("event_type"), col("value"))
    val c = ev.filter(col("event_id") % 10 =!= 0)
      .agg(min(col("tsc")), max(col("tsc")),
        min(col("user_id")), max(col("user_id"))).head()
    val (tlo, thi, ulo, uhi) =
      Layout.boxOf(c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    val raw = ev.filter(col("tsc").between(tlo, thi) &&
        col("user_id").between(ulo, uhi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("sum_value"))
    assert(viaLayout.exceptAll(raw).isEmpty && raw.exceptAll(viaLayout).isEmpty)
    // append-only contract: serving again must not rewrite the corpus
    // layout (same file list, same mtimes)
    def corpusFiles() = {
      val dir = new java.io.File(
        Layout.baseDir(spark, sf).stripPrefix("file:"))
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath -> f.lastModified())
      walk(dir).sortBy(_._1)
    }
    val before = corpusFiles()
    SparkEntry.queries("q142_zorder_incremental")(spark, sf).count()
    assert(corpusFiles() == before, "corpus layout was rewritten by a fold")
  }

  private def hfs(p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }
  private def rawBoxOverAll(): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("tsc"), col("user_id"),
        col("event_type"), col("value"))
    val c = ev.agg(min(col("tsc")), max(col("tsc")),
      min(col("user_id")), max(col("user_id"))).head()
    val (tlo, thi, ulo, uhi) =
      Layout.boxOf(c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    ev.filter(col("tsc").between(tlo, thi) &&
        col("user_id").between(ulo, uhi))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("sum_value"))
  }

  test("q145 crash: swap owed at the marker rolls FORWARD, serving identical") {
    // fresh staged state (writeLayoutOnce rebuilds when the dir is gone)
    for (leaf <- Seq("base", "cuts", "delta0", "delta1", "next", "next_cuts",
        "RELAYOUT_PENDING")) {
      val (fs, p) = hfs(Layout.mDir(spark, sf, leaf))
      if (fs.exists(p)) fs.delete(p, true)
    }
    Layout.stageRelayout(spark, sf)
    Layout.doRelayout(spark, sf, haltBeforeSwap = true)
    val (fsM, mk) = hfs(Layout.markerPath(spark, sf))
    assert(fsM.exists(mk), "marker must be owed after the halt")
    // the serve path must recover (complete the swap) and land on the
    // raw replay — the crash window is invisible to results
    val served = SparkEntry.queries("q145_zorder_relayout")(spark, sf)
    val raw = rawBoxOverAll()
    assert(served.exceptAll(raw).isEmpty && raw.exceptAll(served).isEmpty)
    assert(!fsM.exists(mk), "marker must be consumed by roll-forward")
    val (fsN, nextP) = hfs(Layout.mDir(spark, sf, "next"))
    assert(!fsN.exists(nextP), "next segment must have been swapped in")
  }

  test("q145: idempotent — a re-serve finds an empty tail, compacts nothing") {
    def baseFiles() = {
      val (fs, p) = hfs(Layout.mDir(spark, sf, "base"))
      def walk(q: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
        fs.listStatus(q).toSeq.flatMap(st =>
          if (st.isDirectory) walk(st.getPath)
          else Seq(st.getPath.toString -> st.getModificationTime))
      walk(p).sortBy(_._1)
    }
    val before = baseFiles()
    val served = SparkEntry.queries("q145_zorder_relayout")(spark, sf)
    val raw = rawBoxOverAll()
    assert(served.exceptAll(raw).isEmpty && raw.exceptAll(served).isEmpty)
    assert(baseFiles() == before, "re-serve must not rewrite the store")
  }

  test("q144: status reads q142's serving artifacts — q145's compaction is invisible to it") {
    // q145 (previous tests) already compacted ITS copies; the status row
    // must still reflect the raw split because it scans q142's dirs
    val row = SparkEntry.queries("q144_layout_status")(spark, sf).head()
    val ev = Tables.events(spark, sf)
    val baseN = ev.filter(col("event_id") % 10 =!= 0).count()
    val deltaN = ev.filter(col("event_id") % 10 === 0).count()
    assert(row.getAs[Long]("base_n") == baseN)
    assert(row.getAs[Long]("delta_n") == deltaN)
    assert(row.getAs[Boolean]("compact_due") ==
      (deltaN * 100 >= baseN * Layout.RelayoutThresholdPct))
  }

  test("q150: redelivered micro-batches rewrite byte-identical segments") {
    // run the streaming fold once (builds base + stream deltas)
    val first = SparkEntry.queries("q150_stream_zorder")(spark, sf)
      .collect().toSeq
    // redeliver batch 0 by hand: the foreachBatch body must overwrite
    // the same segment with identical content, leaving serving unchanged
    val b0 = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("tsc"),
        col("user_id"), col("event_type"), col("value"))
      .filter(col("event_id") % 10 === 0)
      .filter(expr("(event_id div 10) % 2") === 0)
    operators.Layout.writeStreamDelta(spark, sf, b0, 0L)
    val second = operators.Layout.serveStreamed(spark, sf).collect().toSeq
    assert(first == second, "redelivery changed the served results")
  }

  test("q140: layout build is paid at most once across repeated serves") {
    val before = Layout.layoutWrites.get()
    SparkEntry.queries("q140_zorder_box")(spark, sf).count()
    SparkEntry.queries("q140_zorder_box")(spark, sf).count()
    val after = Layout.layoutWrites.get()
    assert(after - before <= 1, s"layout written ${after - before}x")
  }
}
