package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-dimensional DATA LAYOUT as an operator: Z-ORDER the events table
  * on (time, user) and serve box queries through partition pruning.
  *
  * The 100-TB problem this solves: a single sort key prunes one dimension —
  * a table laid out by time answers time ranges cheaply but scans
  * EVERYTHING for a user range, and vice versa. Interleaving the bucket
  * bits of both dimensions (Morton/Z-order) gives every partition a small
  * bounding box in BOTH dimensions, so a 2-d box query touches only the
  * partitions whose box intersects it — the technique behind
  * Delta/Iceberg `ZORDER BY`, expressed here with plain Spark primitives:
  * a hive-partitioned write on the z-cell + `IN`-list partition filters at
  * read time (visible as `PartitionFilters` in the scan, asserted in
  * LayoutSpec, measured via the scan's `numFiles` metric).
  *
  * Everything is integer-exact and engine-portable: bucket cuts are
  * `(v - min) * 8 div span`, the box bounds are span fractions of the same
  * min/max, and the oracle replays the identical box over the RAW events
  * (the layout is invisible to results — that's the point of a layout).
  *
  * Scale posture: the layout build is one pass (a min/max agg for the cuts
  * + a partitioned write — at real scale a range-partitioned write keyed
  * on the z-value); the cuts are layout METADATA (one tiny sidecar row),
  * read once per query, never a corpus scan. Candidate cells are
  * enumerated driver-side over the 8x8 grid — O(64), independent of data.
  */
object Layout {

  /** Bits per dimension: 8x8 grid -> 64 z-cells. */
  private[graft] val DimBits = 3
  private[graft] val Grid = 1 << DimBits // 8

  /** Morton interleave of two `DimBits`-bit bucket columns:
    * z = ... t1 u1 t0 u0 (t in odd positions, u in even).
    */
  private[graft] def zCell(t: Column, u: Column): Column =
    (0 until DimBits).map { k =>
      shiftleft(shiftright(t, k).bitwiseAND(lit(1L)), 2 * k + 1) +
        shiftleft(shiftright(u, k).bitwiseAND(lit(1L)), 2 * k)
    }.reduce(_ + _).cast("int")

  /** Driver-side twin of [[zCell]] for candidate-cell enumeration. */
  private[graft] def zId(t: Int, u: Int): Int =
    (0 until DimBits).map { k =>
      (((t >> k) & 1) << (2 * k + 1)) | (((u >> k) & 1) << (2 * k))
    }.sum

  /** Integer bucket of `v` into [0, Grid) given inclusive [min, max]:
    * (v - min) * Grid div (max - min + 1). Monotone, exact, and identical
    * in Spark and DuckDB (both floor-divide nonnegative operands).
    */
  private[graft] def bucketOf(v: Column, min: Column, max: Column): Column =
    call_function("div", (v - min) * lit(Grid.toLong),
      max - min + lit(1L)).cast("long")

  // memo: layout built at most once per (session warehouse, source mtime)
  private val layoutWritten =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  /** Spec counter: the layout write must be paid at most once. */
  private[graft] val layoutWrites =
    new java.util.concurrent.atomic.AtomicInteger(0)

  private def layoutDir(s: SparkSession, d: String): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
    s"$wh/${Bucketed.dbFor(d)}.db/events_zorder"
  }

  /** Cuts sidecar: the layout's metadata row (tmin, tmax, umin, umax). */
  private def cutsDir(s: SparkSession, d: String): String =
    layoutDir(s, d) + "_cuts"

  /** Narrow event projection every layout write shares. */
  private def evProjected(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("tsc"),
        col("user_id"), col("event_type"), col("value"))

  /** Assign z-cells to `ev` under the cuts row `c`. `clamp` pins
    * out-of-range values (a batch arriving AFTER the cuts froze) to the
    * edge buckets — sound for pruning because candidate-cell enumeration
    * only serves boxes INSIDE the frozen span, and an in-box row's
    * buckets are in range by monotonicity; clamped rows can only sit in
    * cells the box already probes, where the residual predicate drops
    * them.
    */
  private[graft] def withCells(ev: DataFrame, c: DataFrame,
      clamp: Boolean): DataFrame = {
    def clampB(b: org.apache.spark.sql.Column) =
      if (clamp) greatest(lit(0L), least(lit((Grid - 1).toLong), b)) else b
    ev.crossJoin(broadcast(c))
      .withColumn("tb", clampB(bucketOf(col("tsc"), col("tmin"), col("tmax"))))
      .withColumn("ub",
        clampB(bucketOf(col("user_id"), col("umin"), col("umax"))))
      .withColumn("zcell", zCell(col("tb"), col("ub")))
      .select(col("event_id"), col("tsc"), col("user_id"),
        col("event_type"), col("value"), col("zcell"))
  }

  /** Memoized z-partitioned write of `df` to `dir`, keyed on the source
    * parquet's mtime (the [[Bucketed.writeOnceBucketed]] contract for
    * path-level artifacts).
    */
  private def writeLayoutOnce(s: SparkSession, d: String, dir: String)(
      df: => DataFrame): String = {
    val srcM = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$d/events.parquet")).toMillis
    layoutWritten.synchronized {
      val prev = layoutWritten.get(dir)
      // Hadoop-FS existence check: the session's warehouse dir is a
      // QUALIFIED URI (file:/... locally, s3a://... on object storage), so
      // java.io paths would silently miss and rebuild every call.
      val hp = new org.apache.hadoop.fs.Path(dir)
      val exists = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .exists(hp)
      if (!(layoutWritten.containsKey(dir) && prev == srcM && exists)) {
        layoutWrites.incrementAndGet()
        // repartition by zcell so each partition dir gets one file per
        // writing task that actually owns the cell (no 32x64 file blowup)
        df.repartition(col("zcell"))
          .write.mode("overwrite").partitionBy("zcell").parquet(dir)
        layoutWritten.put(dir, srcM)
      }
    }
    dir
  }

  /** Build (once) the q140 layout: ALL events partitioned by zcell, with
    * the bucket cuts persisted as a one-row sidecar.
    */
  private[graft] def zLayout(s: SparkSession, d: String): String = {
    val dir = layoutDir(s, d)
    writeLayoutOnce(s, d, dir) {
      val ev = evProjected(s, d)
      ev.agg(min(col("tsc")).as("tmin"), max(col("tsc")).as("tmax"),
          min(col("user_id")).as("umin"), max(col("user_id")).as("umax"))
        .coalesce(1).write.mode("overwrite").parquet(cutsDir(s, d))
      withCells(ev, s.read.parquet(cutsDir(s, d)), clamp = false)
    }
  }

  // ---- q142: incremental layout maintenance ------------------------------

  private[graft] def baseDir(s: SparkSession, d: String): String =
    layoutDir(s, d) + "_corpus"
  private[graft] def baseCutsDir(s: SparkSession, d: String): String =
    baseDir(s, d) + "_cuts"
  private def deltaDir(s: SparkSession, d: String, k: Int): String =
    layoutDir(s, d) + s"_delta$k"

  /** q162's landed event tombstones (event_id) — write-once staged side
    * table (the q155_tombs shape): takedowns land O(|tombstones|) rows
    * once, and every box serve broadcasts THIS instead of re-deriving
    * the set from a raw events scan.
    */
  private[graft] def q162TombArtifact(s: SparkSession, d: String): DataFrame =
    Bucketed.writeOnceBucketed(s, Bucketed.dbFor(d), "q162_tombs",
      s"$d/events.parquet",
      Tables.events(s, d)
        .filter(pmod(col("event_id"), lit(Dedup.TombMod)) === Dedup.TombRes)
        .select(col("event_id")),
      8, Seq("event_id"))

  /** Frozen corpus layout (event_id % 10 != 0) + its cuts sidecar. */
  private[graft] def zBase(s: SparkSession, d: String): String = {
    buildBaseStore(s, d, baseDir(s, d), baseCutsDir(s, d))
    baseDir(s, d)
  }

  /** Fold batch `k` into the layout WITHOUT touching the corpus files:
    * the batch is z-assigned under the FROZEN corpus cuts (values outside
    * the frozen span clamp to edge buckets — see [[withCells]]) and lands
    * as its own delta segment. The corpus layout is never rewritten; the
    * un-reclustered delta tail is what a periodic re-layout (the
    * Delta/Iceberg `OPTIMIZE ZORDER` cadence, q131's trigger shape)
    * folds down.
    */
  private[graft] def zDelta(s: SparkSession, d: String, k: Int): String = {
    zBase(s, d) // cuts must exist (and stay frozen) before any delta
    buildDeltaStore(s, d, baseCutsDir(s, d), deltaDir(s, d, k), k)
    deltaDir(s, d, k)
  }

  // ---- q144/q145: re-layout trigger + crash-safe compaction ---------------
  //
  // q145 works on ITS OWN staged copies of base/deltas (the q131 lesson:
  // q142's serving dirs must survive whatever order the suite runs in, so
  // the destructive compaction never touches them).

  private[graft] def mDir(s: SparkSession, d: String, leaf: String): String =
    layoutDir(s, d) + "_m_" + leaf

  /** Threshold: re-layout when the un-reclustered delta tail reaches 5%
    * of the corpus rows. The real split's tail is ~11%, so the trigger
    * fires on real data at every tier (the q131 convention: one family
    * exercising each verdict path without synthetic help — the span
    * family covers leave-staged).
    */
  private[graft] val RelayoutThresholdPct = 5L

  /** ONE definition of the corpus-store build — q142's serving dirs and
    * q145's compactable copies differ only in target paths, and the three
    * consumers (zBase, zDelta, stageRelayout) MUST stay byte-identical in
    * projection/split/clamp or q144's trigger (which scans q142's dirs)
    * drifts from the store q145 actually compacts.
    */
  private def buildBaseStore(s: SparkSession, d: String, base: String,
      cuts: String): Unit =
    writeLayoutOnce(s, d, base) {
      val ev = evProjected(s, d).filter(col("event_id") % 10 =!= 0)
      ev.agg(min(col("tsc")).as("tmin"), max(col("tsc")).as("tmax"),
          min(col("user_id")).as("umin"), max(col("user_id")).as("umax"))
        .coalesce(1).write.mode("overwrite").parquet(cuts)
      withCells(ev, s.read.parquet(cuts), clamp = false)
    }

  private def buildDeltaStore(s: SparkSession, d: String, cuts: String,
      deltaK: String, k: Int): Unit =
    writeLayoutOnce(s, d, deltaK) {
      val b = evProjected(s, d).filter(col("event_id") % 10 === 0)
        .filter(pmod(call_function("div", col("event_id"), lit(10L)),
          lit(2L)) === k)
      withCells(b, s.read.parquet(cuts), clamp = true)
    }

  /** Stage q145's own base/delta copies (write-once). */
  private[graft] def stageRelayout(s: SparkSession, d: String): Unit = {
    buildBaseStore(s, d, mDir(s, d, "base"), mDir(s, d, "cuts"))
    for (k <- 0 until 2)
      buildDeltaStore(s, d, mDir(s, d, "cuts"), mDir(s, d, s"delta$k"), k)
  }

  private def fsOf(s: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(s.sparkContext.hadoopConfiguration), hp)
  }
  private def dirExists(s: SparkSession, p: String): Boolean = {
    val (fs, hp) = fsOf(s, p); fs.exists(hp)
  }
  // Hadoop FileSystem signals failure by RETURNING FALSE, not throwing —
  // an unchecked delete/rename inside the recovery path would proceed to
  // truncate the deltas and drop the redo marker over a half-done swap,
  // which is exactly the corruption the marker exists to prevent. Throw.
  private def deleteDir(s: SparkSession, p: String): Unit = {
    val (fs, hp) = fsOf(s, p)
    if (fs.exists(hp)) require(fs.delete(hp, true), s"delete failed: $p")
  }
  private def renameDir(s: SparkSession, from: String, to: String): Unit = {
    val (fs, f) = fsOf(s, from)
    require(fs.rename(f, new org.apache.hadoop.fs.Path(to)),
      s"rename failed: $from -> $to")
  }
  /** Truncate a delta dir to an EMPTY but existing dir (so write-once
    * memos see it and the status scan reads zero rows, not a missing
    * path).
    */
  private def truncateDelta(s: SparkSession, p: String): Unit = {
    val (fs, hp) = fsOf(s, p)
    if (fs.exists(hp)) fs.listStatus(hp).foreach(st => fs.delete(st.getPath, true))
    else fs.mkdirs(hp)
  }

  private[graft] def markerPath(s: SparkSession, d: String): String =
    mDir(s, d, "RELAYOUT_PENDING")

  /** Roll FORWARD a crashed re-layout swap (the redo-marker contract the
    * bucketed stores use): the marker is created only after `_next` +
    * `_next_cuts` are fully written, so any crash state with the marker
    * present completes by (re-)doing delete-old, rename-next, truncate
    * deltas, drop marker — each step idempotent.
    */
  private[graft] def recoverRelayout(s: SparkSession, d: String): Unit = {
    val (fs, mk) = fsOf(s, markerPath(s, d))
    if (!fs.exists(mk)) return
    if (dirExists(s, mDir(s, d, "next"))) {
      deleteDir(s, mDir(s, d, "base"))
      renameDir(s, mDir(s, d, "next"), mDir(s, d, "base"))
    }
    if (dirExists(s, mDir(s, d, "next_cuts"))) {
      deleteDir(s, mDir(s, d, "cuts"))
      renameDir(s, mDir(s, d, "next_cuts"), mDir(s, d, "cuts"))
    }
    for (k <- 0 until 2) truncateDelta(s, mDir(s, d, s"delta$k"))
    fs.delete(mk, false)
  }

  /** The re-layout ACTION: recluster base ∪ deltas under FRESH cuts
    * (re-layout exists to adopt the new distribution), write the new
    * segment beside the old, then swap through the redo marker. Exposed
    * with a `haltBeforeSwap` seam so the crash spec can kill the driver
    * at the worst window and prove roll-forward.
    */
  private[graft] def doRelayout(s: SparkSession, d: String,
      haltBeforeSwap: Boolean = false): Unit = {
    val all = (Seq(mDir(s, d, "base")) ++
      (0 until 2).map(k => mDir(s, d, s"delta$k")))
      .map(p => s.read.parquet(p).drop("zcell"))
      .reduce(_ unionByName _)
    all.agg(min(col("tsc")).as("tmin"), max(col("tsc")).as("tmax"),
        min(col("user_id")).as("umin"), max(col("user_id")).as("umax"))
      .coalesce(1).write.mode("overwrite").parquet(mDir(s, d, "next_cuts"))
    withCells(all, s.read.parquet(mDir(s, d, "next_cuts")), clamp = false)
      .repartition(col("zcell"))
      .write.mode("overwrite").partitionBy("zcell")
      .parquet(mDir(s, d, "next"))
    val (fs, mk) = fsOf(s, markerPath(s, d))
    fs.create(mk, true).close() // swap is now OWED — roll forward from here
    if (haltBeforeSwap) return
    recoverRelayout(s, d)
  }

  /** Whether a (possibly truncated-to-empty) dir holds any parquet file —
    * a pure driver-side listing; `spark.read.parquet` cannot even infer a
    * schema from zero files, and a Spark count job just to compare
    * against zero would waste two jobs on the hot serve path.
    */
  private def hasParquetFiles(s: SparkSession, p: String): Boolean = {
    val (fs, hp) = fsOf(s, p)
    def walk(dir: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(dir) && fs.listStatus(dir).exists(st =>
        if (st.isDirectory) walk(st.getPath)
        else st.getPath.getName.endsWith(".parquet"))
    walk(hp)
  }

  // ---- q150: continuous layout maintenance --------------------------------

  private def streamDeltaDir(s: SparkSession, d: String, batchId: Long) =
    layoutDir(s, d) + s"_s_delta$batchId"

  /** foreachBatch body: land micro-batch `batchId` as its own z-assigned
    * delta segment under the FROZEN corpus cuts. mode=overwrite keyed by
    * the batch id makes REDELIVERY structurally idempotent: a replayed
    * batch rewrites the same dir with byte-identical content (the split
    * and the cut arithmetic are deterministic), so at-least-once delivery
    * serves exactly-once results — the q136 argument, for the layout.
    */
  private[graft] def writeStreamDelta(s: SparkSession, d: String,
      df: DataFrame, batchId: Long): Unit =
    withCells(df, s.read.parquet(baseCutsDir(s, d)), clamp = true)
      .repartition(col("zcell"))
      .write.mode("overwrite").partitionBy("zcell")
      .parquet(streamDeltaDir(s, d, batchId))

  /** Serve the box over base + every accumulated stream-delta segment
    * (FS-listed, so the reader needs no registry of how many folds ran).
    */
  private[graft] def serveStreamed(s: SparkSession, d: String): DataFrame = {
    val (fs, hp) = fsOf(s, layoutDir(s, d))
    val parent = hp.getParent
    val leaf = hp.getName + "_s_delta"
    val deltas =
      if (fs.exists(parent))
        fs.listStatus(parent).map(_.getPath)
          .filter(_.getName.startsWith(leaf)).map(_.toString).toSeq
      else Seq.empty
    serveBox(s, baseDir(s, d) +: deltas.sorted, baseCutsDir(s, d))
  }

  /** The q140 box bounds, derived from the cuts row: time in
    * [tmin + tspan/8, tmin + tspan/2], user in [umin + uspan/4,
    * umin + uspan/2] — integer span fractions both engines compute
    * identically from the same min/max.
    */
  private[graft] def boxOf(tmin: Long, tmax: Long, umin: Long, umax: Long)
      : (Long, Long, Long, Long) = {
    val tspan = tmax - tmin + 1
    val uspan = umax - umin + 1
    (tmin + tspan / 8, tmin + tspan / 2,
      umin + uspan / 4, umin + uspan / 2)
  }

  /** THE box serve every layout query shares: read the cuts row, derive
    * the box + its candidate z-cells driver-side (an O(64) grid loop),
    * scan each segment under the IN-list partition filter + the exact
    * residual, aggregate. One definition — q140/q142/q145 must not drift
    * in bucket or box arithmetic.
    */
  private def serveBox(s: SparkSession, dirs: Seq[String],
      cuts: String, minus: Option[DataFrame] = None): DataFrame = {
    val cut = s.read.parquet(cuts).head()
    val (tmin, tmax, umin, umax) =
      (cut.getLong(0), cut.getLong(1), cut.getLong(2), cut.getLong(3))
    val (tlo, thi, ulo, uhi) = boxOf(tmin, tmax, umin, umax)
    def b(v: Long, mn: Long, mx: Long): Int =
      ((v - mn) * Grid / (mx - mn + 1)).toInt
    val cells = for {
      tb <- b(tlo, tmin, tmax) to b(thi, tmin, tmax)
      ub <- b(ulo, umin, umax) to b(uhi, umin, umax)
    } yield zId(tb, ub)
    val boxed = dirs
      .map(p => s.read.parquet(p).filter(col("zcell").isin(cells: _*)))
      .reduce(_ unionByName _)
      .filter(col("tsc").between(tlo, thi) &&
        col("user_id").between(ulo, uhi))
    // q162's deletion verb: landed takedowns anti-joined below the agg,
    // AFTER the partition pruning + residual (the tombstone set is tiny
    // relative to the pruned scan — subtracting first would defeat the
    // IN-list). The layout files are untouched on the landing path;
    // physical drop rides the q144-triggered q145 re-layout, whose
    // fresh recluster reads the tombstone-filtered view.
    minus.map(t => boxed.join(broadcast(t), Seq("event_id"), "left_anti"))
      .getOrElse(boxed)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Q.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Shared q140/q145 oracle: the box (bounds from ALL events) replayed
    * over the raw table — any layout must be invisible to it.
    */
  private val sqlBoxOverAll: String =
    s"""WITH c AS (SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax,
       |    min(user_id) AS umin, max(user_id) AS umax FROM events),
       |  box AS (SELECT tmin + (tmax - tmin + 1) // 8 AS tlo,
       |      tmin + (tmax - tmin + 1) // 2 AS thi,
       |      umin + (umax - umin + 1) // 4 AS ulo,
       |      umin + (umax - umin + 1) // 2 AS uhi FROM c)
       |SELECT event_type, COUNT(*) AS n, ${graft.Q.sqlDsum("value")} AS sum_value
       |FROM events, box
       |WHERE epoch_us(ts) BETWEEN tlo AND thi
       |  AND user_id BETWEEN ulo AND uhi
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q140 — Z-ORDER box query: aggregate a 2-d (time x user) box over the
    // z-laid-out events, reading ONLY the partitions whose cell intersects
    // the box. Candidate cells are enumerated driver-side from the layout
    // metadata (an O(64) loop over the grid, never a data scan); the scan
    // carries `PartitionFilters: zcell IN (...)` plus the exact residual
    // predicate. The oracle replays the identical box over the raw,
    // un-laid-out events — layouts must be invisible to results. LayoutSpec
    // measures the pruning (files read under the IN-list vs the full
    // layout) and proves the layout build is paid once.
    "q140_zorder_box" -> ((s, d) => {
      val dir = zLayout(s, d)
      serveBox(s, Seq(dir), cutsDir(s, d))
    }),

    // q142 — INCREMENTAL layout maintenance: the q140 technique kept
    // current as data arrives, without re-clustering the corpus. Two
    // batches fold in as delta segments z-assigned under the FROZEN
    // corpus cuts (out-of-span values clamp to edge cells — sound, see
    // [[withCells]]); the box query probes base + deltas with the SAME
    // IN-list partition filter and serves the union. The oracle replays
    // the box (bounds from the corpus span) over ALL raw events, so
    // fold + serve == from-scratch is hash-proven. The corpus files are
    // never rewritten — the delta tail is the growth a periodic
    // re-layout folds down on the q131 cadence (the OPTIMIZE ZORDER
    // rhythm every lakehouse runs); LayoutSpec pins the clamp hard case
    // with a planted out-of-span batch.
    "q142_zorder_incremental" -> ((s, d) => {
      val base = zBase(s, d)
      val deltas = Seq(zDelta(s, d, 0), zDelta(s, d, 1))
      serveBox(s, base +: deltas, baseCutsDir(s, d))
    }),

    // q162 — layout DELETION: the takedown verb for the z-order store.
    // Tombstoned event ids LAND ONCE as a write-once side table (the
    // q155_tombs shape — O(|tombstones|) rows staged at takedown time)
    // and are broadcast-anti-joined out of the box serve BELOW the
    // aggregation but AFTER the partition pruning (see [[serveBox]]) —
    // the layout's files and frozen cuts are untouched on the landing
    // path, and the SERVE path probes only the staged side set, never
    // rescanning the raw events table (round-11 advice: the inline
    // filter made every serve pay a source scan the landed-set model
    // claims to avoid). Physical drop rides the q144 trigger → q145
    // re-layout cadence. Oracle: the identical box (bounds still from
    // ALL events — the cuts are frozen) over the raw SURVIVORS, so the
    // logical delete is hash-proven complete.
    "q162_layout_tombstone" -> ((s, d) => {
      val base = zBase(s, d)
      val deltas = Seq(zDelta(s, d, 0), zDelta(s, d, 1))
      serveBox(s, base +: deltas, baseCutsDir(s, d),
        Some(q162TombArtifact(s, d)))
    }),

    // q144 — RE-LAYOUT TRIGGER as data (the q131 pattern for the layout
    // family): one status row for the z-order store — corpus rows, the
    // un-reclustered delta tail, the declared threshold, and an
    // integer-exact verdict (delta_n·100 >= base_n·thr, no float
    // boundary). Counts scan q142's SERVING artifacts (which nothing
    // truncates — q145 compacts its own staged copies, so status never
    // depends on intra-session query order). The real split's ~11% tail
    // crosses the 5% threshold, so the due path runs on real data at
    // every tier; the oracle recomputes both counts from the raw events.
    "q144_layout_status" -> ((s, d) => {
      val base = zBase(s, d)
      val deltas = Seq(zDelta(s, d, 0), zDelta(s, d, 1))
      val bn = s.read.parquet(base).agg(count(lit(1)).as("base_n"))
      val dn = deltas.map(p => s.read.parquet(p)).reduce(_ unionByName _)
        .agg(count(lit(1)).as("delta_n"))
      bn.crossJoin(dn)
        .select(lit("events_zorder").as("family"), col("base_n"),
          col("delta_n"),
          lit(RelayoutThresholdPct).as("threshold_pct"),
          (col("delta_n") * 100 >= col("base_n") * RelayoutThresholdPct)
            .as("compact_due"))
    }),

    // q145 — the RE-LAYOUT action (OPTIMIZE ZORDER): recluster
    // base ∪ delta tail under FRESH cuts (adopting the new distribution
    // is the point of re-laying-out), write the new segment beside the
    // old, swap through a redo marker (created only after `_next` is
    // fully written — every crash state rolls FORWARD, spec-proven with
    // a halt-before-swap seam), truncate the deltas, then serve the box
    // from the compacted store alone. Fresh cuts span ALL events, so the
    // box equals q140's and the oracle is the same raw replay —
    // compaction must be invisible to results. Idempotent: a re-serve
    // finds an empty tail and compacts nothing (spec-pinned).
    // q148 — GRID-RESOLUTION SWEEP: the z-order tuning curve (the
    // q141b/q117/q137 honest-audit pattern applied to the layout knob).
    // For each grid size {4x4, 8x8, 16x16}: how many cells the q140 box
    // probes, how many rows those cells hold (what a scan READS), and
    // how many actually match the box (what a scan KEEPS) — the
    // read-amplification-vs-file-count trade a deployment measures
    // before choosing DimBits. No physical layouts are written: the
    // would-be-scanned mass is computable exactly from the bucket
    // arithmetic (rows whose buckets fall in the box's bucket
    // rectangle), so the whole curve is one events pass per grid and
    // every column is an integer the oracle replays. At the shipping
    // 8x8: ~23% of rows read for ~7% matched (sf0.1) — finer grids cut
    // the gap at the price of more, smaller files.
    "q148_zorder_grid_sweep" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(unix_micros(col("ts")).as("tsc"), col("user_id"))
      val c = ev.agg(min(col("tsc")), max(col("tsc")),
        min(col("user_id")), max(col("user_id"))).head()
      val (tmin, tmax, umin, umax) =
        (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
      val (tlo, thi, ulo, uhi) = boxOf(tmin, tmax, umin, umax)
      def bk(v: Long, mn: Long, mx: Long, g: Long): Long =
        (v - mn) * g / (mx - mn + 1)
      def bg(v: Column, mn: Long, mx: Long, g: Long): Column =
        call_function("div", (v - lit(mn)) * lit(g), lit(mx - mn + 1L))
      val perGrid = Seq(4L, 8L, 16L).map { g =>
        val nCells = (bk(thi, tmin, tmax, g) - bk(tlo, tmin, tmax, g) + 1) *
          (bk(uhi, umin, umax, g) - bk(ulo, umin, umax, g) + 1)
        val inRect = bg(col("tsc"), tmin, tmax, g)
            .between(bk(tlo, tmin, tmax, g), bk(thi, tmin, tmax, g)) &&
          bg(col("user_id"), umin, umax, g)
            .between(bk(ulo, umin, umax, g), bk(uhi, umin, umax, g))
        val inBox = col("tsc").between(tlo, thi) &&
          col("user_id").between(ulo, uhi)
        ev.agg(sum(when(inRect, 1L).otherwise(0L)).as("rows_read"),
            sum(when(inBox, 1L).otherwise(0L)).as("rows_matched"))
          .select(lit(g).as("grid"), lit(nCells).as("n_cells_probed"),
            col("rows_read"), col("rows_matched"))
      }
      perGrid.reduce(_ unionByName _).orderBy(col("grid"))
    }),

    "q145_zorder_relayout" -> ((s, d) => {
      // Recovery FIRST (the Dedup.maintenanceTick rule): a marker
      // stranded by a crashed previous session must replay its owed swap
      // BEFORE staging — stage-then-recover would let a stale `_next`
      // segment (built from an older source) overwrite freshly restaged
      // stores. After a cross-session recovery over regenerated data the
      // stage step's mtime memo then rebuilds, the tail is non-empty,
      // and the re-layout below re-compacts from current data.
      recoverRelayout(s, d)
      stageRelayout(s, d)
      val tail = (0 until 2)
        .exists(k => hasParquetFiles(s, mDir(s, d, s"delta$k")))
      if (tail) doRelayout(s, d)
      serveBox(s, Seq(mDir(s, d, "base")), mDir(s, d, "cuts"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q140_zorder_box" -> sqlBoxOverAll,

    // q142: box bounds from the CORPUS span (the frozen cuts), predicate
    // over ALL events — fold + serve must equal this from-scratch replay
    "q142_zorder_incremental" ->
      s"""WITH c AS (SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax,
         |    min(user_id) AS umin, max(user_id) AS umax FROM events
         |    WHERE event_id % 10 <> 0),
         |  box AS (SELECT tmin + (tmax - tmin + 1) // 8 AS tlo,
         |      tmin + (tmax - tmin + 1) // 2 AS thi,
         |      umin + (umax - umin + 1) // 4 AS ulo,
         |      umin + (umax - umin + 1) // 2 AS uhi FROM c)
         |SELECT event_type, COUNT(*) AS n, ${graft.Q.sqlDsum("value")} AS sum_value
         |FROM events, box
         |WHERE epoch_us(ts) BETWEEN tlo AND thi
         |  AND user_id BETWEEN ulo AND uhi
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q162: q142's replay (bounds from the frozen corpus span) over the
    // raw SURVIVORS — the logical delete must be complete and exact
    "q162_layout_tombstone" ->
      s"""WITH c AS (SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax,
         |    min(user_id) AS umin, max(user_id) AS umax FROM events
         |    WHERE event_id % 10 <> 0),
         |  box AS (SELECT tmin + (tmax - tmin + 1) // 8 AS tlo,
         |      tmin + (tmax - tmin + 1) // 2 AS thi,
         |      umin + (umax - umin + 1) // 4 AS ulo,
         |      umin + (umax - umin + 1) // 2 AS uhi FROM c)
         |SELECT event_type, COUNT(*) AS n, ${graft.Q.sqlDsum("value")} AS sum_value
         |FROM events, box
         |WHERE epoch_us(ts) BETWEEN tlo AND thi
         |  AND user_id BETWEEN ulo AND uhi
         |  AND event_id % ${Dedup.TombMod} <> ${Dedup.TombRes}
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q144: both counts recomputed from the raw events; the verdict is
    // the same integer arithmetic
    "q144_layout_status" ->
      s"""WITH b AS (SELECT COUNT(*) AS base_n FROM events
         |           WHERE event_id % 10 <> 0),
         |  dl AS (SELECT COUNT(*) AS delta_n FROM events
         |         WHERE event_id % 10 = 0)
         |SELECT 'events_zorder' AS family, base_n, delta_n,
         |  CAST($RelayoutThresholdPct AS BIGINT) AS threshold_pct,
         |  (delta_n * 100 >= base_n * $RelayoutThresholdPct) AS compact_due
         |FROM b, dl""".stripMargin,

    // q145: fresh cuts span ALL events, so the compacted serve must equal
    // the q140 box replay over the raw table — compaction is invisible
    "q145_zorder_relayout" -> sqlBoxOverAll,

    // q148: bucket arithmetic, box bounds and both row tallies replayed
    // per grid — the tuning curve itself is hash-checked
    "q148_zorder_grid_sweep" ->
      s"""WITH c AS (SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax,
         |    min(user_id) AS umin, max(user_id) AS umax FROM events),
         | box AS (SELECT tmin, tmax, umin, umax,
         |    tmin + (tmax - tmin + 1) // 8 AS tlo,
         |    tmin + (tmax - tmin + 1) // 2 AS thi,
         |    umin + (umax - umin + 1) // 4 AS ulo,
         |    umin + (umax - umin + 1) // 2 AS uhi FROM c),
         | g AS (SELECT unnest([4, 8, 16]) AS g)
         |SELECT CAST(g.g AS BIGINT) AS grid,
         |  CAST((((thi - tmin) * g.g) // (tmax - tmin + 1)
         |      - ((tlo - tmin) * g.g) // (tmax - tmin + 1) + 1) *
         |    (((uhi - umin) * g.g) // (umax - umin + 1)
         |      - ((ulo - umin) * g.g) // (umax - umin + 1) + 1) AS BIGINT)
         |    AS n_cells_probed,
         |  CAST(SUM(CASE WHEN ((epoch_us(ts) - tmin) * g.g) // (tmax - tmin + 1)
         |        BETWEEN ((tlo - tmin) * g.g) // (tmax - tmin + 1)
         |            AND ((thi - tmin) * g.g) // (tmax - tmin + 1)
         |       AND ((user_id - umin) * g.g) // (umax - umin + 1)
         |        BETWEEN ((ulo - umin) * g.g) // (umax - umin + 1)
         |            AND ((uhi - umin) * g.g) // (umax - umin + 1)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_read,
         |  CAST(SUM(CASE WHEN epoch_us(ts) BETWEEN tlo AND thi
         |        AND user_id BETWEEN ulo AND uhi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS rows_matched
         |FROM events, box, g
         |GROUP BY grid, n_cells_probed ORDER BY grid""".stripMargin
  )
}
