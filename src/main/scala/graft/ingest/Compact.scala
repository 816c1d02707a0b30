package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing-zone compaction: the batch half of the land-then-compact
  * ingest layout.
  *
  * The streaming sink's hour-partitioned mode caps at ~242k rows/s vs
  * 788k plain (BASELINE.md round-8 ingest table) — dynamic-partition
  * file handling forces every micro-batch to open a writer per touched
  * hour, and the file-sink metadata log amplifies the file count. The
  * scalable layout lands UNPARTITIONED at full sink speed (value +
  * event timestamp), and this job periodically folds the landing files
  * into the hive-partitioned table downstream queries prune against:
  * one shuffle keyed by the derived partition value, so each hour's
  * rows coalesce into few large files instead of
  * micro-batch × partition shards.
  *
  * At 100 TB/day this runs incrementally: each invocation compacts one
  * closed window of landing files (`sinceMs`/`untilMs` bound the event
  * time; the orchestrator deletes landed files once their window is
  * committed) and appends new hour directories to the compacted table —
  * existing hours are never rewritten, so readers are undisturbed and
  * reruns of a failed window are idempotent per partition
  * (overwrite-by-partition via dynamic partitionOverwriteMode).
  *
  * Reference behavior being served: the reference daemon partitions its
  * Kafka output per record (fnv-1a32 / random / manual,
  * /root/reference/syslog.go:92-117); a parquet landing zone is the
  * lake-side analog, and hour-granularity pruning is what its consumers
  * get from Kafka offsets+time indexes.
  */
object Compact {

  /** Derived hive partition column from the epoch-ms `timestamp`. */
  private def partExpr(granularity: String) = granularity match {
    case "day" => date_format(timestamp_millis(col("timestamp")), "yyyy-MM-dd")
    case _ => date_format(timestamp_millis(col("timestamp")), "yyyy-MM-dd-HH")
  }

  /** Compact `landingDir` (plain parquet: value binary, timestamp long)
    * into `outDir` hive-partitioned by hour/day. Returns rows compacted.
    *
    * The shuffle is keyed by (partition value, salt): keying by the
    * partition value ALONE sends each hour's entire volume to one task —
    * measured on this box at 8.4M single-hour rows, the whole compaction
    * serialized behind one writer (87k rows/s). A compaction window is
    * typically one or two hours, i.e. one or two distinct keys, so the
    * hot-key case is the NORMAL case here, not a tail risk. The
    * `writersPerPartition` salt bounds files per hour (the compaction
    * contract downstream scans rely on) while letting that hour's volume
    * spread over that many writer tasks; `maxRecordsPerFile` additionally
    * caps file size within each writer.
    */
  def run(spark: SparkSession, landingDir: String, outDir: String,
      granularity: String = "hour", sinceMs: Long = Long.MinValue,
      untilMs: Long = Long.MaxValue, writersPerPartition: Int = 16,
      maxRecordsPerFile: Long = 5000000L): Long = {
    require(Set("hour", "day")(granularity),
      s"granularity must be hour or day, got '$granularity'")
    // The window-alignment guard below validates UTC boundaries, but
    // partExpr renders via date_format, which uses the SESSION timezone.
    // With a non-UTC session the guard would pass windows misaligned with
    // the local-time partitions — re-enabling the partial-partition
    // dynamic-overwrite loss it exists to prevent — so the two must share
    // one timezone. All graft sessions are UTC ([[graft.Sessions]]).
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "Compact.run requires spark.sql.session.timeZone=UTC: the " +
        "window-alignment guard and the ingest_part derivation must " +
        "agree on the partition boundary timezone")
    // A window bound inside a partition would make the dynamic overwrite
    // DELETE the rest of that partition's already-compacted rows (the
    // rewrite replaces the whole touched partition with only the
    // window's subset) — silent data loss, so misaligned bounds are
    // rejected instead of "handled".
    val unitMs = if (granularity == "day") 86400000L else 3600000L
    for ((b, name) <- Seq(sinceMs -> "sinceMs", untilMs -> "untilMs"))
      require(b == Long.MinValue || b == Long.MaxValue || b % unitMs == 0,
        s"$name ($b) must be aligned to the $granularity boundary " +
          s"($unitMs ms) — a partial-partition window would overwrite " +
          "the partition with only its subset")
    val landed = spark.read.parquet(landingDir)
      .filter(col("timestamp") >= sinceMs && col("timestamp") < untilMs)
    val parted = landed
      .withColumn("ingest_part", partExpr(granularity))
      .repartition(col("ingest_part"),
        pmod(hash(col("value"), col("timestamp")),
          lit(writersPerPartition)))
    val n = compactedWrite(spark, parted, outDir, maxRecordsPerFile)
    n
  }

  private def compactedWrite(spark: SparkSession, df: DataFrame,
      outDir: String, maxRecordsPerFile: Long): Long = {
    // row count via an observation metric: collected DURING the write,
    // so the landing data is read exactly once (a cache+count pass
    // would double the job's scan cost for bookkeeping)
    val obs = new org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write
      // per-write dynamic overwrite (idempotent reruns: a failed
      // window's retry replaces exactly the partitions it writes, never
      // the whole table). Set as a WRITER option, not session conf —
      // mutating the session-global conf races with concurrent writes
      // on the same SparkSession.
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("ingest_part")
      .mode("overwrite")
      .parquet(outDir)
    obs.get("rows").asInstanceOf[Long]
  }

  /** CLI: `graft.ingest.Compact <landingDir> <outDir> [hour|day]`. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.ingest.Compact <landingDir> <outDir> [hour|day]")
    val spark = graft.Sessions.local()
    val t0 = System.nanoTime()
    val n = run(spark, args(0), args(1),
      if (args.length > 2) args(2) else "hour")
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"compact_rows_per_sec","value":${(n / sec).round},"unit":"rows/sec","rows":$n,"sec":$sec}""")
    spark.stop()
  }
}
