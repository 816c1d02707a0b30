package graft

import java.io.{BufferedWriter, OutputStreamWriter}
import java.net.Socket
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.Trigger

/** Sustained-ingest throughput bench: ONE continuous streaming query —
  * syslog TCP listener → enrich → Avro transform + Confluent framing →
  * parquet sink — driven by concurrent senders at a fixed offered rate,
  * then drained to zero. This measures the long-running server shape the
  * reference actually is (accept → scan → transform → produce,
  * /root/reference/syslog.go:133-143), where q31b only measures the
  * batch encode kernel over a static table.
  *
  * Senders self-pace against wall-clock (target = elapsed × rate), so if
  * the pipeline can't absorb the offered rate the senders simply run
  * flat-out and the printed `sent/send_sec` IS the achieved ceiling.
  * Backpressure path: a full source buffer blocks the connection readers,
  * which blocks the senders' writes — nothing is dropped on TCP.
  *
  * Prints ONE JSON line. Not part of the driver's Bench gate — run
  * manually; results recorded in BASELINE.md.
  *
  * Env knobs: SPARK_GRAFT_INGEST_RATE (total lines/s offered, default
  * 200000), SPARK_GRAFT_INGEST_SECONDS (send window, default 30),
  * SPARK_GRAFT_INGEST_SENDERS (concurrent TCP connections, default 8).
  */
object IngestBench {

  /** Self-pacing concurrent TCP senders against `port`; returns
    * (sent, sendSec). Shared by the e2e query mode and the accept-only
    * probe so both measure against identical offered load.
    */
  private def runSenders(port: Int, rate: Long, seconds: Int,
      senders: Int): (Long, Double) = {
    val sent = new AtomicLong(0)
    val senderError =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t0 = System.nanoTime()
    val deadline = t0 + seconds.toLong * 1000000000L
    val perSender = rate / senders
    val threads = (1 to senders).map { id =>
      new Thread(() => try {
        val sock = new Socket("127.0.0.1", port)
        val w = new BufferedWriter(
          new OutputStreamWriter(sock.getOutputStream, "UTF-8"), 1 << 16)
        val line = s"<34>1 sustained ingest bench sender $id " +
          "payload 0123456789 abcdefghijklmnopqrstuvwxyz end"
        var i = 0L
        while (System.nanoTime() < deadline) {
          val target = // self-pacing: catch up to elapsed*rate
            ((System.nanoTime() - t0) / 1e9 * perSender).toLong
          while (i < target && System.nanoTime() < deadline) {
            w.write(line); w.write('\n'); i += 1
          }
          w.flush()
          Thread.sleep(2)
        }
        w.flush(); sock.close()
        sent.addAndGet(i)
      } catch { // surface, never under-report silently
        case e: Throwable => senderError.compareAndSet(null, e)
      }, s"ingest-sender-$id")
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    if (senderError.get() != null) throw senderError.get()
    (sent.get(), (System.nanoTime() - t0) / 1e9)
  }

  /** Accept-only probe (SPARK_GRAFT_INGEST_MODE=accept): drive the
    * MicroBatchStream DIRECTLY — senders against the listener, a tight
    * plan/commit loop standing in for an infinitely fast pipeline — so
    * the printed rate is the socket->buffer acceptance ceiling alone,
    * isolating the `listeners` fan-out from query-side encode/sink cost.
    */
  private def acceptOnly(rate: Long, seconds: Int, senders: Int,
      listeners: Int): Unit = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("tcp.port", "-1"); opts.put("udp.port", "0")
    opts.put("tcp.host", "127.0.0.1")
    opts.put("maxBufferedRows", "4000000")
    opts.put("listeners", listeners.toString)
    val stream = new sources.SyslogMicroBatchStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
    val port = sources.SyslogState.lastTcpPort
    val drained = new AtomicLong(0)
    @volatile var stopDrain = false
    val drainer = new Thread(() => {
      var cur = stream.initialOffset()
      val lim = org.apache.spark.sql.connector.read.streaming.ReadLimit
        .maxRows(1 << 20)
      val factory = stream.createReaderFactory()
      while (!stopDrain) {
        val end = stream.latestOffset(cur, lim)
        if (end.json() != cur.json()) {
          val parts = stream.planInputPartitions(cur, end)
          var n = 0L
          parts.foreach { p =>
            val r = factory.createReader(p)
            while (r.next()) n += 1
          }
          stream.commit(end)
          drained.addAndGet(n)
          cur = end
        } else Thread.sleep(1)
      }
    }, "accept-drainer")
    drainer.start()
    val t0 = System.nanoTime()
    val (sent, sendSec) = runSenders(port, rate, seconds, senders)
    val settleDeadline = System.nanoTime() + 30000000000L
    while (drained.get() < sent && System.nanoTime() < settleDeadline)
      Thread.sleep(10)
    val sec = (System.nanoTime() - t0) / 1e9
    stopDrain = true; drainer.join(2000); stream.stop()
    require(drained.get() == sent,
      s"accept probe lost rows: sent $sent drained ${drained.get()}")
    println(s"""{"metric":"ingest_accept_rows_per_sec","value":${(sent / sec).round},"unit":"rows/sec","offered_rate":$rate,"senders":$senders,"listeners":$listeners,"sent":$sent,"send_sec":$sendSec}""")
  }

  def main(args: Array[String]): Unit = {
    val rate = sys.env.getOrElse("SPARK_GRAFT_INGEST_RATE", "200000").toLong
    val seconds = sys.env.getOrElse("SPARK_GRAFT_INGEST_SECONDS", "30").toInt
    val senders = sys.env.getOrElse("SPARK_GRAFT_INGEST_SENDERS", "8").toInt
    if (sys.env.getOrElse("SPARK_GRAFT_INGEST_MODE", "e2e") == "accept") {
      acceptOnly(rate, seconds, senders,
        sys.env.getOrElse("SPARK_GRAFT_INGEST_LISTENERS", "1").toInt)
      return
    }

    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString

    val src = spark.readStream.format("graft-syslog")
      .option("tcp.port", "-1").option("udp.port", "0")
      .option("tcp.host", "127.0.0.1")
      .option("maxBufferedRows",
        sys.env.getOrElse("SPARK_GRAFT_INGEST_BUFFER", "2000000"))
      // admission cap interacts with the trigger: throughput can never
      // exceed maxRowsPerBatch / triggerInterval, so raising the trigger
      // requires raising the cap in step
      .option("maxRowsPerBatch",
        sys.env.getOrElse("SPARK_GRAFT_INGEST_MAX_BATCH", "1000000"))
      // acceptance fan-out: N buffer segments / N offset lanes (the
      // round-11 verdict's scale-out knob; see SyslogSource)
      .option("listeners",
        sys.env.getOrElse("SPARK_GRAFT_INGEST_LISTENERS", "1"))
      .load()
    // SPARK_GRAFT_INGEST_PARTITION_BY=hour adds the hive-style landing
    // partition (--sink.partition.by in the CLI): encoded rows land in
    // per-hour directories so downstream incremental jobs prune their
    // scans. The bench senders all stamp "now", so a short run lands in
    // 1-2 hour directories — the knob's cost here is the partition
    // column + dynamic-partition file handling, its benefit downstream.
    val partitionBy =
      sys.env.getOrElse("SPARK_GRAFT_INGEST_PARTITION_BY", "none")
    // File-sink metadata log: every compactInterval-th micro-batch
    // rewrites the WHOLE accumulated file list into one compact file —
    // the measured long-run rate decay (548k->420k rows/s over 30 s at
    // the default 10). Raising the interval defers the rewrites; the
    // real fix at scale is fewer, larger batches (trigger knob above) or
    // a table format with metadata designed for appends.
    val compactInterval =
      sys.env.getOrElse("SPARK_GRAFT_INGEST_COMPACT_INTERVAL", "10")
    spark.conf.set(
      "spark.sql.streaming.fileSink.log.compactInterval", compactInterval)
    import org.apache.spark.sql.functions.{col, date_format, timestamp_millis}
    val enriched = ingest.Transformers.fromSyslog(src)
    val avroVal = ingest.Transformers.avro(
      Seq("dc" -> "dc1", "env" -> "bench"), Some(7L), 42)
    // "land-compact": land UNPARTITIONED at full sink speed, carrying the
    // raw epoch-ms timestamp; a batch [[graft.ingest.Compact]] pass after
    // the drain folds the landing files into hive hour partitions. The
    // measured combined rate is the honest end-to-end cost of the layout
    // that both sustains ingest AND gives downstream queries pruning.
    // SPARK_GRAFT_INGEST_ENCODE=raw skips the Avro transform (projects
    // the raw message only) — splits codec cost from engine machinery
    val encode = sys.env.getOrElse("SPARK_GRAFT_INGEST_ENCODE", "avro")
    val out = if (encode == "raw") src.select(col("message")) else partitionBy match {
      case "hour" =>
        enriched.select(avroVal,
          date_format(timestamp_millis(col("timestamp")), "yyyy-MM-dd-HH")
            .as("ingest_part"))
      case "land-compact" => enriched.select(avroVal, col("timestamp"))
      case _ => enriched.select(avroVal)
    }
    // SPARK_GRAFT_INGEST_SINK=noop isolates source acceptance + encode
    // from the file sink (whose metadata log compacts every 10 batches —
    // rewritten in full, so long runs pay a growing per-commit stall;
    // the degradation is the SINK's, and this knob proves it)
    val sinkFmt = sys.env.getOrElse("SPARK_GRAFT_INGEST_SINK", "parquet")
    require(!(sinkFmt == "noop" && partitionBy == "land-compact"),
      "SINK=noop writes no landing files for the compact pass to read — " +
        "the combination would waste the whole measurement before failing")
    // Row accounting for the noop sink: a listener accumulating every
    // batch's numInputRows. recentProgress would undercount — it retains
    // only the last ~100 progress entries, and a 30 s run at a 500 ms
    // trigger already commits ~60 batches (small triggers/long runs
    // silently blow past 100).
    val noopRows = new AtomicLong(0)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          noopRows.addAndGet(e.progress.numInputRows)
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    // trigger interval is the file-count knob: at 500 ms a 30 s run
    // commits ~60 batches x partitions files and the metadata log's
    // every-10-batches full rewrite grows accordingly — larger triggers
    // are the first mitigation for the long-run sink decay
    val triggerMs = sys.env.getOrElse("SPARK_GRAFT_INGEST_TRIGGER_MS", "500").toLong
    val writer0 = out.writeStream.format(sinkFmt)
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(triggerMs))
    val query = (if (partitionBy == "hour") writer0.partitionBy("ingest_part")
                 else writer0).start()

    val portDeadline = System.nanoTime() + 30000000000L // 30 s
    while (sources.SyslogState.lastTcpPort <= 0) {
      if (query.exception.isDefined)
        throw query.exception.get // surface a failed start, don't spin
      if (System.nanoTime() > portDeadline)
        throw new IllegalStateException("syslog source never bound a port")
      Thread.sleep(50)
    }
    val port = sources.SyslogState.lastTcpPort

    val (sentN, sendSec) = runSenders(port, rate, seconds, senders)
    val t0 = System.nanoTime() - (sendSec * 1e9).toLong

    query.processAllAvailable() // drain: source buffer -> sink, to zero
    val drainSec = (System.nanoTime() - t0) / 1e9
    query.stop()

    val received = // noop sink writes nothing; processed == drained == sent
      if (sinkFmt == "noop") {
        // the listener bus is async — let the counter quiesce after stop
        var prev = -1L; var cur = noopRows.get(); var waited = 0
        while (cur != prev && waited < 40) {
          Thread.sleep(50); prev = cur; cur = noopRows.get(); waited += 1
        }
        cur
      } else spark.read.parquet(outDir).count()
    println(s"""{"metric":"ingest_sustained_rows_per_sec","value":${(received / drainSec).round},"unit":"rows/sec","offered_rate":$rate,"senders":$senders,"sent":$sentN,"received":$received,"send_sec":$sendSec,"drain_sec":$drainSec}""")
    if (partitionBy == "land-compact") {
      val compactDir = outDir + "_compacted"
      val c0 = System.nanoTime()
      val compacted = ingest.Compact.run(spark, outDir, compactDir)
      val compactSec = (System.nanoTime() - c0) / 1e9
      require(compacted == received,
        s"compaction lost rows: landed $received, compacted $compacted")
      val totalSec = drainSec + compactSec
      println(s"""{"metric":"ingest_land_compact_rows_per_sec","value":${(received / totalSec).round},"unit":"rows/sec","received":$received,"drain_sec":$drainSec,"compact_sec":$compactSec,"partitions":${spark.read.parquet(compactDir).select("ingest_part").distinct().count()}}""")
    }
    spark.stop()
  }
}
