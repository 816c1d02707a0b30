package graft

import java.io.PrintWriter
import java.net.Socket

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Seconds, Span}

import graft.ingest.Transformers

/** Producer-path end-to-end WITHOUT a broker: this container ships no
  * Kafka jars at all (none under /opt/spark/jars, none in the offline
  * coursier cache), so `writeStream.format("kafka")` cannot even load and
  * an embedded KRaft broker is impossible. This is the closest possible
  * behavioral test of O14–O18: a real syslog TCP socket feeds the
  * stream; the avro transformer + Confluent framing + fnv1a32
  * partitioner produce EXACTLY the row contract the Spark Kafka sink
  * consumes (topic string, key binary, value binary, partition int); a
  * foreachBatch mock producer captures the rows; then the captured bytes
  * are unframed + decoded with the reference-parity decoder and the
  * partition is recomputed in Scala from the key bytes
  * (V:elodina/siesta-producer/kafka_producer.go:54-69 produce path,
  * partitioner.go:15-44 hash routing).
  */
class KafkaSinkParitySpec extends AnyFunSuite with Eventually {
  private val spark = TestSpark.spark

  private val Tags = Seq("dc" -> "dc1", "env" -> "test")
  private val LogTypeId = Some(7L)
  private val SchemaId = 42
  private val NumPartitions = 4

  test("syslog -> avro transform -> kafka-shaped sink rows, byte-verified") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Array[Byte], Array[Byte], Int)]()

    // named receiver: the SyslogState.lastTcpPort global is clobbered by
    // other suites' receivers when sbt runs suites in parallel — read the
    // port from OUR receiver (same pattern as StreamingSinkSpec)
    val rcvName = "kafka-parity-spec"
    val source = spark.readStream.format("graft-syslog")
      .option("tcp.port", "-1").option("udp.port", "0")
      .option("tcp.host", "127.0.0.1")
      .option("receiver.name", rcvName)
      .load()
    // the exact projection cli.Main builds for the real kafka sink,
    // plus explicit key + fnv partition routing (O11/O13)
    val keyCol = encode(col("hostname"), "UTF-8")
    val out = Transformers.fromSyslog(source)
      .select(
        lit("syslog").as("topic"),
        keyCol.as("key"),
        Transformers.avro(Tags, LogTypeId, SchemaId),
        Transformers.fnvPartition(keyCol, NumPartitions))

    val query = out.writeStream
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // enforce the kafka sink's input contract on every batch
        val sch = batch.schema
        assert(sch("topic").dataType.typeName === "string")
        assert(sch("key").dataType.typeName === "binary")
        assert(sch("value").dataType.typeName === "binary")
        assert(sch("partition").dataType.typeName === "integer")
        batch.collect().foreach { r =>
          captured.add((r.getString(0), r.getAs[Array[Byte]](1),
            r.getAs[Array[Byte]](2), r.getInt(3)))
        }
        ()
      }
      .start()

    try {
      val t0 = System.currentTimeMillis()
      val lines = (1 to 25).map(i => s"<34>1 syslog e2e line $i")
      // connect INSIDE the retry loop: the receiver may not be accepting
      // the instant it binds — a one-shot connect can die with
      // Connection refused under full-suite load
      val sock = eventually(timeout(Span(20, Seconds))) {
        val port = sources.SyslogReceivers.get(rcvName)
          .map(_.tcpPort).getOrElse(-1)
        assert(port > 0)
        new Socket("127.0.0.1", port)
      }
      val w = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(l => w.print(l + "\n"))
      w.flush(); sock.close()

      eventually(timeout(Span(30, Seconds))) {
        query.processAllAvailable()
        assert(captured.size === lines.size) // blocking TCP: no loss, no dup
      }
      val t1 = System.currentTimeMillis()
      val rows = scala.jdk.CollectionConverters.IteratorHasAsScala(
        captured.iterator()).asScala.toSeq

      val host = java.net.InetAddress.getLocalHost.getHostName
      val expectedPartition = {
        val h = functions.Fnv1a32.hash(host.getBytes("UTF-8"))
        ((math.abs(h) % NumPartitions) + NumPartitions) % NumPartitions
      }
      for ((topic, key, value, partition) <- rows) {
        assert(topic === "syslog")
        assert(new String(key, "UTF-8") === host)
        // Confluent framing: magic 0x00 + big-endian schema id
        assert(value(0) === 0x00.toByte)
        val sid = ((value(1) & 0xff) << 24) | ((value(2) & 0xff) << 16) |
          ((value(3) & 0xff) << 8) | (value(4) & 0xff)
        assert(sid === SchemaId)
        assert(partition === expectedPartition)
      }

      // decode the captured wire bytes with the parity decoder and
      // field-compare against what was sent
      import spark.implicits._
      val dec = rows.map(_._3).toDF("value")
        .select(call_function("avro_logline_decode",
          Transformers.confluentUnframe(col("value"))).as("r"))
        .select(col("r.line"), col("r.source"), col("r.tag"),
          col("r.logtypeid"),
          element_at(col("r.timings"), 1).getField("eventName").as("ev"),
          element_at(col("r.timings"), 1).getField("value").as("ts"))
        .collect()
      assert(dec.map(_.getString(0)).toSet === lines.toSet)
      dec.foreach { r =>
        assert(r.getString(1) === host)
        assert(r.getMap[String, String](2).toMap ===
          Map("dc" -> "dc1", "env" -> "test"))
        assert(r.getLong(3) === 7L)
        assert(r.getString(4) === "received")
        val ts = r.getLong(5) // receive time, epoch MILLIS (not micros)
        assert(ts >= t0 - 1000 && ts <= t1 + 1000,
          s"timings.value $ts outside receive window [$t0,$t1] — " +
            "micros/millis regression?")
      }
    } finally {
      query.stop()
      sources.SyslogReceivers.close(rcvName)
    }
  }
}
