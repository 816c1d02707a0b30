package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's three transformer pipelines re-expressed as Column
  * programs over the enriched syslog stream
  * (message: string, hostname: string, timestamp: long epoch-millis —
  * the SyslogMessage shape, /root/reference/syslog/syslog_producer.go:29-33).
  *
  *  - plain  (/root/reference/syslog/syslog_producer.go:209-211):
  *    value = UTF-8 bytes of the raw line; hostname/timestamp dropped.
  *  - avro   (/root/reference/syslog.go:146-161): logLine record with
  *    timings=[{"received", ts}], wrapped in Confluent framing
  *    `0x00 | int32 BE schemaId | avro binary`
  *    (V:elodina/go-kafka-avro/avro_encoder_decoder.go:62-78).
  *  - proto  (/root/reference/syslog.go:163-182): proto2 LogLine with
  *    timings=[receiveMs, produceMs] (two elements, flat int64s).
  *
  * Tags are emitted key-sorted (Go map iteration is randomized; we pick
  * the deterministic order — same wire format, reproducible bytes).
  */
object Transformers {

  /** Canonical transformer input from the graft-syslog source's schema
    * (message string, hostname string, timestamp TIMESTAMP): the wire
    * codecs take `timestamp` as epoch MILLIS long
    * (syslog_producer.go:180 stamps ms). Feeding the TimestampType
    * column straight in would pass the 5-field struct type check but
    * encode Catalyst's internal MICROS — 1000× the reference's value —
    * so every live pipeline must go through this projection.
    */
  def fromSyslog(df: DataFrame): DataFrame =
    df.select(col("message"), col("hostname"),
      unix_millis(col("timestamp")).as("timestamp"))

  /** value = raw line bytes (StringSerializer equivalence). */
  def plain(df: DataFrame): Column =
    encode(col("message"), "UTF-8").as("value")

  private def tagMap(tags: Seq[(String, String)]): Column =
    if (tags.isEmpty) map().cast("map<string,string>")
    else map(tags.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  private def tagArr(tags: Seq[(String, String)]): Column =
    if (tags.isEmpty) array().cast("array<struct<key:string,value:string>>")
    else array(tags.sortBy(_._1).map { case (k, v) =>
      struct(lit(k).as("key"), lit(v).as("value")) }: _*)

  private def logTypeIdCol(id: Option[Long]): Column =
    id.map(lit(_)).getOrElse(lit(null)).cast("long")

  /** Confluent wire framing: magic 0x00 + big-endian int32 schema id. */
  def confluentFrame(schemaId: Int, payload: Column): Column =
    concat(lit(Array[Byte](0,
      (schemaId >> 24).toByte, (schemaId >> 16).toByte,
      (schemaId >> 8).toByte, schemaId.toByte)), payload)

  /** value = Confluent-framed Avro logLine. */
  def avro(tags: Seq[(String, String)], logTypeId: Option[Long],
           schemaId: Int): Column =
    confluentFrame(schemaId, call_function("avro_logline", struct(
      col("message").as("line"),
      col("hostname").as("source"),
      tagMap(tags).as("tag"),
      logTypeIdCol(logTypeId).as("logtypeid"),
      array(struct(lit("received").as("eventName"),
        col("timestamp").as("value"))).as("timings"))))
      .as("value")

  /** value = proto2 LogLine. `produceMs` defaults to wall clock like the
    * reference (syslog.go:174); tests pass a literal for determinism.
    */
  def proto(tags: Seq[(String, String)], logTypeId: Option[Long],
            produceMs: Column = unix_millis(current_timestamp())): Column =
    call_function("proto_logline", struct(
      col("message").as("line"),
      col("hostname").as("source"),
      tagArr(tags).as("tag"),
      logTypeIdCol(logTypeId).as("logtypeid"),
      array(col("timestamp"), produceMs).as("timings")))
      .as("value")

  /** O11 hash-partition parity: `abs(fnv1a32(keyBytes)) mod n`, matching
    * HashPartitioner (V:elodina/siesta-producer/partitioner.go:15-44).
    * Emit as a `partition` column — the Kafka sink routes by it (O13
    * manual partitioning is the same column with a user-supplied value).
    */
  def fnvPartition(keyBytes: Column, numPartitions: Int): Column =
    pmod(abs(call_function("fnv1a32", keyBytes)), lit(numPartitions))
      .as("partition")

  /** Decode side of the Confluent framing (O22): strip the 5-byte header
    * after asserting the magic byte, yielding the raw Avro body.
    */
  def confluentUnframe(framed: Column): Column =
    when(substring(framed, 1, 1) === lit(Array[Byte](0)),
      framed.substr(lit(6), length(framed) - 5))
      .otherwise(raise_error(lit("bad Confluent magic byte")).cast("binary"))
}
