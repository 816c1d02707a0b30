package graft.operators

import graft.ingest.Transformers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q31 — ingest parity: the reference's full transform surface (plain /
  * Avro+Confluent / proto2) run over the pinned FIXTURES.md §A.1 inputs,
  * emitting the wire bytes as hex. The oracle is a VALUES table of golden
  * vectors: the encoders are independently validated against the Apache
  * Avro reference decoder + hand-derived byte vectors in CodecSpec, and
  * these rows freeze that behavior against regression.
  *
  * Fixture pins (FIXTURES.md:27): hostname=testhost, ts=1065910455003,
  * tags {dc:dc1, env:test}, logtypeid=7, schemaId=42; produce-time for the
  * proto path pinned to ts+1 (the reference stamps wall clock,
  * /root/reference/syslog.go:174 — pinned here for determinism).
  */
object Ingest {

  val fixtureLines: Seq[String] = Seq(
    "<34>1 2003-10-11T22:14:15.003Z localhost.elodina.net su - ID23 - a simple message",
    "<13>Oct 11 22:14:15 myhost app[1234]: legacy rfc3164 line",
    "plain non-syslog garbage line",
    "")
  val FixtureHost = "testhost"
  val FixtureTs = 1065910455003L
  val FixtureTags = Seq("dc" -> "dc1", "env" -> "test")
  val FixtureLogTypeId = Some(7L)
  val FixtureSchemaId = 42

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_ingest_parity" -> ((s, _) => {
      import s.implicits._
      val lines = fixtureLines.zipWithIndex
        .map { case (l, i) => (i.toLong, l) }
        .toDF("line_no", "message")
        .withColumn("hostname", lit(FixtureHost))
        .withColumn("timestamp", lit(FixtureTs))
      lines.select(
          col("line_no"),
          hex(Transformers.plain(lines)).as("plain_hex"),
          hex(Transformers.avro(FixtureTags, FixtureLogTypeId,
            FixtureSchemaId)).as("avro_hex"),
          hex(Transformers.proto(FixtureTags, FixtureLogTypeId,
            produceMs = lit(FixtureTs + 1))).as("proto_hex"))
        .orderBy(col("line_no"))
    }),

    // Q31b — ingest throughput at data scale: every events row pushed
    // through all three wire pipelines (plain / Avro+Confluent / proto2)
    // with the q31 fixture pins, aggregated to row + byte totals. The
    // oracle is the *wire-size law*: under pinned source/tags/logtypeid/
    // timings the frame length is an arithmetic function of the message
    // byte length (confluent 5 + union 1 + zigzag-varint(len) + len +
    // const suffix for avro; tag 1 + varint(len) + len + const suffix
    // for proto), so DuckDB predicts the totals without an Avro encoder
    // and any drift in the encoders' framing shows up as a byte-count
    // mismatch. Bench-wise this is the single-node encode throughput
    // number the reference's producer pipeline would be compared on.
    "q31b_ingest_throughput" -> ((s, d) => {
      val base = graft.Tables.events(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("event_id"))
        .select(
          concat(col("event_type"), lit(" "), col("props")).as("message"),
          lit(FixtureHost).as("hostname"),
          lit(FixtureTs).as("timestamp"))
      base.select(
          Transformers.plain(base).as("plain"),
          Transformers.avro(FixtureTags, FixtureLogTypeId,
            FixtureSchemaId).as("avro"),
          Transformers.proto(FixtureTags, FixtureLogTypeId,
            produceMs = lit(FixtureTs + 1)).as("proto"))
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("plain"))).as("plain_bytes"),
          sum(length(col("avro"))).as("avro_bytes"),
          sum(length(col("proto"))).as("proto_bytes"))
    }),

    // Q31c — consumer-path round-trip (O9/O10/O22 in one plan): every
    // events row Avro-encoded, Confluent-framed, unframed, decoded, and
    // field-compared against the original. n_ok is computed Spark-side;
    // the oracle pins n_ok = n per group, so any decode regression
    // (framing offset, varint, map/array layout) fails the hash compare
    // at data scale, not just on the four golden fixture rows.
    "q31c_decode_roundtrip" -> ((s, d) => {
      val base = graft.Tables.events(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("event_id"))
        .select(col("event_type"),
          concat(col("event_type"), lit(" "), col("props")).as("message"),
          lit(FixtureHost).as("hostname"),
          unix_micros(col("ts")).as("timestamp"))
      val dec = base.select(col("event_type"), col("message"),
          col("timestamp"),
          call_function("avro_logline_decode", Transformers.confluentUnframe(
            Transformers.avro(FixtureTags, FixtureLogTypeId,
              FixtureSchemaId))).as("r"))
      dec.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("r.line") === col("message") &&
              col("r.source") === lit(FixtureHost) &&
              element_at(col("r.timings"), 1).getField("value")
                === col("timestamp"), 1L).otherwise(0L)).as("n_ok"))
        .orderBy(col("event_type"))
    })
  )

  /** Golden vectors: frozen wire bytes for the four fixture lines. The
    * suffix shared by every avro row is
    * `source="testhost" | tag map {dc:dc1, env:test} | logtypeid=7 |
    * timings=[{"received", 1065910455003}]`; proto rows end with
    * `tag msgs | logtypeid | timings [ts, ts+1]`. Hand-audited against the
    * Avro/proto2 wire specs; regenerate only if the fixture pins change.
    */
  private val goldenAvroSuffix =
    "021074657374686F737402040464630664633106656E76087465737400020E0202107265636569766564B6ABB6D3853E00"
  private val goldenProtoSuffix =
    "120874657374686F73741A090A02646312036463311A0B0A03656E76120474657374200728DB95DBE9821F28DC95DBE9821F"

  def oracleSql: Map[String, String] = {
    val plain = Seq(
      "3C33343E3120323030332D31302D31315432323A31343A31352E3030335A206C6F63616C686F73742E656C6F64696E612E6E6574207375202D2049443233202D20612073696D706C65206D657373616765",
      "3C31333E4F63742031312032323A31343A3135206D79686F7374206170705B313233345D3A206C65676163792072666333313634206C696E65",
      "706C61696E206E6F6E2D7379736C6F672067617262616765206C696E65",
      "")
    // avro: confluent header + union-1 + varint len + utf8 line + suffix;
    // proto: field-1 tag + varint len + utf8 line + suffix.
    val avroLen = Seq("A201", "72", "3A", "00")
    val protoLen = Seq("51", "39", "1D", "00")
    val rows = (0 until 4).map { i =>
      val avro =
        if (i == 3) s"000000002A02${avroLen(i)}$goldenAvroSuffix"
        else s"000000002A02${avroLen(i)}${plain(i)}$goldenAvroSuffix"
      val proto =
        if (i == 3) s"0A${protoLen(i)}$goldenProtoSuffix"
        else s"0A${protoLen(i)}${plain(i)}$goldenProtoSuffix"
      s"($i, '${plain(i)}', '$avro', '$proto')"
    }
    // wire-size law constants: bytes of the pinned record tails
    val avroSuffixBytes = goldenAvroSuffix.length / 2
    val protoSuffixBytes = goldenProtoSuffix.length / 2
    Map(
      "q31_ingest_parity" ->
        s"""SELECT * FROM (VALUES
           |  ${rows.mkString(",\n  ")}
           |) AS t(line_no, plain_hex, avro_hex, proto_hex)
           |ORDER BY line_no""".stripMargin,

      // avro len varint is zigzag (2n): 1 byte below 64, 2 below 8192;
      // proto len varint is plain: 1 byte below 128, 2 below 16384.
      "q31b_ingest_throughput" ->
        s"""SELECT COUNT(*) AS n,
           | CAST(SUM(ol) AS BIGINT) AS plain_bytes,
           | CAST(SUM(6 + CASE WHEN ol < 64 THEN 1 WHEN ol < 8192 THEN 2
           |                   ELSE 3 END + ol + $avroSuffixBytes) AS BIGINT)
           |   AS avro_bytes,
           | CAST(SUM(1 + CASE WHEN ol < 128 THEN 1 WHEN ol < 16384 THEN 2
           |                   ELSE 3 END + ol + $protoSuffixBytes) AS BIGINT)
           |   AS proto_bytes
           |FROM (SELECT octet_length(encode(concat(event_type, ' ', props)))
           |        AS ol
           |      FROM events)""".stripMargin,

      "q31c_decode_roundtrip" ->
        """SELECT event_type, COUNT(*) AS n, COUNT(*) AS n_ok
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    )
  }
}
