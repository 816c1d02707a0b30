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
    Map(
      "q31_ingest_parity" ->
        s"""SELECT * FROM (VALUES
           |  ${rows.mkString(",\n  ")}
           |) AS t(line_no, plain_hex, avro_hex, proto_hex)
           |ORDER BY line_no""".stripMargin
    )
  }
}
