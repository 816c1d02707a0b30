package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REAL-broker Kafka e2e — self-activating: this container ships no Kafka
  * connector jars and no broker, so the test is `assume`-skipped here and
  * KafkaSinkParitySpec remains the offline maximum (full sink row
  * contract, byte-verified). The moment the environment provides both
  *  (a) spark-sql-kafka on the classpath, and
  *  (b) a broker address in GRAFT_KAFKA_BOOTSTRAP,
  * this test runs without code changes: the sink formats are resolved by
  * NAME at runtime (no compile-time Kafka imports), so the suite upgrades
  * itself when the environment does. It drives the exact projection
  * cli.Main hands to the kafka sink and asserts a byte round-trip
  * through the broker.
  */
class KafkaE2eSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def kafkaJarsPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: Throwable => false }

  test("syslog -> avro -> REAL kafka broker round-trip (auto-skips offline)") {
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(kafkaJarsPresent,
      "spark-sql-kafka jars absent — offline contract covered by KafkaSinkParitySpec")
    assume(bootstrap.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port to run the real-broker e2e")

    val topic = s"graft_e2e_${System.nanoTime()}"
    val payload = (1 to 100).map(i => s"<34>1 kafka e2e line $i")

    // batch write through the kafka sink: the same (topic, key, value)
    // contract KafkaSinkParitySpec verifies byte-for-byte offline
    import spark.implicits._
    val rows = ingest.Transformers.fromSyslog(
      payload.toDF("message")
        .withColumn("hostname", lit("e2ehost"))
        .withColumn("timestamp", current_timestamp()))
    val framed = rows.select(
      lit(topic).as("topic"),
      encode(col("hostname"), "UTF-8").as("key"),
      ingest.Transformers.avro(Seq("dc" -> "dc1"), Some(7L), 42).as("value"))
    framed.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap.get)
      .save()

    // read back and decode with the reference-parity decoder
    val got = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap.get)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(call_function("avro_logline_decode",
        ingest.Transformers.confluentUnframe(col("value"))).as("rec"))
      .select(col("rec.line").as("line"))
      .as[String].collect().toSet
    assert(got === payload.toSet,
      "broker round-trip must return every line exactly once")
  }
}
