package graft.cli

import graft.Sessions
import graft.functions.AvroCodec
import graft.ingest.{SchemaRegistry, Transformers}

/** CLI entry point mirroring the reference's main
  * (/root/reference/syslog.go:133-143): parse flags, validate, run
  * syslog-listener → transform → Kafka pipeline until terminated.
  *
  * The Kafka sink requires the spark-sql-kafka connector on the
  * cluster classpath (standard Spark distribution); `--dry-run` stops
  * after printing the resolved plan/options, which is what CI here
  * exercises (this container ships no Kafka broker or connector jar).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val dryRun = args.contains("--dry-run")
    val conf = Config.parse(args.filterNot(_ == "--dry-run")) match {
      case Left(err) => System.err.println(s"error: $err"); sys.exit(2)
      case Right(c) => c
    }
    Config.validate(conf) match {
      case Left(err) => System.err.println(s"error: $err"); sys.exit(2)
      case Right(_) =>
    }

    val spark = Sessions.local()
    // fromSyslog converts the source's TIMESTAMP column to the epoch-ms
    // long the wire codecs encode (feeding TimestampType straight in
    // would silently serialize Catalyst micros — 1000× the reference)
    val source = Transformers.fromSyslog(
      spark.readStream.format("graft-syslog")
        .options(Config.sourceOptions(conf))
        .load())

    val value = conf.pattern match {
      case "avro" =>
        // dry-run must not touch live services; 0 stands in for the id
        val schemaId =
          if (dryRun) 0
          else SchemaRegistry.register(conf.registryUrl.get,
            "logLine-value", AvroCodec.schemaJson)
        Transformers.avro(conf.tags, conf.logTypeId, schemaId)
      case "proto" => Transformers.proto(conf.tags, conf.logTypeId)
      case _ => Transformers.plain(source)
    }
    val out = source
      .repartition(conf.numProducers) // producer-pool scale-out (O18)
      .select(value)

    if (dryRun) {
      out.explain("extended")
      println(s"sink options: ${Config.kafkaSinkOptions(conf)}")
      spark.stop()
      return
    }

    val query = out.writeStream
      .format("kafka")
      .options(Config.kafkaSinkOptions(conf))
      .option("checkpointLocation",
        s"/tmp/graft-syslog-ckpt-${conf.topic}")
      .start()
    sys.addShutdownHook(query.stop()) // SIGINT → graceful stop (O19)
    query.awaitTermination()
  }
}
