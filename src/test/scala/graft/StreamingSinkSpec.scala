package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once delivery through the checkpointed file sink: the property
  * that makes a streaming pipeline restartable in production. The file
  * sink commits each micro-batch to the checkpoint's metadata log, so
  * re-running the same query over the same source must be a no-op — no
  * duplicated rows, no re-processed batches. (The memory-sink harness in
  * StreamingQueries is test-only; THIS is the durable path.)
  */
class StreamingSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("checkpointed parquet sink is exactly-once across restarts") {
    val src = Files.createTempDirectory("graft_eo_src").toString
    val out = Files.createTempDirectory("graft_eo_out").toString
    val ckpt = Files.createTempDirectory("graft_eo_ckpt").toString

    // stage the events table as the streaming source directory
    val raw = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    raw.write.mode("overwrite").parquet(src)
    val n = raw.count()
    val schema = raw.schema

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }

    runOnce()
    assert(spark.read.parquet(out).count() === n, "first run must land all rows")

    // restart against the same checkpoint: nothing new to process, and
    // nothing may be duplicated
    runOnce()
    val after = spark.read.parquet(out)
    assert(after.count() === n, "restart duplicated rows")
    assert(after.select("event_id").distinct().count() === n)
  }
}
