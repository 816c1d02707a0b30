package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Stateful-stream recovery: custom GroupState must survive a query
  * restart through the RocksDB state store, not be recomputed from the
  * source. Run 1 processes batch-1 files and folds them into per-key
  * running totals; run 2 starts from the same checkpoint with NEW files
  * only — its emitted totals must include run 1's state even though run
  * 1's files are never re-read (their offsets are committed). A state
  * store that failed to restore would emit batch-2-only counts. This is
  * the state-side counterpart of StreamingSinkSpec's source/sink
  * crash-recovery test.
  */
class StatefulRecoverySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  import StatefulRecoverySpec._

  test("GroupState survives a checkpointed restart (RocksDB restore)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_st_src").toString
    val ckpt = Files.createTempDirectory("graft_st_ckpt").toString

    def stage(part: Int, perKey: Int): Unit =
      (1L to 10L).flatMap(k => (1 to perKey).map(i => (k, part * 1000L + i)))
        .toDF("user_id", "event_id")
        .coalesce(1).write.mode("append").parquet(src)

    def runOnce(): Map[Long, Long] = {
      val schema = spark.read.parquet(src).schema
      val ds = spark.readStream.schema(schema).parquet(src)
        .as[(Long, Long)]
      val totals = ds.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(fold)
      collected.clear() // foreachBatch: the memory sink can't recover
                        // from a checkpoint; this sink can
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        streaming.StreamingQueries.StatePartitions)
      try {
        val q = totals.toDF("user_id", "total").writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.as[(Long, Long)].collect().foreach(collected.add)
          }
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      import scala.jdk.CollectionConverters._
      collected.asScala.toSeq
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).max }
    }

    stage(1, perKey = 100)
    val afterA = runOnce()
    assert(afterA === (1L to 10L).map(_ -> 100L).toMap)

    stage(2, perKey = 50)
    val afterB = runOnce()
    // 150 proves restored state + new rows; 50 would mean state was lost,
    // 300 would mean batch-1 files were re-read instead of state restored
    assert(afterB === (1L to 10L).map(_ -> 150L).toMap)
  }
}

object StatefulRecoverySpec {
  /** Rows captured by the foreachBatch sink (driver-side, static so the
    * serialized batch function doesn't close over the suite).
    */
  val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
  def clearCollected(): Unit = collected.clear()

  /** Per-key running event count carried in GroupState. (Top-level, not
    * a lambda in the test body: Spark serializes the function to the
    * state operator, and a closure over the suite would drag the
    * non-serializable ScalaTest instance with it.)
    */
  def fold(key: Long, it: Iterator[(Long, Long)],
           st: GroupState[Long]): Iterator[(Long, Long)] = {
    val total = st.getOption.getOrElse(0L) + it.size
    st.update(total)
    Iterator((key, total))
  }
}
