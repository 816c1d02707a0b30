package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev diagnostic: run one query, print wall time, per-stage breakdown and
  * the final (post-AQE) physical plan. `runMain graft.Explain <name> [sfDir]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local()
    val stages = mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.numTasks, wall,
          si.taskMetrics.executorRunTime))
      }
    })
    val df = SparkEntry.queries(name)(spark, sfDir)
    def pass(label: String): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(f"[explain] $name $label=$sec%.2fs")
      stages.sortBy(-_._3).take(8).foreach { case (id, n, wall, run) =>
        println(f"[explain]   stage=$id%-4d tasks=$n%-3d wall=${wall / 1e3}%8.2fs taskCpuSum=${run / 1e3}%8.2fs")
      }
    }
    pass("first")
    pass("second")
    df.explain("formatted")
    spark.stop()
  }
}
