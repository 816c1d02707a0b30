package graft

/** Dev tool: print the post-AQE physical plan of named queries to
  * stdout — the per-query sibling of [[PlanAudit]] (which regenerates
  * the fixed headline section of PLANS.md).
  * `runMain graft.PlanDump <sfDir> <query> [query...]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query...]")
    val spark = Sessions.local()
    for (n <- args.drop(1)) {
      val df = SparkEntry.queries(n)(spark, args(0))
      df.collect() // execute so AQE finalizes this df's plan
      println(s"\n===== $n =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
