package graft

/** Dev tool (optimization rounds): print `.explain("formatted")` plus the
  * post-execution (AQE-final) physical plan of named queries — the
  * before/after evidence files under plans/r14/.
  * `runMain graft.FmtPlan <sfDir> <query> [query...]`.
  */
object FmtPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FmtPlan <sfDir> <query> [query...]")
    val spark = Sessions.local()
    for (n <- args.drop(1)) {
      val df = SparkEntry.queries(n)(spark, args(0))
      println(s"\n===== $n : explain(formatted) =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      // execute without buffering rows in the driver (collect() on a
      // corpus-sized result would OOM this dev tool); foreach runs the
      // identical plan and finalizes AQE
      df.foreach(_ => ())
      println(s"===== $n : executed plan (AQE-final) =====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
