package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for the test suite — same config as
  * Bench/Verify via [[Sessions]] so tests exercise production settings.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
