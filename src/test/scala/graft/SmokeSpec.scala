package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY §5.2): every declared query runs end-to-end on
  * sf0.001 with a sane schema; queries whose semantics guarantee output
  * at every SF must be non-empty.
  */
class SmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bench rotor env parsing: 'all' any case, numerals mod 2, garbage falls back") {
    assert(Bench.rotorParityOf(Some("all")) === -1)
    assert(Bench.rotorParityOf(Some("ALL")) === -1)
    assert(Bench.rotorParityOf(Some("7")) === 1)
    assert(Bench.rotorParityOf(Some("4")) === 0)
    // overflow-sized numerals and typos must DEGRADE (day parity), not
    // crash an unattended run before any row is measured. Day parity is
    // sampled before AND after each call so a UTC-midnight rollover
    // mid-test cannot flake the assert.
    assert(Bench.rotorParityOf(Some("9999999999")) === 1) // abs(n) % 2
    def dayNow = Bench.utcDayParity
    val (d1, typo, d2) = (dayNow, Bench.rotorParityOf(Some("alll")), dayNow)
    assert(typo === d1 || typo === d2)
    val (d3, none, d4) = (dayNow, Bench.rotorParityOf(None), dayNow)
    assert(none === d3 || none === d4)
  }

  test("artifact staging-regression gate: >2x recorded cost trips, " +
      "<=2x and unrecorded rows do not") {
    val costs = Map("artifact:ver_chain" -> 9.1, "artifact:sc_chain" -> 22.0,
      "q1_x" -> 1.0)
    val rows = Seq(
      ("artifact:ver_chain", 18.3),  // 2.01x — a doubled chain builder
      ("artifact:sc_chain", 43.9),   // 1.995x — under the gate
      ("artifact:new_store", 50.0),  // no recorded cost — cannot gate
      ("artifact:failed", -1.0),     // failed build — surfaced elsewhere
      ("q1_x", 99.0))                // timed row — not this gate's job
    assert(Bench.artifactRegressions(rows, costs) ===
      Seq("artifact:ver_chain"))
    assert(Bench.artifactRegressions(Seq.empty, costs) === Seq.empty)
  }

  // Queries that may legitimately return zero rows at some SF (pair
  // thresholds depend on planted duplicates).
  private val mayBeEmpty = Set(
    "q32_neardup_jaccard", "q33_neardup_simhash", "q34_neardup_minhash",
    "q35_neardup_embedding", "q64_neardup_lsh", "q73_dup_clusters")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query with an oracle has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
