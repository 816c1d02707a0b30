package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the domain cliffs of [[Q.davg]] (Tables.scala): the exact
  * integer-arithmetic mean is the oracle-determinism contract, its
  * DECIMAL(27,10) sum bounds |S| < 1e17 and the BIGINT quotient bounds
  * |mean| < 9.2e14. BEYOND those bounds DuckDB's HUGEINT path still
  * computes, so the only safe Spark-side behavior is a LOUD failure —
  * a larger-scale run must die with an error naming the contract, never
  * hash-mismatch the oracle with a silently wrong number. Writing this
  * spec caught exactly that: the |mean| cliff originally WRAPPED `div`'s
  * long conversion (1e15-mean input returned -8.4e14), which is why davg
  * now carries the raise_error guard. (No aggregate in the suite is
  * within 100× of either cliff — values ~1e0..1e5, rows ≤ 1e7 at the
  * 10× stress scale.)
  */
class DavgDomainSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import graft.Q

  private def davgOf(vals: Seq[Double]): Double = {
    import spark.implicits._
    vals.toDF("x").agg(Q.davg(col("x"))).head().getDouble(0)
  }

  test("in-domain davg is the exact 4dp half-away-from-zero mean") {
    assert(davgOf(Seq(1.0, 2.0, 2.0005)) === 1.6668)
    // a half-way quotient no double represents: mean = 0.00005 -> 0.0001
    assert(davgOf(Seq(0.0001, 0.0)) === 0.0001)
    assert(davgOf(Seq(-0.0001, 0.0)) === -0.0001)
    // near (but inside) the mean bound: |mean| < 9.2e14
    assert(davgOf(Seq(9.0e14)) === 9.0e14)
  }

  test("beyond-domain |S| >= 1e17 throws (ANSI decimal cast), never wraps") {
    val e = intercept[Exception] { davgOf(Seq(6.0e16, 6.0e16)) }
    assert(e.getMessage.contains("Decimal(27, 10)"),
      s"expected the DECIMAL(27,10) overflow to name itself: ${e.getMessage}")
  }

  test("beyond-domain |mean| >= 9.2e14 throws the davg guard, never wraps") {
    // without the guard, div's long conversion wraps: this input
    // returned -8.446e14 — a plausible-looking wrong value
    val e = intercept[Exception] { davgOf(Seq(1.0e15, 1.0e15)) }
    assert(e.getMessage.contains("davg domain overflow"),
      s"expected the raise_error guard to fire: ${e.getMessage}")
  }
}
