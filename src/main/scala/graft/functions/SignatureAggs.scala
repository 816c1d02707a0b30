package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators for the near-dup signature computations (q33/q34).
  *
  * The straightforward DataFrame formulation — 60 separate
  * `sum(bit_j * 2 - 1)` columns for simhash, 32 separate
  * `min((a_i*h + b_i) % p)` columns for minhash — generates enormous
  * whole-stage-codegen classes (>1 MB task binaries, multi-second Janino
  * compiles that recur whenever the codegen cache rotates). A typed
  * [[Aggregator]] lowers to ObjectHashAggregate instead: one compiled
  * Scala loop per row, a primitive-array buffer, and map-side partial
  * aggregation (merge is elementwise), so the shuffle still carries one
  * buffer per (doc, mapper) — the same scale posture as the sum columns
  * without the codegen blowup.
  *
  * Buffer encoders are taken from the call site (`import s.implicits._`
  * provides the primitive-array encoders), keeping this file on public
  * Spark API only.
  */
object SignatureAggs {

  /** SimHash (Charikar'02) signature of a group of feature hashes: for
    * each bit j, count features with bit j set; the signature bit is 1
    * iff set-count > half (i.e. sum of ±1 contributions > 0).
    * Buffer layout: counts(0..bits-1) = per-bit set counts, counts(bits)
    * = group size.
    */
  class SimhashAgg(bits: Int)(implicit be: Encoder[Array[Long]])
      extends Aggregator[Long, Array[Long], Long] {
    def zero: Array[Long] = new Array[Long](bits + 1)
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      var j = 0
      while (j < bits) { b(j) += (h >>> j) & 1L; j += 1 }
      b(bits) += 1
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var j = 0
      while (j <= bits) { a(j) += b(j); j += 1 }
      a
    }
    def finish(b: Array[Long]): Long = {
      var sim = 0L
      var j = 0
      while (j < bits) {
        // contribution sum = 2*ones - n; bit set iff > 0
        if (2 * b(j) - b(bits) > 0) sim |= 1L << j
        j += 1
      }
      sim
    }
    def bufferEncoder: Encoder[Array[Long]] = be
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** MinHash (Broder'97) signature: elementwise min over the universal
    * hash family h_i(x) = (a_i*x + b_i) mod p. Inputs are 31-bit base
    * hashes and a,b < p < 2^31, so a*x + b < 2^62 — no overflow.
    */
  class MinhashAgg(a: Array[Long], b: Array[Long], p: Long)(
      implicit be: Encoder[Array[Long]])
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val k = a.length
    def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % p
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = be
    def outputEncoder: Encoder[Array[Long]] = be
  }
}
