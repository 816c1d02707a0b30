package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized soundness checks for the LocalTopK rewrite
  * (graft/plans/LocalTopK.scala) beyond the fixed q51 shape: many keys,
  * many partitions, random k, and — separately — duplicate order keys,
  * where row_number is nondeterministic by contract so only the
  * invariants (per-key counts, rank bound) are asserted.
  */
class LocalTopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("key")).orderBy(col("ord"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def withRule[A](enabled: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.localTopK.enabled", enabled.toString)
    try f finally spark.conf.set("spark.graft.localTopK.enabled", "true")
  }

  test("rewrite is semantics-preserving on random data with unique orders") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 300 + rnd.nextInt(300)
      val k = 1 + rnd.nextInt(5)
      // unique ord per key: shuffle global ints so no (key, ord) repeats
      val rows = rnd.shuffle((0 until n).toVector)
        .map(i => (i % 13, i, rnd.nextInt(1000)))
      val df = rows.toDF("key", "ord", "payload").repartition(7)
      val fast = topk(df, k).collect().map(_.toString).sorted.toSeq
      val plain = withRule(enabled = false) {
        topk(df, k).collect().map(_.toString).sorted.toSeq
      }
      assert(fast === plain, s"n=$n k=$k")
    }
  }

  test("rank()/dense_rank() filters fire and preserve keep-ties semantics") {
    val rnd = new scala.util.Random(23)
    // heavy ties: ord drawn from 6 values over 5 keys
    val rows = (0 until 500).map(_ => (rnd.nextInt(5), rnd.nextInt(6), rnd.nextInt(100)))
    val df = rows.toDF("key", "ord", "payload").repartition(7)
    val w = Window.partitionBy(col("key")).orderBy(col("ord"))
    for ((fn, name) <- Seq(rank() -> "rank", dense_rank() -> "dense_rank")) {
      val q = df.withColumn("r", fn.over(w)).filter(col("r") <= 2)
      assert(q.queryExecution.executedPlan.toString
        .contains("LocalTopKPerKey"), s"$name must fire")
      // rank outputs are value-determined (ties all kept), so even with
      // duplicates the row multiset must be identical to the plain plan
      val fast = q.collect().map(_.toString).sorted.toSeq
      val plain = withRule(enabled = false) {
        q.collect().map(_.toString).sorted.toSeq
      }
      assert(fast === plain, name)
    }
  }

  test("rule does not fire on non-ranking functions or oversized k") {
    val df = (1 to 50).map(i => (i % 5, i)).toDF("key", "ord")
    val w = Window.partitionBy(col("key")).orderBy(col("ord"))
    // ntile needs the whole partition; the pruning argument cannot apply
    val nt = df.withColumn("r", ntile(4).over(w)).filter(col("r") <= 1)
    assert(!nt.queryExecution.executedPlan.toString
      .contains("LocalTopKPerKey"), "must not fire on ntile()")
    // k above MaxK: retention stops being memory-trivial
    val big = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= graft.plans.PushLocalTopK.MaxK + 1)
    assert(!big.queryExecution.executedPlan.toString
      .contains("LocalTopKPerKey"), "must not fire above MaxK")
  }

  test("retention chunking across ChunkRows is semantics-preserving") {
    // one input partition larger than ChunkRows forces at least two
    // retention chunks; the emitted superset must still reduce to the
    // same top-k after the window
    val n = graft.plans.LocalTopKPerKeyExec.ChunkRows + 200000
    val df = spark.range(n.toLong)
      .selectExpr("id % 997 AS key", "id AS ord").coalesce(1)
    val fast = topk(df, 2).collect().map(_.toString).sorted.toSeq
    val plain = withRule(enabled = false) {
      topk(df, 2).collect().map(_.toString).sorted.toSeq
    }
    assert(fast === plain)
    assert(fast.size === 997 * 2)
  }

  test("rank tie storm at the k-boundary: bounded retention, exact results") {
    // The documented adversarial case for ByRank retention: thousands of
    // rows tied exactly at the rank-k cut, spread across MANY retention
    // chunks (chunk size shrunk via conf). Bound asserted (Scaladoc):
    // per (chunk, key) at most (k-1) rows + one tie bucket survive, so
    // emitted ≈ boundary ties + chunks × ((k-1) + small filler buckets)
    // — far below the input — while results stay exactly keep-ties.
    val rnd = new scala.util.Random(31)
    val chunk = 4096
    spark.conf.set("spark.graft.localTopK.chunkRows", chunk.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plan traversal
    try {
      val k = 5
      val ties = 3000
      val rows = rnd.shuffle(
        (1 to 4).map(v => (0, v, -1)) ++
          Vector.fill(ties)((0, 5, 0)) ++
          Vector.fill(50000)((0, 6 + rnd.nextInt(995), 1)))
      val df = rows.toDF("key", "ord", "payload").coalesce(1)
      val w = Window.partitionBy(col("key")).orderBy(col("ord"))
      val q = df.withColumn("r", rank().over(w)).filter(col("r") <= k)
      val exec = q.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.LocalTopKPerKeyExec => e
      }.getOrElse(fail("LocalTopKPerKey must fire"))
      val emitted = exec.execute().count()
      val n = rows.size
      val chunks = (n + chunk - 1) / chunk
      // ties retained once each + per-chunk (k-1) + per-chunk filler tail
      // bucket (filler values are near-unique; 40 is generous slack)
      val bound = ties + 4 + chunks.toLong * (k - 1 + 40)
      assert(emitted <= bound, s"emitted $emitted of $n rows, bound $bound")
      assert(emitted < n / 8, s"no meaningful pruning: $emitted of $n")
      val fast = q.collect().map(_.toString).sorted.toSeq
      val plain = withRule(enabled = false) {
        q.collect().map(_.toString).sorted.toSeq
      }
      assert(fast === plain)
      assert(fast.size === 4 + ties, "rank-5 boundary ties must ALL be kept")
    } finally {
      spark.conf.unset("spark.graft.localTopK.chunkRows")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("all-tied input: emitted equals output (the tie term is the output)") {
    // every row shares one sort key: rank 1 for all, so keep-ties output
    // IS the whole input — retention must not prune (correctness) and
    // this is the documented irreducible worst case of the bound
    spark.conf.set("spark.graft.localTopK.chunkRows", "2048")
    try {
      val df = spark.range(20000)
        .selectExpr("0 AS key", "7 AS ord", "id AS payload").coalesce(1)
      val w = Window.partitionBy(col("key")).orderBy(col("ord"))
      val q = df.withColumn("r", rank().over(w)).filter(col("r") <= 3)
      assert(q.count() === 20000L)
    } finally spark.conf.unset("spark.graft.localTopK.chunkRows")
  }

  test("with duplicate order keys the invariants still hold") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(_ => (rnd.nextInt(5), rnd.nextInt(4), rnd.nextInt(100)))
    val df = rows.toDF("key", "ord", "payload").repartition(7)
    val k = 3
    val got = topk(df, k).select("key", "ord", "rn")
      .as[(Int, Int, Int)].collect()
    val groupSizes = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val byKey = got.groupBy(_._1)
    for ((key, rs) <- byKey) {
      assert(rs.length === math.min(k, groupSizes(key)), s"key=$key")
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length), s"key=$key rns")
      // no returned row may have >= k rows strictly before it
      val full = rows.filter(_._1 == key)
      for ((_, ord, _) <- rs)
        assert(full.count(_._2 < ord) < k, s"key=$key ord=$ord")
    }
    assert(byKey.keySet === groupSizes.keySet)
  }
}
