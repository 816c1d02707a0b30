package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress dataset generator: blows an existing testdata directory up
  * N× (default 10×, i.e. sf0.1 → "sf~1") by unioning N re-keyed replicas
  * of each table, so the suite's scaling behavior can be MEASURED instead
  * of argued from plan shape (round-4 verdict item #1).
  *
  * The replication is isomorphic, not naive: a naive N× copy would let
  * replicas of the same row collide in every similarity/dedup operator
  * (each doc would gain N−1 exact near-dups, each vector N−1 cosine-1.0
  * twins), inflating pair counts ~N² and measuring a workload no real N×
  * corpus has. Instead each replica is mapped into its own disjoint
  * keyspace and, for content tables, its own disjoint feature space:
  *
  *  - TPC-H-ish tables: every key column gets a per-replica stride offset,
  *    consistently across PK and FK sides, so join fan-outs and group
  *    cardinalities scale exactly N× while per-key row counts stay flat.
  *    `nation`/`region` are fixed dimensions (as in TPC-H) — copied once.
  *  - events: event_id/user_id re-keyed per replica (N× users, same
  *    events-per-user); timestamps untouched, so time-window densities
  *    scale N× — what a 10× traffic year looks like.
  *  - documents: doc_id re-keyed; for replica k>0 every token is suffixed
  *    `_k`, putting each replica in a disjoint shingle space: per-shingle
  *    document frequencies, Jaccard pair structure and dup-cluster shapes
  *    are preserved replica-locally, so q32/q73 ground truth scales
  *    exactly N× and cluster diameters (q73 round count) stay constant.
  *    n_chars is recomputed from the rewritten text.
  *  - embeddings: vec_id re-keyed, label offset per replica (N× blocks of
  *    unchanged size — the per-source-shard shape q35 blocks on), and the
  *    vector run through a per-replica deterministic sign-flip D_k
  *    (orthogonal, so all within-replica cosines are bit-preserved while
  *    cross-replica sign-LSH bands decorrelate — q64's true-pair count
  *    scales ~N× instead of N²).
  *
  * Usage: runMain graft.StressGen <srcDir> <destDir> [replicas=10]
  * Writes parquet with the same table names; point SPARK_GRAFT_SF_DIR at
  * destDir to run Bench/ScaleProbe on it. Dest lives under the repo (e.g.
  * target/stress/sf1) — testdata is read-only.
  */
object StressGen {
  // one stride per key domain, far above any sf<=1 key
  val Stride = 100000000L

  private def rekey(df: DataFrame, k: Int, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val dt = df.schema(c).dataType
      // the stride invariant ("far above any sf<=1 key") bounds rekeyed
      // values by (k+1)*Stride — an INT column wraps silently at k >= 21,
      // folding replicas onto colliding keys; refuse instead
      dt match {
        case org.apache.spark.sql.types.LongType => ()
        case org.apache.spark.sql.types.IntegerType =>
          require((k + 1L) * Stride <= Int.MaxValue,
            s"replica $k would wrap INT key column '$c' (stride $Stride): " +
              "widen the column to BIGINT or lower the replica count")
        case other =>
          throw new IllegalArgumentException(
            s"key column '$c' must be integral, got $other")
      }
      d.withColumn(c, (col(c) + lit(k * Stride)).cast(dt))
    }

  /** Replicate `base` N× with `f(df, k)` applied to replica k. */
  private def blowUp(base: DataFrame, n: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(k => f(base, k)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StressGen <srcDir> <destDir> [replicas] [tables,csv]")
    val (src, dest) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 10
    // Optional table subset (e.g. "documents,embeddings" for the ~100x
    // candidate-growth probe, which needs no TPC-H tables). NOTE: always
    // generate from the ORIGINAL testdata, never chain StressGen outputs
    // — a second stride application folds replica keys onto each other
    // ((k1 + k2)·Stride collides across runs); replicas=100 from sf0.1
    // is the supported way to reach ~sf10.
    val tableSubset: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    val spark = Sessions.local()
    import spark.implicits._

    def write(name: String, df: => DataFrame, parts: Int): Unit =
      if (tableSubset.isEmpty || tableSubset(name)) {
        df.repartition(parts)
          .write.mode(SaveMode.Overwrite).parquet(s"$dest/$name.parquet")
        println(s"[stressgen] $name done")
      }

    def raw(t: String) = spark.read.parquet(s"$src/$t.parquet")

    // fixed dimensions: copy once
    write("region", raw("region"), 1)
    write("nation", raw("nation"), 1)

    write("customer", blowUp(raw("customer"), n)(rekey(_, _, Seq("c_custkey"))), 4)
    write("supplier", blowUp(raw("supplier"), n)(rekey(_, _, Seq("s_suppkey"))), 1)
    write("part", blowUp(raw("part"), n)(rekey(_, _, Seq("p_partkey"))), 4)
    write("orders", blowUp(raw("orders"), n)(
      rekey(_, _, Seq("o_orderkey", "o_custkey"))), 8)
    write("lineitem", blowUp(raw("lineitem"), n)(
      rekey(_, _, Seq("l_orderkey", "l_partkey", "l_suppkey"))), 16)
    write("events", blowUp(raw("events"), n)(
      rekey(_, _, Seq("event_id", "user_id"))), 16)

    write("documents", blowUp(raw("documents"), n) { (df, k) =>
      val rk = rekey(df, k, Seq("doc_id"))
      if (k == 0) rk
      else rk
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_$k"))
        .withColumn("n_chars", length(col("text")))
    }, 8)

    write("embeddings", blowUp(raw("embeddings"), n) { (df, k) =>
      val rk = rekey(df, k, Seq("vec_id"))
        .withColumn("label", col("label") + lit(k * 1000))
      if (k == 0) rk
      else {
        // deterministic per-replica sign-flip: dim i flips iff bit
        // (i + k) of a splitmix-style mix of k is set — orthogonal, so
        // within-replica cosines are preserved bit-for-bit
        val mixed = {
          var z = k.toLong * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val flips = (0 until 64).map(i => ((mixed >>> ((i + k) % 64)) & 1L) == 1L)
        val flipped = (0 until 64).map { i =>
          val e = element_at(col("embedding"), i + 1)
          if (flips(i)) -e else e
        }
        rk.withColumn("embedding", array(flipped: _*).cast("array<float>"))
      }
    }, 4)

    println(s"[stressgen] wrote ${n}x of $src to $dest")
    spark.stop()
  }
}
