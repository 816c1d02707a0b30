package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins the staged dedup pipeline's cost structure: the labels artifact
  * (pair generation + connected components) is paid for AT MOST ONCE per
  * (session, tier) however many consumers run — at 100 TB this is the
  * difference between one CC job and one per consumer — while a NEW
  * session never trusts another session's memo (its artifact could
  * predate a testdata regeneration).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("staged labels artifact is written at most once across q81b + q87b") {
    val d0 = Dedup.labelsWrites.get()
    Dedup.queries("q81b_canonical_staged")(spark, TestSpark.sf).collect()
    val d1 = Dedup.labelsWrites.get()
    // 1 if this suite built it first, 0 if an earlier consumer in this
    // session already did — never more.
    assert(d1 - d0 <= 1, s"first consumer wrote ${d1 - d0} times")
    Dedup.queries("q87b_split_staged")(spark, TestSpark.sf).collect()
    Dedup.queries("q81b_canonical_staged")(spark, TestSpark.sf).collect()
    // the composed corpus build (q93) is the third artifact consumer
    operators.Pipeline.queries("q93_corpus_build")(spark, TestSpark.sf)
      .collect()
    assert(Dedup.labelsWrites.get() === d1,
      "warm consumers re-ran pair generation + connected components")
  }

  test("sem_cells artifact trains Lloyd at most once across the staged semantic suite") {
    import operators.Similarity
    val d0 = Similarity.cellsWrites.get()
    Similarity.queries("q103b_semantic_dedup_staged")(spark, TestSpark.sf)
      .collect()
    val d1 = Similarity.cellsWrites.get()
    assert(d1 - d0 <= 1, s"first consumer trained ${d1 - d0} times")
    Similarity.queries("q104b_prototype_staged")(spark, TestSpark.sf).collect()
    Similarity.queries("q105b_sample_staged")(spark, TestSpark.sf).collect()
    Similarity.queries("q107_semantic_pipeline")(spark, TestSpark.sf).collect()
    Similarity.queries("q109_semantic_leakage_audit")(spark, TestSpark.sf)
      .collect()
    assert(Similarity.cellsWrites.get() === d1,
      "warm consumers re-ran Lloyd training")
  }

  test("pq_codes artifact encodes at most once across repeated q90c runs") {
    import operators.Similarity
    val d0 = Similarity.pqCodesWrites.get()
    Similarity.queries("q90c_ann_ivfpq_staged")(spark, TestSpark.sf).collect()
    val d1 = Similarity.pqCodesWrites.get()
    assert(d1 - d0 <= 1, s"first serving run encoded ${d1 - d0} times")
    Similarity.queries("q90c_ann_ivfpq_staged")(spark, TestSpark.sf).collect()
    assert(Similarity.pqCodesWrites.get() === d1,
      "a warm serving run re-ran the PQ encode pass")
  }

  test("q122: base+delta partition the codes, fold is append-only, output == from-scratch") {
    import operators.Similarity
    val b0 = Similarity.q122BaseWrites.get()
    val d0 = Similarity.q122DeltaWrites.get()
    val inc = Similarity.queries("q122_incremental_pq_codes")(
      spark, TestSpark.sf).collect()
    val b1 = Similarity.q122BaseWrites.get()
    val d1 = Similarity.q122DeltaWrites.get()
    assert(b1 - b0 <= 1 && d1 - d0 <= 1,
      s"first maintenance encoded base ${b1 - b0} / delta ${d1 - d0} times")
    // a warm serving run re-encodes NOTHING — neither base nor delta
    Similarity.queries("q122_incremental_pq_codes")(spark, TestSpark.sf)
      .collect()
    assert(Similarity.q122BaseWrites.get() === b1 &&
      Similarity.q122DeltaWrites.get() === d1,
      "a warm serving run re-ran an encode pass")
    // base and delta PARTITION the from-scratch artifact: same total
    // row count and no vec_id appears on both sides (the fold appended,
    // never duplicated or re-encoded)
    val base = Similarity.q122BaseArtifact(spark, TestSpark.sf)
    val delta = Similarity.q122DeltaArtifact(spark, TestSpark.sf)
    val full = Similarity.pqCodesArtifact(spark, TestSpark.sf)
    assert(base.count() + delta.count() === full.count(),
      "base + delta row counts do not partition the full artifact")
    assert(base.select("vec_id").intersect(delta.select("vec_id")).count()
      === 0L, "a vec_id was encoded into BOTH base and delta")
    assert(delta.count() > 0, "fixture degenerate: empty delta batch")
    // incrementality is invisible: the maintained serve == q90c's
    // from-scratch serve, row for row
    val scratch = Similarity.queries("q90c_ann_ivfpq_staged")(
      spark, TestSpark.sf).collect()
    assert(inc.toSeq === scratch.toSeq,
      "base ∪ delta serving diverged from the from-scratch artifact")
  }

  test("q122 compaction: serve-before == serve-after, delta truncated") {
    import operators.Similarity
    // isolated tier copy — compaction REWRITES the staged tables, which
    // would race any parallel suite reading the shared tier's q122
    // artifacts (the q118 lesson)
    val dir = java.nio.file.Files.createTempDirectory("graft_q122c").toString
    spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .write.parquet(s"$dir/embeddings.parquet")
    val before = Similarity.queries("q122_incremental_pq_codes")(spark, dir)
      .collect()
    val baseBefore = Similarity.q122BaseArtifact(spark, dir).count()
    val deltaBefore = Similarity.q122DeltaArtifact(spark, dir).count()
    assert(deltaBefore > 0, "fixture degenerate: nothing to compact")
    Similarity.q122Compact(spark, dir)
    assert(Similarity.q122BaseArtifact(spark, dir).count()
      === baseBefore + deltaBefore,
      "compacted base must hold base+delta rows")
    assert(Similarity.q122DeltaArtifact(spark, dir).count() === 0L,
      "compaction must truncate the delta")
    val after = Similarity.queries("q122_incremental_pq_codes")(spark, dir)
      .collect()
    assert(after.toSeq === before.toSeq,
      "serving changed across compaction — the swap is not transparent")
  }

  test("q122 compaction crash: rename-committed-but-delta-stale rolls forward, never double-counts") {
    import operators.{Bucketed, Similarity}
    val dir = java.nio.file.Files.createTempDirectory("graft_q122r").toString
    spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .write.parquet(s"$dir/embeddings.parquet")
    val before = Similarity.queries("q122_incremental_pq_codes")(spark, dir)
      .collect()
    val db = Bucketed.dbFor(dir)
    val base = Similarity.q122BaseArtifact(spark, dir)
    val delta = Similarity.q122DeltaArtifact(spark, dir)
    val (nBase, nDelta) = (base.count(), delta.count())
    assert(nDelta > 0, "fixture degenerate: nothing to compact")
    // simulate the worst crash window by hand: merged segment written,
    // marker set, swap COMMITTED — process dies before the delta
    // truncate. The delta rows now exist in BOTH tables.
    Bucketed.rewriteBucketed(spark, db, "q122_codes_base_next",
      base.unionByName(delta), 8, Seq("cell"))
    val marker = java.nio.file.Paths.get("/tmp/graft-warehouse",
      s"$db.db", "q122_compact_pending")
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.write(marker, Array.emptyByteArray)
    spark.sql(s"DROP TABLE IF EXISTS $db.q122_codes_base")
    spark.sql(
      s"ALTER TABLE $db.q122_codes_base_next RENAME TO $db.q122_codes_base")
    // next serving run must roll the truncate forward and match exactly
    val after = Similarity.queries("q122_incremental_pq_codes")(spark, dir)
      .collect()
    assert(after.toSeq === before.toSeq,
      "serving after an interrupted compaction diverged (double count?)")
    assert(!java.nio.file.Files.exists(marker), "marker not cleared")
    assert(Similarity.q122BaseArtifact(spark, dir).count() === nBase + nDelta)
    assert(Similarity.q122DeltaArtifact(spark, dir).count() === 0L)
  }

  test("a new session rewrites instead of trusting another session's memo") {
    // Isolated tier copy: the rebuild OVERWRITES the artifact's parquet
    // files, which would invalidate any concurrently-running suite
    // reading the shared-tier artifact (suites run in parallel; q118's
    // funnel read raced exactly this rewrite before the isolation).
    val dir = java.nio.file.Files.createTempDirectory("graft_memo").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .write.parquet(s"$dir/documents.parquet")
    // run once in the base session so its memo is warm
    Dedup.queries("q81b_canonical_staged")(spark, dir).collect()
    val before = Dedup.labelsWrites.get()
    val s2 = spark.newSession()
    Dedup.queries("q81b_canonical_staged")(s2, dir).collect()
    assert(Dedup.labelsWrites.get() - before === 1,
      "a fresh session must rebuild the artifact exactly once")
  }
}
