package graft

import graft.operators.{Bucketed, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q167 — retention vacuum over the versioned label store: the GC verb
  * that bounds the override chain. Contracts spec'd here:
  *  - serving at LATEST is invisible to the vacuum;
  *  - the chain physically truncates to the retention suffix;
  *  - as-of ≥ horizon serves the identical snapshot before and after;
  *  - as-of < horizon fails loudly (vacuumed versions unrecoverable);
  *  - the horizon-carrying redo marker rolls an interrupted vacuum
  *    forward from the worst crash window (base swapped, delta stale).
  */
class VacuumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Own tier copy — the vacuum mutates its staged tables, so the spec
    * never shares q167 state with the registered-query run on the
    * shared tier (the q155 embTier pattern).
    */
  private def docsTier(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q167").toString
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("q167 vacuum: latest unchanged, chain truncated, as-of floor enforced") {
    val dir = docsTier()
    val before = rows(Dedup.q167Serve(spark, dir))
    val asOf1Before = rows(Dedup.q167AsOf(spark, dir, 1L))
    val chain0 = Dedup.q167DeltaArtifact(spark, dir).count()
    val folded = Dedup.q167DeltaArtifact(spark, dir)
      .filter(col("ver") <= Dedup.Q167Horizon).count()
    assert(folded > 0, "fixture degenerate: no ver-1 rows to vacuum")
    val after = SparkEntry.queries("q167_labels_vacuum")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after === before, "vacuum changed the latest-serve rows")
    // chain GC actually happened: only the suffix survives
    val chain1 = Dedup.q167DeltaArtifact(spark, dir).count()
    assert(chain1 === chain0 - folded,
      s"chain $chain0 -> $chain1, expected ${chain0 - folded}")
    assert(Dedup.q167DeltaArtifact(spark, dir)
      .filter(col("ver") <= Dedup.Q167Horizon).count() === 0L)
    assert(Dedup.q167HorizonOf(spark, dir) === Dedup.Q167Horizon)
    // snapshots at/above the horizon serve identically across the vacuum
    assert(rows(Dedup.q167AsOf(spark, dir, 1L)) === asOf1Before,
      "as-of-horizon snapshot changed across the vacuum")
    assert(rows(Dedup.q167AsOf(spark, dir, 2L)) === before)
    // below the horizon: loud failure, not a silently-wrong snapshot
    val ex = intercept[IllegalArgumentException] {
      Dedup.q167AsOf(spark, dir, 0L)
    }
    assert(ex.getMessage.contains("horizon"))
    // double vacuum: nothing left to fold; serve identical
    Dedup.q167Vacuum(spark, dir, Dedup.Q167Horizon)
    val again = SparkEntry.queries("q167_labels_vacuum")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again === before)
  }

  test("q167 chain is staged once across repeated serving") {
    val dir = docsTier()
    Dedup.q167Serve(spark, dir).collect()
    val w0 = Dedup.q167DeltaWrites.get()
    Dedup.q167Serve(spark, dir).collect()
    SparkEntry.queries("q167_labels_vacuum")(spark, dir).collect()
    assert(Dedup.q167DeltaWrites.get() === w0,
      "warm q167 serving re-derived the fold chain")
  }

  test("q167 vacuum crash: the horizon-carrying marker rolls forward on serve") {
    val dir = docsTier()
    val before = rows(Dedup.q167Serve(spark, dir))
    val db = Bucketed.dbFor(dir)
    // hand-build the worst window: merged base written and SWAPPED,
    // marker present with horizon content — death before the delta
    // rewrite and the meta write
    val merged = Dedup.latestWins(Dedup.q167BaseArtifact(spark, dir),
      Dedup.q167DeltaArtifact(spark, dir)
        .filter(col("ver") <= Dedup.Q167Horizon))
    Bucketed.rewriteBucketed(spark, db, "q167_labels_base_next", merged,
      8, Seq("doc_id"))
    val marker = java.nio.file.Paths.get("/tmp/graft-warehouse",
      s"$db.db", "q167_vacuum_pending")
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.write(marker,
      Dedup.Q167Horizon.toString.getBytes("UTF-8"))
    spark.sql(s"DROP TABLE IF EXISTS $db.q167_labels_base")
    spark.sql(
      s"ALTER TABLE $db.q167_labels_base_next RENAME TO $db.q167_labels_base")
    // crash here; the serve path must finish the owed work
    val after = rows(Dedup.q167Serve(spark, dir))
    assert(after === before, "interrupted vacuum changed serving")
    assert(!java.nio.file.Files.exists(marker), "marker not cleared")
    assert(Dedup.q167DeltaArtifact(spark, dir)
      .filter(col("ver") <= Dedup.Q167Horizon).count() === 0L,
      "recovery must finish the chain truncate")
    assert(Dedup.q167HorizonOf(spark, dir) === Dedup.Q167Horizon,
      "recovery must record the as-of floor")
  }
}
