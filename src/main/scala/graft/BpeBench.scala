package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE at realistic table/vocabulary scale (round-11 verdict #7).
  *
  * Two regimes, printed as ONE JSON line:
  *
  *  - CORPUS: train a merge table on the tier's own documents and
  *    measure the q39b count-table pipeline (distinct words tokenized
  *    once, weighted join-back) against the whitespace path. The
  *    synthetic corpus has ~31 distinct words, so training SATURATES at
  *    ~1e2 merges (reported, not hidden) and the pipeline is
  *    shuffle-bound, not kernel-bound — which is the count-table
  *    pattern's whole claim: per-batch BPE work is vocabulary-sized.
  *
  *  - SYNTHETIC VOCAB: the kernel law the corpus cannot exercise. A
  *    deterministic generated vocabulary (LCG seed 42, lengths cycling
  *    3..18, a-z) large enough to train the full 50k-merge GPT-2-scale
  *    table; the `bpe_count_trained` expression then runs the SHIPPING
  *    compiled kernel over all words through a real Spark plan (noop
  *    sink). Fixed-length-8 vs fixed-length-16 word sets measure the
  *    per-word quadratic directly (expected words/s ratio ~4x, chars/s
  *    ~2x — the kernel rescans the seam once per merge step).
  *
  * q39b/q78b keep the FIXTURE table as their oracle contract: a
  * 50k-entry merge list is unrunnable as a recursive-CTE DuckDB replay,
  * so the fixture size is the documented boundary of the hash oracle;
  * the trained path is tolerance/property-tested (TextKernelSpec) and
  * measured here.
  */
object BpeBench {
  private def time[T](f: => T): (T, Double) = {
    val s = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - s) / 1e9)
  }

  /** Deterministic pseudo-word vocabulary: LCG(42), lengths cycle 3..18. */
  private[graft] def syntheticVocab(n: Int): IndexedSeq[String] = {
    var s = 42L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var len = 3
    while (out.length < n) {
      val sb = new java.lang.StringBuilder(len)
      var i = 0
      while (i < len) { sb.append(('a' + ((next() >>> 33) % 26)).toChar); i += 1 }
      val w = sb.toString
      if (seen.add(w)) { out += w }
      len = if (len >= 18) 3 else len + 1
    }
    out.toIndexedSeq
  }

  private def fixedLenVocab(n: Int, len: Int, seed: Long): IndexedSeq[String] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    while (out.length < n) {
      val sb = new java.lang.StringBuilder(len)
      var i = 0
      while (i < len) { sb.append(('a' + ((next() >>> 33) % 26)).toChar); i += 1 }
      if (seen.add(sb.toString)) out += sb.toString
    }
    out.toIndexedSeq
  }

  def main(args: Array[String]): Unit = {
    val tier = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val target = if (args.length > 1) args(1).toInt else 50000
    val vocabN = if (args.length > 2) args(2).toInt else 200000
    val spark = Sessions.local()
    import spark.implicits._

    def minRun(df: => DataFrame, passes: Int = 2): Double =
      (1 to passes).map { _ =>
        time(df.write.format("noop").mode("overwrite").save())._2
      }.min

    // ---- corpus regime ----------------------------------------------------
    val docs = Tables.documents(spark, tier)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
    val totalTokens = words.count()
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val (corpusMerges, tTrainCorpus) =
      time(functions.Bpe.train(vocab, target))
    functions.Bpe.installTrained(corpusMerges)
    def countTable(fn: String): DataFrame =
      words.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .select(sum(call_function(fn, col("w")) * col("n")).as("toks"))
    val wsSec = minRun(docs.select(
      sum(size(split(col("text"), " ")).cast("long")).as("toks")))
    val fixSec = minRun(countTable("bpe_count"))
    val trainedSec = minRun(countTable("bpe_count_trained"))

    // ---- synthetic-vocabulary regime ---------------------------------------
    val synth = syntheticVocab(vocabN)
    val (bigMerges, tTrainBig) =
      time(functions.Bpe.train(synth.map((_, 1L)), target))
    functions.Bpe.installTrained(bigMerges)
    val synthChars = synth.map(_.length.toLong).sum
    val sdf = synth.toDF("w").repartition(32).persist()
    sdf.count() // materialize outside the timed window
    val synthSec = minRun(sdf.select(
      sum(call_function("bpe_count_trained", col("w"))).as("t")))
    // quadratic law: fixed-length 8 vs 16, same word count
    val lawN = math.max(20000, vocabN / 4)
    val v8 = fixedLenVocab(lawN, 8, 7L).toDF("w").repartition(32).persist()
    val v16 = fixedLenVocab(lawN, 16, 11L).toDF("w").repartition(32).persist()
    v8.count(); v16.count()
    val s8 = minRun(v8.select(
      sum(call_function("bpe_count_trained", col("w"))).as("t")))
    val s16 = minRun(v16.select(
      sum(call_function("bpe_count_trained", col("w"))).as("t")))

    // distributed trainer at the same vocabulary (round-12): target
    // sized by env (default 2048 — rounds = target/batch super-steps,
    // each one distributed agg + one distributed map; the full 50k is
    // ~780 rounds of the same cost, linear extrapolation). Fidelity =
    // served token mass vs the driver-trained table over the 200k words.
    val distTarget =
      sys.env.getOrElse("SPARK_GRAFT_BPE_DIST_TARGET", "2048").toInt
    val distBatch =
      sys.env.getOrElse("SPARK_GRAFT_BPE_DIST_BATCH", "256").toInt
    val vocabDf = synth.toDF("w").withColumn("n", lit(1L))
      .repartition(32).persist()
    vocabDf.count()
    val (distMerges, tDist) = time(
      functions.Bpe.trainDistributed(vocabDf, distTarget, distBatch))
    val exactPrefix = functions.Bpe.train(synth.map((_, 1L)), distTarget)
    val rkD = functions.Bpe.rankMapOf(distMerges)
    val rkE = functions.Bpe.rankMapOf(exactPrefix)
    var massD = 0L; var massE = 0L
    synth.foreach { w =>
      massD += functions.Bpe.tokenizeWith(w, rkD).length
      massE += functions.Bpe.tokenizeWith(w, rkE).length
    }

    // pure-kernel cost law, driver-side (no plan/shuffle/codegen noise):
    // ns/word at fixed code-point lengths; the seam-rescan quadratic
    // shows as the len-to-len cost ratio
    val lawLens = Seq(4, 8, 16, 32)
    val kernelNs = lawLens.map { l =>
      val v = fixedLenVocab(10000, l, 13L + l)
      var sink = 0L
      // warm
      v.foreach(w => sink += functions.Bpe.countTrained(
        org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      val t = (1 to 3).map { _ =>
        val s0 = System.nanoTime()
        v.foreach(w => sink += functions.Bpe.countTrained(
          org.apache.spark.unsafe.types.UTF8String.fromString(w)))
        (System.nanoTime() - s0).toDouble / v.size
      }.min
      if (sink == -1) println("") // defeat DCE
      l -> t
    }

    def r(x: Double) = math.rint(x * 1000) / 1000
    println(
      s"""{"metric":"bpe","sf":"$tier",""" +
        s""""corpus":{"distinct_words":${vocab.size},"corpus_tokens":$totalTokens,""" +
        s""""merges_trained":${corpusMerges.size},"target":$target,""" +
        s""""train_sec":${r(tTrainCorpus)},""" +
        s""""ws_tokens_per_s":${r(totalTokens / wsSec)},""" +
        s""""fixture_tokens_per_s":${r(totalTokens / fixSec)},""" +
        s""""trained_tokens_per_s":${r(totalTokens / trainedSec)}},""" +
        s""""synthetic":{"vocab":$vocabN,"merges_trained":${bigMerges.size},""" +
        s""""train_sec":${r(tTrainBig)},""" +
        s""""words_per_s":${r(vocabN / synthSec)},""" +
        s""""chars_per_s":${r(synthChars / synthSec)},""" +
        s""""len8_words_per_s":${r(lawN / s8)},""" +
        s""""len16_words_per_s":${r(lawN / s16)},""" +
        s""""quad_ratio_len16_over_len8":${r(s16 / s8)}},""" +
        s""""kernel_ns_per_word":{${kernelNs.map { case (l, ns) =>
          s""""len$l":${r(ns)}""" }.mkString(",")}},""" +
        s""""distributed":{"target":$distTarget,"batch":$distBatch,""" +
        s""""merges":${distMerges.size},"train_sec":${r(tDist)},""" +
        s""""rounds":${functions.Bpe.lastDistRounds.get()},""" +
        s""""token_mass":$massD,"exact_token_mass":$massE,""" +
        s""""mass_ratio":${r(massD.toDouble / massE)}}}""")
    System.out.flush()
    spark.stop()
  }
}
