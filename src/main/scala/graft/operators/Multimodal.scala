package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload (doc_id, bytes, mime kind). */
case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)

/** Features a real decoder would extract (dims, duration, frames...). */
case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                         head_hex: String, n_frames: Long)

/** Output of the frame-sample + resize stub pipeline (Q41b). */
case class MediaSample(doc_id: Long, n_frames: Long, n_sampled: Long,
                       sampled_sum: Long, resized_bytes: Long,
                       resized_sum: Long)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by a partition-batched typed map — the Scala analog
  * of a `mapInPandas` decode UDF.
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `extractFeatures` computes deterministic stand-ins (byte length, head
  * bytes hex, 64-byte "frame" count). Everything around it is the real
  * production shape: a `binary` payload column built upstream, a
  * `Dataset[MediaRow]` with product encoders, `mapPartitions` (iterator →
  * iterator, so a real decoder amortizes per-partition init — model load,
  * codec context — across the batch, exactly like mapInPandas batches),
  * and a typed `MediaFeatures` output schema.
  *
  * Scale note: mapPartitions breaks whole-stage codegen and column
  * pruning at this operator, so the projection *before* it keeps only
  * (doc_id, payload, kind) — never feed a wide row through a decode UDF.
  */
object Multimodal {

  /** STUB: stands in for image/audio/video decode + feature extraction. */
  def extractFeatures(r: MediaRow): MediaFeatures = {
    val head = r.payload.take(8).map(b => f"$b%02X").mkString
    MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, head,
      (r.payload.length.toLong + 63L) / 64L)
  }

  /** STUB for video-style frame sampling + resize: the payload is treated
    * as 64-byte "frames"; every 4th frame is sampled (the every-nth-frame
    * selection a video pipeline does before feature extraction), and
    * "resize" keeps every 2nd byte of each sampled frame (the
    * deterministic stand-in for spatial downsampling). Checksums are
    * plain byte sums so the oracle can reproduce them arithmetically.
    */
  def sampleFrames(r: MediaRow): MediaSample = {
    val p = r.payload
    val nf = (p.length + 63) / 64
    var sSum = 0L; var rSum = 0L; var rBytes = 0L; var nS = 0L
    var f = 0
    while (f < nf) {
      if (f % 4 == 0) {
        nS += 1
        val start = f * 64
        val end = math.min(start + 64, p.length)
        var i = start
        while (i < end) {
          val v = (p(i) & 0xFF).toLong
          sSum += v
          if ((i - start) % 2 == 0) { rSum += v; rBytes += 1 }
          i += 1
        }
      }
      f += 1
    }
    MediaSample(r.doc_id, nf, nS, sSum, rBytes, rSum)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q41 — binary payload column → partition-batched feature extraction
    "q41_multimodal" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("kind"))
        .as[MediaRow]
      media
        .mapPartitions(it => it.map(extractFeatures))
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Q41b — frame-sample + resize over the binary payload (stubbed
    // byte arithmetic; same partition-batched typed-map plumbing as Q41)
    "q41b_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("video/fake").as("kind"))
        .as[MediaRow]
      media
        .mapPartitions(it => it.map(sampleFrames))
        .toDF()
        .orderBy(col("doc_id"))
    })
  )

  // The stub features are deterministic byte arithmetic, so even the UDF
  // path is oracle-checkable: DuckDB reproduces length/hex/frame math.
  def oracleSql: Map[String, String] = Map(
    "q41_multimodal" ->
      """SELECT doc_id, 'text/plain' AS kind,
        | octet_length(encode(text)) AS n_bytes,
        | substr(hex(encode(text)), 1, 16) AS head_hex,
        | (octet_length(encode(text)) + 63) // 64 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    // byte-exact replay of the frame-sample/resize stub: byte i is in a
    // sampled frame iff (i//64)%4=0; resize keeps even in-frame offsets
    "q41b_frame_sample" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |             octet_length(encode(text)) AS nb FROM documents)
        |SELECT doc_id,
        | (nb + 63) // 64 AS n_frames,
        | ((nb + 63) // 64 + 3) // 4 AS n_sampled,
        | CAST(COALESCE(list_sum(
        |   [CAST(concat('0x', substr(hx, i*2+1, 2)) AS INT)
        |    FOR i IN generate_series(0, nb-1) IF (i//64)%4 = 0]), 0)
        |   AS BIGINT) AS sampled_sum,
        | CAST(len([i FOR i IN generate_series(0, nb-1)
        |           IF (i//64)%4 = 0 AND (i%64)%2 = 0]) AS BIGINT)
        |   AS resized_bytes,
        | CAST(COALESCE(list_sum(
        |   [CAST(concat('0x', substr(hx, i*2+1, 2)) AS INT)
        |    FOR i IN generate_series(0, nb-1)
        |    IF (i//64)%4 = 0 AND (i%64)%2 = 0]), 0)
        |   AS BIGINT) AS resized_sum
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
