package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload (doc_id, bytes, mime kind). */
case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)

/** Features a real decoder would extract (dims, duration, frames...). */
case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                         head_hex: String, n_frames: Long)

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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
