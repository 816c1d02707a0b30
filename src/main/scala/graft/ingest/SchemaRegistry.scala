package graft.ingest

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

/** Minimal Confluent-style schema-registry client (driver-side, called
  * once per query start — the id is then folded into the framing header
  * as a literal, mirroring the reference's per-process registration cache
  * (V:elodina/go-kafka-avro/schema_registry.go:118-159).
  *
  * POST /subjects/{subject}/versions  {"schema": "<json-escaped schema>"}
  * → {"id": N}
  */
object SchemaRegistry {
  private val cache = TrieMap.empty[(String, String), Int]

  def register(baseUrl: String, subject: String, schemaJson: String): Int =
    cache.getOrElseUpdate((baseUrl, subject), {
      val url = new URL(s"${baseUrl.stripSuffix("/")}/subjects/$subject/versions")
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      conn.setDoOutput(true)
      val body = "{\"schema\": \"" + escape(schemaJson) + "\"}"
      var out: OutputStream = null
      try {
        out = conn.getOutputStream
        out.write(body.getBytes(StandardCharsets.UTF_8))
      } finally if (out != null) out.close()
      val code = conn.getResponseCode
      if (code != 200) sys.error(s"registry POST $url failed: HTTP $code")
      val reader = new BufferedReader(
        new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
      val resp = try {
        Iterator.continually(reader.readLine()).takeWhile(_ != null).mkString
      } finally reader.close()
      parseId(resp)
    })

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Parse {"id": N} without a JSON dependency. */
  private[graft] def parseId(resp: String): Int = {
    val m = java.util.regex.Pattern.compile("\"id\"\\s*:\\s*(\\d+)").matcher(resp)
    if (!m.find()) sys.error(s"no id in registry response: $resp")
    m.group(1).toInt
  }
}
