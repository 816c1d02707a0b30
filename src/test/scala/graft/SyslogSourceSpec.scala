package graft

import java.io.PrintWriter
import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Seconds, Span}

/** End-to-end drive of the syslog listening source: a real TCP client and
  * a real UDP datagram against the bound sockets, through a streaming
  * query into a memory sink.
  */
class SyslogSourceSpec extends AnyFunSuite with Eventually {
  private val spark = TestSpark.spark

  test("TCP + UDP lines flow end-to-end with server hostname + receive ts") {
    val df = spark.readStream.format("graft-syslog")
      .option("tcp.port", "-1") // ephemeral
      .option("udp.port", "-1")
      .option("tcp.host", "127.0.0.1")
      .option("udp.host", "127.0.0.1")
      .load()
    assert(df.isStreaming)
    val query = df.writeStream.format("memory").queryName("syslog_e2e")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      eventually(timeout(Span(20, Seconds))) {
        assert(sources.SyslogState.lastTcpPort > 0)
        assert(sources.SyslogState.lastUdpPort > 0)
      }
      val t0 = System.currentTimeMillis()
      // TCP sender: three lines, one empty (scanner emits empty record)
      val sock = new Socket("127.0.0.1", sources.SyslogState.lastTcpPort)
      val out = new PrintWriter(sock.getOutputStream, true)
      out.print("<34>1 tcp line one\n")
      out.print("\n")
      out.print("tcp line two\n")
      out.flush()
      sock.close()
      // UDP sender: one datagram, no trailing newline
      val udp = new DatagramSocket()
      val payload = "udp datagram line".getBytes("UTF-8")
      udp.send(new DatagramPacket(payload, payload.length,
        InetAddress.getByName("127.0.0.1"), sources.SyslogState.lastUdpPort))
      udp.close()

      eventually(timeout(Span(30, Seconds))) {
        query.processAllAvailable()
        val rows = spark.table("syslog_e2e").collect()
        val msgs = rows.map(_.getString(0)).toSet
        assert(msgs === Set("<34>1 tcp line one", "", "tcp line two",
          "udp datagram line"))
        // enrichment: server hostname + receive time in [t0, now]
        val host = java.net.InetAddress.getLocalHost.getHostName
        assert(rows.map(_.getString(1)).toSet === Set(host))
        rows.foreach { r =>
          val ts = r.getTimestamp(2).getTime
          assert(ts >= t0 - 1000 && ts <= System.currentTimeMillis() + 1000)
        }
      }
    } finally query.stop()
  }
}
