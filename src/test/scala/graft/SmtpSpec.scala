package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.streaming.{Sinks, SmtpNotifier}

/** End-to-end SMTP alert delivery against an in-process RFC 5321 server
  * (no network egress needed — loopback only). */
class SmtpSpec extends SparkTestBase {
  import spark.implicits._

  /** One-connection fake SMTP server; records the DATA payload. */
  private class FakeSmtpServer {
    val server = new ServerSocket(0) // ephemeral loopback port
    val commands = new ArrayBuffer[String]()
    val data = new StringBuilder
    @volatile var failFirstRcpt = false
    private var served = 0

    val thread = new Thread(() => {
      try {
        while (!server.isClosed) {
          val s = server.accept()
          served += 1
          val in = new BufferedReader(new InputStreamReader(
            s.getInputStream, StandardCharsets.UTF_8))
          val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
          def reply(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
          reply("220 fake ESMTP")
          var inData = false
          var line = in.readLine()
          while (line != null) {
            if (inData) {
              if (line == ".") { inData = false; reply("250 OK") }
              else data.append(line).append('\n')
            } else {
              commands += line
              val up = line.toUpperCase
              if (up.startsWith("EHLO")) { reply("250-fake"); reply("250 OK") }
              else if (up.startsWith("RCPT") && failFirstRcpt && served == 1)
                reply("550 mailbox unavailable")
              else if (up.startsWith("DATA")) { inData = true; reply("354 go") }
              else if (up.startsWith("QUIT")) { reply("221 bye"); line = null }
              else reply("250 OK")
            }
            if (line != null) line = in.readLine()
          }
          s.close()
        }
      } catch { case _: Exception => () } // closed server socket ends the loop
    })
    thread.setDaemon(true)
    thread.start()
    def port: Int = server.getLocalPort
    def close(): Unit = server.close()
  }

  test("SmtpNotifier speaks RFC 5321: envelope, headers, dot-stuffing (S10)") {
    val srv = new FakeSmtpServer
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, "graft@example.com",
        Seq("ops@example.com", "oncall@example.com"))
      n.send("disk alert", "usage high\n.hidden dot line\nend")
      assert(srv.commands.exists(_ == "MAIL FROM:<graft@example.com>"))
      assert(srv.commands.count(_.startsWith("RCPT TO:")) === 2)
      val d = srv.data.toString
      assert(d.contains("Subject: disk alert"))
      assert(d.contains("usage high"))
      // dot-stuffed on the wire (so the receiving server un-stuffs to the
      // original), and the stuffed line did NOT terminate DATA early
      assert(d.contains("..hidden dot line"))
      assert(d.contains("end"))
    } finally srv.close()
  }

  test("SmtpNotifier sanitizes CR/LF out of headers (no command injection)") {
    val srv = new FakeSmtpServer
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, "graft@example.com",
        Seq("ops@example.com"))
      n.send("evil\r\n.\r\nMAIL FROM:<x@y>", "body line")
      // the injected terminator never reached the wire as its own line:
      // DATA contains a single flattened Subject header and the body
      val d = srv.data.toString
      assert(d.contains("Subject: evil . MAIL FROM:<x@y>"))
      assert(srv.commands.count(_.toUpperCase.startsWith("MAIL FROM")) === 1)
      assert(d.contains("body line"))
    } finally srv.close()
  }

  test("SmtpNotifier send failure throws (batch retry, not silent drop)") {
    val srv = new FakeSmtpServer
    srv.failFirstRcpt = true
    try {
      val n = new SmtpNotifier("127.0.0.1", srv.port, "graft@example.com",
        Seq("ops@example.com"))
      intercept[java.io.IOException] { n.send("s", "b") }
    } finally srv.close()
  }

  test("streaming alerts deliver through the real SMTP transport end-to-end") {
    val srv = new FakeSmtpServer
    val dir = java.nio.file.Files.createTempDirectory("graft-smtp").toString
    try {
      implicit val ctx = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val alerts = ms.toDF().toDF("event_id", "event_type")
        .filter(col("event_type") === "error")
      val q = Sinks.alerts(alerts,
        new SmtpNotifier("127.0.0.1", srv.port, "graft@example.com",
          Seq("ops@example.com")),
        s"$dir/ckpt")
      try {
        ms.addData((1L, "error"), (2L, "view"))
        q.processAllAvailable()
      } finally q.stop()
      val d = srv.data.toString
      assert(d.contains("graft-alert") || srv.commands.nonEmpty)
      assert(d.contains("error"))
    } finally srv.close()
  }
}
