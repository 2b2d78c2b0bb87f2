package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** Minimal dependency-free SMTP transport behind [[Sinks.Notifier]].
  *
  * The reference ships a complete SMTP sender as its alert delivery path
  * (utils/email-sender-libcurl.c:128-193, utils/email-sender.c); this is
  * the same capability as an RFC 5321 client over a plain JDK socket:
  * EHLO → MAIL FROM → RCPT TO → DATA (dot-stuffed) → QUIT. No TLS/auth —
  * point it at a local relay for authenticated delivery (the transport
  * seam is [[Sinks.Notifier]], so a TLS-capable client drops in without
  * touching the alert operator).
  *
  * Serializable: each executor task constructs one connection per send.
  * A failed send throws, failing the task → the streaming checkpoint
  * retries the batch (at-least-once delivery, strictly stronger than the
  * reference's fire-and-forget).
  */
class SmtpNotifier(
    host: String,
    port: Int,
    from: String,
    to: Seq[String],
    timeoutMs: Int = 10000) extends Sinks.Notifier {

  override def send(subject: String, body: String): Unit = {
    val socket = new Socket()
    try {
      socket.connect(new InetSocketAddress(host, port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      val in = new BufferedReader(new InputStreamReader(
        socket.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(
        socket.getOutputStream, StandardCharsets.UTF_8)

      def expect(codes: Int*): Unit = {
        // SMTP replies may be multiline: "250-..." continues, "250 " ends.
        var line = in.readLine()
        if (line == null) throw new java.io.IOException("SMTP: connection closed")
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        if (line == null) throw new java.io.IOException(
          "SMTP: connection closed mid-reply")
        val code = line.take(3).toIntOption.getOrElse(-1)
        if (!codes.contains(code))
          throw new java.io.IOException(s"SMTP: expected ${codes.mkString("/")}, got: $line")
      }
      def cmd(s: String, codes: Int*): Unit = {
        out.write(s + "\r\n"); out.flush(); expect(codes: _*)
      }

      // CR/LF never reaches a header or envelope line: a row-derived
      // subject (or address) containing "\r\n" would otherwise inject
      // SMTP commands or terminate DATA early — the body is dot-stuffed,
      // headers must be sanitized here.
      def hdr(v: String): String = v.replaceAll("[\r\n]+", " ")
      val fromS = hdr(from)
      val toS = to.map(hdr)
      expect(220)
      cmd(s"EHLO graft", 250)
      cmd(s"MAIL FROM:<$fromS>", 250)
      toS.foreach(r => cmd(s"RCPT TO:<$r>", 250, 251))
      cmd("DATA", 354)
      val headers = Seq(
        s"From: <$fromS>",
        s"To: ${toS.map(r => s"<$r>").mkString(", ")}",
        s"Subject: ${hdr(subject)}",
        "MIME-Version: 1.0",
        "Content-Type: text/plain; charset=utf-8",
        "")
      val payload = (headers ++ body.split("\n", -1).toSeq)
        .map(l => if (l.startsWith(".")) "." + l else l) // RFC 5321 §4.5.2 dot-stuffing
        .mkString("\r\n")
      out.write(payload + "\r\n.\r\n"); out.flush(); expect(250)
      cmd("QUIT", 221)
    } finally socket.close()
  }
}
