package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** Minimal dependency-free SMTP transport behind [[Sinks.Notifier]].
  *
  * The reference ships a complete SMTP sender as its alert delivery path
  * (utils/email-sender-libcurl.c:128-193, utils/email-sender.c), with TLS
  * and AUTH security modes (utils/email-sender.h:32-38, auth setup
  * utils/email-sender.c:271-293); this is the same capability as an
  * RFC 5321 client over a plain JDK socket, upgraded in place:
  * EHLO → [STARTTLS (RFC 3207) + re-EHLO] → [AUTH PLAIN (RFC 4616)] →
  * MAIL FROM → RCPT TO → DATA (dot-stuffed) → QUIT. TLS uses the JDK
  * default `SSLContext`; override [[sslSocketFactory]] to pin a custom
  * trust store (the spec's in-process TLS server does).
  *
  * Serializable: each executor task constructs one connection per send.
  * A failed send throws, failing the task → the streaming checkpoint
  * retries the batch (at-least-once delivery, strictly stronger than the
  * reference's fire-and-forget). Credentials ride the closure like any
  * other connector secret — source them from a secret manager in
  * production, not code.
  */
class SmtpNotifier(
    host: String,
    port: Int,
    from: String,
    to: Seq[String],
    timeoutMs: Int = 10000,
    startTls: Boolean = false,
    username: Option[String] = None,
    password: Option[String] = None) extends Sinks.Notifier {

  require(username.isDefined == password.isDefined,
    "AUTH PLAIN needs both username and password (or neither)")
  // fail at construction on the DRIVER, not per-send inside a retrying
  // executor task — this is a pure configuration error
  require(username.isEmpty || startTls ||
    Set("127.0.0.1", "localhost", "::1", "[::1]").contains(host),
    "refusing AUTH PLAIN on an unencrypted non-loopback connection")

  /** Client-side TLS socket factory for the STARTTLS upgrade. Default =
    * JDK default context (system trust store); tests override with a
    * context trusting their in-process certificate. */
  protected def sslSocketFactory(): javax.net.ssl.SSLSocketFactory =
    javax.net.ssl.SSLContext.getDefault.getSocketFactory

  override def send(subject: String, body: String): Unit = {
    val plain = new Socket()
    var socket: Socket = plain
    try {
      plain.connect(new InetSocketAddress(host, port), timeoutMs)
      plain.setSoTimeout(timeoutMs)
      var in = new BufferedReader(new InputStreamReader(
        socket.getInputStream, StandardCharsets.UTF_8))
      var out = new OutputStreamWriter(
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
      if (startTls) {
        cmd("STARTTLS", 220)
        val ssl = sslSocketFactory()
          .createSocket(socket, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(true)
        ssl.setSoTimeout(timeoutMs)
        // Without endpoint identification the JDK validates the chain but
        // NOT that the certificate is for `host` — any CA-valid cert
        // would pass, defeating the MITM protection TLS is here for.
        val params = ssl.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        ssl.setSSLParameters(params)
        ssl.startHandshake()
        socket = ssl
        in = new BufferedReader(new InputStreamReader(
          socket.getInputStream, StandardCharsets.UTF_8))
        out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)
        cmd(s"EHLO graft", 250) // RFC 3207 §4.2: state resets after TLS
      }
      (username, password) match {
        case (Some(u), Some(p)) =>
          val token = java.util.Base64.getEncoder.encodeToString(
            (s"\u0000$u\u0000$p").getBytes(StandardCharsets.UTF_8))
          cmd(s"AUTH PLAIN $token", 235)
        case _ => ()
      }
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
