package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyFactory, PrivateKey, PublicKey, Signature}
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}
import java.util.Base64
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** JWT RS256 sign/verify (SURVEY §2.1 S11, §2.6 F9 — the reference's
  * tests/test-jwt.c:59-209 exercised libjwt; here it is plain JDK crypto,
  * no dependencies). Exposed both as driver-side helpers and as column
  * functions (UDF is appropriate: crypto is not a scan-path op).
  */
object Jwt {

  private val header = b64url("""{"alg":"RS256","typ":"JWT"}""".getBytes(UTF_8))

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private def pemBody(pem: String): Array[Byte] =
    Base64.getMimeDecoder.decode(
      pem.linesIterator.filterNot(_.startsWith("-----")).mkString)

  def privateKeyFromPem(pem: String): PrivateKey =
    KeyFactory.getInstance("RSA")
      .generatePrivate(new PKCS8EncodedKeySpec(pemBody(pem)))

  def publicKeyFromPem(pem: String): PublicKey =
    KeyFactory.getInstance("RSA")
      .generatePublic(new X509EncodedKeySpec(pemBody(pem)))

  /** RS256-sign a JSON claims payload → compact JWT. */
  def sign(claimsJson: String, key: PrivateKey): String = {
    val signingInput = header + "." + b64url(claimsJson.getBytes(UTF_8))
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(signingInput.getBytes(UTF_8))
    signingInput + "." + b64url(sig.sign())
  }

  /** Verify signature and return the claims JSON, or None. */
  def verify(token: String, key: PublicKey): Option[String] =
    token.split('.') match {
      case Array(h, p, s) =>
        val sig = Signature.getInstance("SHA256withRSA")
        sig.initVerify(key)
        sig.update((h + "." + p).getBytes(UTF_8))
        val ok = scala.util.Try(
          sig.verify(Base64.getUrlDecoder.decode(s))).getOrElse(false)
        if (ok) Some(new String(Base64.getUrlDecoder.decode(p), UTF_8)) else None
      case _ => None
    }

  /** Column function: sign a JSON-claims column with a PEM key. The key
    * is parsed ONCE on the driver and shipped in the closure
    * (java.security keys are Serializable) — re-parsing the PEM per row
    * would make KeyFactory dominate the actual signature work. */
  def jwtSign(claims: Column, privateKeyPem: String): Column = {
    val key = privateKeyFromPem(privateKeyPem)
    val f = udf { (c: String) => if (c == null) null else sign(c, key) }
    f(claims)
  }

  /** Column function: true when the token column verifies (key parsed
    * once, as in [[jwtSign]]). */
  def jwtVerify(token: Column, publicKeyPem: String): Column = {
    val key = publicKeyFromPem(publicKeyPem)
    val f = udf { (t: String) => t != null && verify(t, key).isDefined }
    f(token)
  }
}
