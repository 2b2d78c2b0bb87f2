package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable 60-bit text hash, compiled: the value of
  * `CAST(('0x'||substr(md5(v||':<seed>'),1,15)) AS BIGINT)` (the DuckDB
  * mirror) and of [[graft.functions.TextFunctions.hash64]] (the
  * `conv(substring(md5(concat(...))))` built-in composition) — but
  * computed straight from the digest bytes: the first 15 hex characters
  * of an MD5 are the top 60 bits of its first 8 bytes big-endian, so no
  * hex string is materialized, no `conv` base parsing runs, and no
  * intermediate concat/UTF8String allocations happen per element. The
  * built-in composition spends most of its time in exactly those string
  * conversions (one md5 runs per exploded shingle in every LSH query —
  * this is the hottest scalar in the engine).
  *
  * Parity with the mirror is tested (FunctionsSpec) — same md5, same 60
  * bits, same Long.
  */
case class Md5Hash60(child: Expression, seed: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  private val suffix: Array[Byte] = s":$seed".getBytes("UTF-8")

  def compute(s: UTF8String): Long = Md5Hash60.hash60(s, suffix)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5h", this, classOf[Md5Hash60].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The one md5→60-bit derivation every engine hash shares: first 15 hex
    * chars of md5(s ++ suffix) == top 60 bits of the first 8 digest bytes
    * (big-endian). */
  def hash60(s: UTF8String, suffix: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    md.update(s.getBytes)
    md.update(suffix)
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
