package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY §2.8 U3/U6): folds raw
  * 60-bit token hashes into a k-wide signature in one pass.
  *
  * Each slot i tracks min over tokens of (h XOR c_i) where c_i is an
  * md5-derived constant — an xor-permutation family, adequate for LSH
  * banding. Elementwise-min buffers are associative and tiny (k longs),
  * so partial aggregation combines map-side; compared to the
  * explode×k+groupBy shape this trades k shuffle columns for a single
  * binary buffer — the win when k is large or the group count is huge.
  *
  * NULL hash values are skipped (the input type is java.lang.Long so the
  * encoder is nullable) — the same behavior as the explode+min form,
  * where a NULL hash contributes nothing to any slot; a primitive Long
  * input encoder would instead crash the stage on the first NULL.
  *
  * Register for SQL/DataFrame use with
  * `udaf(new MinHashAggregator(k))`.
  */
class MinHashAggregator(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {

  private val mixers: Array[Long] = Array.tabulate(k)(TextFunctions.mixConstant)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], boxed: java.lang.Long): Array[Long] = {
    if (boxed == null) return buf
    val h = boxed.longValue()
    var i = 0
    while (i < k) { val v = h ^ mixers(i); if (v < buf(i)) buf(i) = v; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
