package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter builder over a string fingerprint column (SURVEY §2.8
  * U3/U6): folds fingerprints into an `mBits`-wide bitmap packed as
  * `mBits/64` longs.
  *
  * Each fingerprint sets `numHashes` bits at positions
  * `hash64(fp, seedBase + j) mod mBits` — the same md5-derived 60-bit
  * hash family as every other engine hash ([[expressions.Md5Hash60]]), so
  * a set bit is exactly "some corpus fingerprint maps here" and the whole
  * filter is reproducible in any engine (the DuckDB oracle mirrors it as
  * a distinct-position set; bit `p` set ⟺ `p` in that set).
  *
  * Scale shape: the buffer is fixed-size (mBits/8 bytes) regardless of
  * row count, OR-merge is associative/commutative, and partial
  * aggregation combines map-side — building the filter over a 100 TB
  * corpus is one scan producing one sketch-sized row to broadcast.
  * Probing is then map-only ([[graft.operators.Dedup.bloomFlags]]): the
  * cheap membership pre-filter in front of an exact-join dedup, with
  * false-positive rate ≈ (1 - e^(-k·n/m))^k and zero false negatives.
  * When n grows past m/10, shard the corpus and build one filter per
  * shard rather than growing a single bitmap past broadcast size.
  *
  * NULL fingerprints contribute nothing (same policy as
  * [[graft.operators.Dedup.exactClusters]] — NULL content must not make
  * docs "duplicates" of each other).
  */
class BloomFilterAggregator(mBits: Int, numHashes: Int, seedBase: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  private val suffixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(j => s":${seedBase + j}".getBytes("UTF-8"))

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  /** The ONE insert/probe position derivation (hash60 is non-negative, so
    * `%` == pmod — same value as the compiled-column probe in
    * [[graft.operators.Dedup.bloomFlags]]). Every consumer — batch build,
    * streaming probe+insert — goes through here; a second inline copy
    * could silently drift and produce systematic false drops. */
  def positions(fp: UTF8String): Array[Int] = {
    val out = new Array[Int](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = (expressions.Md5Hash60.hash60(fp, suffixes(j)) % mBits).toInt
      j += 1
    }
    out
  }

  /** Probe `bm` at the given [[positions]] result. */
  def allSet(bm: Array[Long], pos: Array[Int]): Boolean = {
    var j = 0
    while (j < pos.length) {
      if ((bm(pos(j) >> 6) >>> (pos(j) & 63) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  /** Set the bits of a [[positions]] result in `bm`. */
  def setAll(bm: Array[Long], pos: Array[Int]): Unit = {
    var j = 0
    while (j < pos.length) {
      bm(pos(j) >> 6) |= 1L << (pos(j) & 63)
      j += 1
    }
  }

  override def reduce(buf: Array[Long], fp: String): Array[Long] = {
    if (fp == null) return buf
    setAll(buf, positions(UTF8String.fromString(fp)))
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
