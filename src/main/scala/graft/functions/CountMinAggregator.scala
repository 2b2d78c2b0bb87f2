package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min Sketch builder over a string column (SURVEY §2.8 U3/U6):
  * folds each element into a `depth × width` counter grid packed as one
  * `Array[Long]` (row-major; counter `(j, b)` lives at `j*width + b`).
  *
  * Each element increments one counter per row: row `j` uses bucket
  * `hash60(v, seedBase + j) mod width` — the same md5-derived 60-bit
  * hash family as every other engine hash ([[expressions.Md5Hash60]]),
  * so counter `(j, b)` is exactly "the total multiplicity of all
  * elements whose row-`j` hash lands on `b`", reproducible in any
  * engine (the DuckDB oracle mirrors it as a per-(row, bucket) SUM over
  * exact counts). The point estimate for `v` is the MIN over rows of
  * its counters — an overestimate by construction (collisions only add),
  * with error ≤ 2N/width at confidence 1 − (1/2)^depth (Cormode &
  * Muthukrishnan 2005, the public CM-sketch bound).
  *
  * Scale shape: the buffer is a fixed `depth*width*8` bytes regardless
  * of corpus size (32 KB at the 4×1024 default), elementwise-add merge
  * is associative/commutative, and partial aggregation combines
  * map-side — sketching token frequencies over a 100 TB corpus is one
  * scan producing one sketch-sized row to broadcast, where the exact
  * per-token groupBy would shuffle a vocabulary-sized table. Estimation
  * is then map-only against the broadcast sketch (array lookups + MIN —
  * see q132). When N grows so far past width that 2N/width drowns the
  * tail you care about, widen the sketch (cost is linear in width) —
  * heavy hitters stay accurate long before that, since their counts
  * dominate their buckets' collision noise.
  *
  * NULL elements contribute nothing (same policy as
  * [[BloomFilterAggregator]]).
  */
class CountMinAggregator(width: Int, depth: Int, seedBase: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(width > 0, s"width must be positive, got $width")
  require(depth > 0, s"depth must be positive, got $depth")

  private val suffixes: Array[Array[Byte]] =
    Array.tabulate(depth)(j => s":${seedBase + j}".getBytes("UTF-8"))

  override def zero: Array[Long] = new Array[Long](depth * width)

  /** The ONE bucket derivation (hash60 is non-negative, so `%` == pmod —
    * the same value as `graft_hash64(v, seedBase+j) % width` in the
    * estimation probe and the oracle mirror). Insert and probe must
    * share it or estimates silently drift low (a false UNDER-estimate,
    * the one error class a CM sketch must never produce). */
  def buckets(v: UTF8String): Array[Int] = {
    val out = new Array[Int](depth)
    var j = 0
    while (j < depth) {
      out(j) = (expressions.Md5Hash60.hash60(v, suffixes(j)) % width).toInt
      j += 1
    }
    out
  }

  override def reduce(buf: Array[Long], v: String): Array[Long] = {
    if (v == null) return buf
    val bs = buckets(UTF8String.fromString(v))
    var j = 0
    while (j < depth) {
      buf(j * width + bs(j)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  /** Point estimate for `v` from a finished sketch: MIN over rows of
    * v's counters. Driver-side twin of the q132 column probe, for specs
    * and tools. */
  def estimate(sketch: Seq[Long], v: String): Long = {
    val bs = buckets(UTF8String.fromString(v))
    var m = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = sketch(j * width + bs(j))
      if (c < m) m = c
      j += 1
    }
    m
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
