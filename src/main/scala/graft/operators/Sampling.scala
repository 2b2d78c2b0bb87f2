package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and split assignment.
  *
  * Spark's `sample`/`randomSplit` draw from per-partition RNG streams, so
  * results change with partitioning, task retries and row order — none of
  * which a 100 TB curation pipeline can tolerate (and none of which an
  * external oracle can reproduce). Hashing the row's id instead gives a
  * sample that is stable under any physical layout, reproducible across
  * engines (md5-derived, DuckDB-mirrorable), and consistent across tables
  * (the same id always lands in the same bucket — join-safe).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id's seeded md5-hash.
    * Modulo bias is ≤ buckets/2^60 — negligible. Built from plain
    * `functions._` (the conv/substring md5 composition, same value as
    * graft_hash64) so the Column works on ANY session — no function
    * registration required; sampling is one hash per row, where the
    * compiled expression's advantage is immaterial. */
  def hashBucket(id: Column, seed: Int, buckets: Int = 100): Column = {
    require(buckets >= 1)
    val h = conv(substring(md5(concat(id.cast("string"), lit(s":$seed"))), 1, 15),
      16, 10).cast("long")
    pmod(h, lit(buckets.toLong))
  }

  /** train/val/test assignment by hash percentile: [0,train) → "train",
    * [train,train+valPct) → "val", rest → "test". */
  def assignSplit(id: Column, seed: Int, train: Int = 80, valPct: Int = 10): Column = {
    require(train >= 0 && valPct >= 0 && train + valPct <= 100)
    val b = hashBucket(id, seed, 100)
    when(b < train, lit("train"))
      .when(b < train + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Keep ~pct% of rows, deterministically. */
  def sampleHash(df: DataFrame, idCol: String, pct: Int, seed: Int): DataFrame =
    df.filter(hashBucket(col(idCol), seed) < pct)
}
