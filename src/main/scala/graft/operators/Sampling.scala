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

  /** Stratified cap-K sampling: within each stratum keep the `cap` rows
    * with the smallest seeded id-hash (a deterministic uniform draw —
    * every row's hash is an iid uniform, so rank ≤ cap is an exact
    * without-replacement sample per stratum, stable under layout/retries
    * like every hash op here). Adds `rn` (1-based rank within stratum).
    *
    * Scale: one shuffle on the stratum key; each window partition sorts
    * only its stratum. The corpus-balancing use has many strata of
    * bounded size (source × lang × …), which is exactly the shape that
    * parallelizes; for a single giant stratum, pre-filter with
    * [[hashBucket]] < ~2·cap·buckets/|stratum| first so the sort sees a
    * small superset, then rank (same result — the hash order is global). */
  def stratifiedCap(df: DataFrame, strata: Seq[String], idCol: String,
      cap: Int, seed: Int): DataFrame = {
    require(cap >= 1 && strata.nonEmpty)
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(s":$seed"))), 1, 15),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*).orderBy(h.asc, col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
  }
}
