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

  /** The seeded 60-bit md5 hash every sampling op derives from — ONE
    * definition (the same value as graft_hash64 and the oracle's dkHash)
    * so bucket assignment and rank order can never drift apart. Built
    * from plain `functions._` (conv/substring/md5) so the Column works on
    * ANY session — no function registration required; sampling is one
    * hash per row, where the compiled expression's advantage is
    * immaterial. */
  def seededHash(id: Column, seed: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(s":$seed"))), 1, 15),
      16, 10).cast("long")

  /** Uniform bucket in [0, buckets) from the id's seeded md5-hash.
    * Modulo bias is ≤ buckets/2^60 — negligible. */
  def hashBucket(id: Column, seed: Int, buckets: Int = 100): Column = {
    require(buckets >= 1)
    pmod(seededHash(id, seed), lit(buckets.toLong))
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
    * parallelizes; for a single giant stratum, pre-filter on the RAW hash
    * — `seededHash(id, seed) < (2·cap/|stratum|) · 2^60` — so the sort
    * sees a small superset that provably contains the cap smallest
    * hashes (a prefix of the global hash order), then rank. A
    * [[hashBucket]] pre-filter would NOT work: pmod is not monotone in
    * the hash, so bucket membership keeps a random slice, not the
    * smallest-hash rows. */
  def stratifiedCap(df: DataFrame, strata: Seq[String], idCol: String,
      cap: Int, seed: Int): DataFrame = {
    require(cap >= 1 && strata.nonEmpty)
    // fail fast: silently replacing a caller's `rn` (e.g. another ranking
    // step's output) would hand downstream code the wrong column
    require(!df.columns.contains("rn"),
      "stratifiedCap emits a 'rn' column; input already has one — rename it first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy(seededHash(col(idCol), seed).asc, col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
  }
}
