package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers that make floating-point aggregates deterministic and
  * engine-portable.
  *
  * Summing doubles is order-dependent; Spark's partial/final aggregation
  * order differs run-to-run and from any other engine, so a raw
  * `sum(double)` can never hash-match an oracle. The default here is
  * fixed-point: floor(x·1e6) is the same int64 in every IEEE engine
  * (multiply and floor are deterministic), int64 sums are exact and
  * associative — so partial aggregation (map-side combine) stays enabled
  * and bit-stable under any partitioning / AQE re-plan. DuckDB mirror:
  * `CAST(CAST(SUM(CAST(floor(x*1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0`.
  *
  * Range: micro-unit sums must stay below 2^63 → per-group Σ|x| < 9.2e12.
  * That covers this corpus by ~100×; for unbounded-scale sums use
  * [[dsumDecimal]] (exact decimal, ~3× slower: the cast allocates
  * BigDecimal per row and the agg buffer leaves the primitive path).
  */
object Num {
  private val S = 1000000.0 // micro-units

  /** Order-independent, engine-portable sum of a double column. */
  def dsum(c: Column): Column =
    sum(floor(c * S)).cast("double") / S

  /** Order-independent mean (null-skipping, like AVG). */
  def davg(c: Column): Column =
    sum(floor(c * S)).cast("double") / S / count(c)

  /** Windowed variant: apply `.over(w)` to both pieces. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(floor(c * S)).over(w).cast("double") / S

  /** Exact-decimal sum — unbounded range, slower. DuckDB mirror:
    * CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE). */
  def dsumDecimal(c: Column): Column = sum(c.cast("decimal(25,6)")).cast("double")

  /** Deterministic sample variance from exact fixed-point sums:
    * (Σx² − (Σx)²/n) / (n−1). Raw `var_samp`/`stddev` stream the update
    * formula over doubles and are order-dependent; this is not.
    *
    * The two floors bias Σx² and (Σx)² INDEPENDENTLY, so the numerator
    * can dip epsilon-negative for (near-)constant columns whose squares
    * floor badly on the 1e-6 grid — clamped at 0, or [[dstddevSamp]]
    * would return NaN where the truth is 0. n ≤ 1 returns NULL like
    * `var_samp` in both engines (the raw division gave 0/0 or ±Inf from
    * a floor-biased numerator). Mirrored in [[sqlVarSamp]]. */
  def dvarSamp(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = sum(floor(c * S)).cast("double") / S
    val sxx = sum(floor(c * c * S)).cast("double") / S
    when(n > 1, greatest(lit(0.0), sxx - sx * sx / n) / (n - lit(1.0)))
  }

  def dstddevSamp(c: Column): Column = sqrt(dvarSamp(c))

  /** Deterministic Pearson correlation from exact fixed-point sums, over
    * COMPLETE pairs only (rows where both inputs are non-null — standard
    * corr semantics). Mixing a count(*) n with null-skipping sums would
    * produce a number that is the correlation of nothing in particular.
    * The same floor-bias clamps as [[dvarSamp]]: the per-variable
    * variance terms clamp at 0 before sqrt (NaN guard) and the ratio
    * clamps into [−1, 1] (the bias can push |r| past 1 by an ulp).
    *
    * A CONSTANT input (zero variance) makes the denominator exactly 0:
    * correlation is undefined — NULL, like DuckDB's divide-by-zero and
    * like corr() in both engines, never an ANSI DIVIDE_BY_ZERO throw
    * (NUMCHECK gate; a plain `/` here died the first time a gate corpus
    * held a constant group). try_divide pins it; the isnan branch is
    * kept for defense should a NaN input ever reach the ratio (NaN
    * compares greater than any value in Spark AND DuckDB, so the > / <
    * clamp branches must not see it first). */
  def dcorr(x: Column, y: Column): Column = {
    val both = x.isNotNull && y.isNotNull
    val n = count(when(both, 1)).cast("double")
    def s(e: Column) = sum(floor(when(both, e) * S)).cast("double") / S
    val (sx, sy, sxy, sxx, syy) = (s(x), s(y), s(x * y), s(x * x), s(y * y))
    val vx = greatest(lit(0.0), n * sxx - sx * sx)
    val vy = greatest(lit(0.0), n * syy - sy * sy)
    val r = try_divide(n * sxy - sx * sy, sqrt(vx) * sqrt(vy))
    when(isnan(r), r).when(r > 1.0, lit(1.0)).when(r < -1.0, lit(-1.0))
      .otherwise(r)
  }

  /** DuckDB mirrors for the dispersion helpers. */
  def sqlVarSamp(x: String): String = {
    val n = s"CAST(COUNT($x) AS DOUBLE)"
    s"(CASE WHEN $n > 1 THEN GREATEST(0.0, (${sqlSum(s"($x) * ($x)")})" +
      s" - (${sqlSum(x)}) * (${sqlSum(x)}) / $n) / ($n - 1.0) END)"
  }
  def sqlCorr(x: String, y: String): String = {
    val both = s"($x) IS NOT NULL AND ($y) IS NOT NULL"
    val n = s"CAST(COUNT(CASE WHEN $both THEN 1 END) AS DOUBLE)"
    def cs(e: String) = sqlSum(s"CASE WHEN $both THEN ($e) END")
    val r = s"(($n * (${cs(s"($x) * ($y)")}) - (${cs(x)}) * (${cs(y)}))" +
      s" / (sqrt(GREATEST(0.0, $n * (${cs(s"($x) * ($x)")}) - (${cs(x)}) * (${cs(x)})))" +
      s" * sqrt(GREATEST(0.0, $n * (${cs(s"($y) * ($y)")}) - (${cs(y)}) * (${cs(y)})))))"
    s"(CASE WHEN isnan($r) THEN $r WHEN $r > 1.0 THEN 1.0" +
      s" WHEN $r < -1.0 THEN -1.0 ELSE $r END)"
  }

  /** SQL-text mirrors for oracle queries (DuckDB side). */
  def sqlSum(x: String): String =
    s"CAST(CAST(SUM(CAST(floor(($x) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0"
  def sqlAvg(x: String): String =
    s"${sqlSum(x)} / COUNT($x)"
}
