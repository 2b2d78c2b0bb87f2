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
    * formula over doubles and are order-dependent; this is not. */
  def dvarSamp(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = sum(floor(c * S)).cast("double") / S
    val sxx = sum(floor(c * c * S)).cast("double") / S
    (sxx - sx * sx / n) / (n - lit(1.0))
  }

  def dstddevSamp(c: Column): Column = sqrt(dvarSamp(c))

  /** Deterministic Pearson correlation from exact fixed-point sums, over
    * COMPLETE pairs only (rows where both inputs are non-null — standard
    * corr semantics). Mixing a count(*) n with null-skipping sums would
    * produce a number that is the correlation of nothing in particular. */
  def dcorr(x: Column, y: Column): Column = {
    val both = x.isNotNull && y.isNotNull
    val n = count(when(both, 1)).cast("double")
    def s(e: Column) = sum(floor(when(both, e) * S)).cast("double") / S
    val (sx, sy, sxy, sxx, syy) = (s(x), s(y), s(x * y), s(x * x), s(y * y))
    (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }

  /** DuckDB mirrors for the dispersion helpers. */
  def sqlVarSamp(x: String): String = {
    val n = s"CAST(COUNT($x) AS DOUBLE)"
    s"((${sqlSum(s"($x) * ($x)")}) - (${sqlSum(x)}) * (${sqlSum(x)}) / $n) / ($n - 1.0)"
  }
  def sqlCorr(x: String, y: String): String = {
    val both = s"($x) IS NOT NULL AND ($y) IS NOT NULL"
    val n = s"CAST(COUNT(CASE WHEN $both THEN 1 END) AS DOUBLE)"
    def cs(e: String) = sqlSum(s"CASE WHEN $both THEN ($e) END")
    s"($n * (${cs(s"($x) * ($y)")}) - (${cs(x)}) * (${cs(y)}))" +
      s" / (sqrt($n * (${cs(s"($x) * ($x)")}) - (${cs(x)}) * (${cs(x)}))" +
      s" * sqrt($n * (${cs(s"($y) * ($y)")}) - (${cs(y)}) * (${cs(y)})))"
  }

  /** SQL-text mirrors for oracle queries (DuckDB side). */
  def sqlSum(x: String): String =
    s"CAST(CAST(SUM(CAST(floor(($x) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0"
  def sqlAvg(x: String): String =
    s"${sqlSum(x)} / COUNT($x)"
}
