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
  * `CAST(SUM(CAST(floor(x*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0`.
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

  /** SQL-text mirrors for oracle queries (DuckDB side). */
  def sqlSum(x: String): String =
    s"CAST(SUM(CAST(floor(($x) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0"
  def sqlAvg(x: String): String =
    s"${sqlSum(x)} / COUNT($x)"
}
