package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers that make floating-point aggregates deterministic and
  * engine-portable.
  *
  * Summing doubles is order-dependent; Spark's partial/final aggregation
  * order differs run-to-run and from any other engine, so a raw
  * `sum(double)` can never hash-match an oracle. The fix: cast each input
  * (a deterministic IEEE double) to an exact decimal, sum exactly
  * (order-independent), and cast the final result back to double. The
  * DuckDB mirror is `CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`.
  *
  * This also matters at 100 TB: decimal sums are associative, so partial
  * aggregation (map-side combine) stays enabled and bit-stable across any
  * partitioning / AQE re-plan.
  */
object Num {
  /** 6 fractional digits covers the corpus (prices to 1e6 with ~2–6dp). */
  val Dec = "decimal(25,6)"
  /** Higher-scale decimal for small magnitudes (cosine terms, ratios). */
  val DecHi = "decimal(38,18)"

  /** Order-independent, engine-portable sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent mean (null-skipping, like AVG). */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(c)

  /** High-precision variant for |x| < ~1e20 with tiny magnitudes. */
  def dsumHi(c: Column): Column = sum(c.cast(DecHi)).cast("double")

  /** SQL-text mirrors for oracle queries (DuckDB side). */
  def sqlSum(x: String): String  = s"CAST(SUM(CAST(($x) AS DECIMAL(25,6))) AS DOUBLE)"
  def sqlAvg(x: String): String  = s"CAST(SUM(CAST(($x) AS DECIMAL(25,6))) AS DOUBLE) / COUNT($x)"
  def sqlSumHi(x: String): String = s"CAST(SUM(CAST(($x) AS DECIMAL(38,18))) AS DOUBLE)"
}
