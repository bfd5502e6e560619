package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent aggregation of decimal-valued doubles.
  *
  * Summing doubles is order-dependent: a different partition count,
  * thread schedule, or engine version reorders the additions and the
  * low bits drift. When the drifted aggregate then passes through
  * `round(x, 4)` near a rounding boundary, the rounded value flips and
  * the cross-engine hash gate fails even though both engines are
  * "right" (this killed q21/q37 in round 1 — the value sat 5.5e-6 from
  * a 4 dp boundary).
  *
  * Fix: aggregate in DECIMAL. The source columns hold values with a
  * small true decimal scale (prices/quantities are 2 dp), so casting
  * each row to DECIMAL(18, s) with s >= the value's true scale is
  * EXACT (the double sits ~1e-11 from its decimal grid point while the
  * nearest cast-rounding tie is 5*10^-s-1 away), and decimal addition
  * is associative — the sum is identical for every execution order and
  * engine.
  *
  * The final decimal->double cast is also deterministic across Spark
  * and DuckDB: both compute `(double)unscaled / 10^scale` while the
  * unscaled long stays below 2^52 (Java BigDecimal.doubleValue fast
  * path == DuckDB's decimal->double cast), which holds by orders of
  * magnitude at gate scale.
  *
  * Rule of thumb for `scale`: the true decimal scale of the per-row
  * expression — 4 for raw 2 dp columns and products of two 2 dp
  * columns, 6 for triple products.
  */
object Exact {

  /** Per-row exact decimal image of a small-scale double expression. */
  def dec(c: Column, scale: Int = 4): Column = c.cast(DecimalType(18, scale))

  /** Exact, order-independent sum, returned as double. */
  def sumExact(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast("double")

  /** Exact mean: exact decimal sum over non-null count. The division is
    * one IEEE op on bit-identical inputs -> bit-identical quotient.
    */
  def meanExact(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast("double") / count(c)

  /** Sample standard deviation from exact decimal sums of x and x^2:
    * sqrt((S2 - S1^2/n) / (n-1)). Unlike stddev_samp's streaming merge
    * (order-dependent), the inputs here are order-independent, so the
    * double-space formula evaluates bit-identically in both engines.
    * Pair with the same formula spelled out in the DuckDB oracle.
    */
  def stddevExact(c: Column, scale: Int = 4, sqScale: Int = 4): Column = {
    val n = count(c).cast("double")
    val s1 = sum(dec(c, scale)).cast("double")
    val s2 = sum(dec(c * c, sqScale)).cast("double")
    sqrt((s2 - s1 * s1 / n) / (n - lit(1.0d)))
  }

  // ---- DuckDB oracle-side spellings of the same aggregates ----

  def sumSql(e: String, scale: Int = 4): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"

  def meanSql(e: String, scale: Int = 4): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / count($e)"

  def stddevSql(e: String, scale: Int = 4, sqScale: Int = 4): String =
    s"sqrt((CAST(sum(CAST(($e) * ($e) AS DECIMAL(18,$sqScale))) AS DOUBLE)" +
      s" - ${sumSql(e, scale)} * ${sumSql(e, scale)} / CAST(count($e) AS DOUBLE))" +
      s" / (CAST(count($e) AS DOUBLE) - 1.0))"
}
