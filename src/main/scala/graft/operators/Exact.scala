package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic aggregation helpers.
  *
  * Floating-point SUM/AVG are accumulation-order dependent, and the order
  * differs run-to-run (partial aggregation) and engine-to-engine — so a
  * hash-compared oracle would flake. Casting each term to DECIMAL(18,4)
  * first makes the sum exact and order-independent; casting the exact
  * decimal result back to DOUBLE is then bit-deterministic in any engine.
  * The same trick at 100 TB: decimal sums are also what you want for money
  * columns on a real cluster (no catastrophic cancellation at 1e12 rows).
  *
  * Mirror in DuckDB oracle SQL:
  *   CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  *   CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
  */
object Exact {
  private val D = DecimalType(18, 4)

  /** Order-independent double sum (exact decimal accumulate). */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent double average: exact sum / count, one IEEE
    * division — identical bits in Spark and DuckDB. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))

  /** SQL fragment mirrors (for building oracle strings). */
  def sqlSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlAvg(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"

  // A product of ≥3 doubles is NOT bit-identical across engines (fma /
  // association differences surfaced as a 4th-decimal drift in TPC-H Q1's
  // sum_charge). For money × rate-factor products, cast each FACTOR to
  // decimal first: the inputs are 2-decimal values, so the casts are
  // unambiguous and the whole product is exact in both engines.
  private val F = DecimalType(8, 4)

  /** price * (1 - d) * (1 + t) as exact decimal; stays within
    * DECIMAL(38,12) so no rounding anywhere. */
  def chargeProd(price: Column, disc: Column, tax: Column): Column =
    price.cast(D) * (lit(1).cast(F) - disc.cast(F)) * (lit(1).cast(F) + tax.cast(F))

  def sqlChargeProd(p: String, d: String, t: String): String =
    s"CAST($p AS DECIMAL(18,4)) * (1 - CAST($d AS DECIMAL(8,4))) * (1 + CAST($t AS DECIMAL(8,4)))"

  /** Exact-decimal sum of an already-decimal expression, surfaced as
    * double AT CENT PRECISION. The precision drop is not cosmetic: a
    * (38,12) sum's scaled integer exceeds 2^53, and engines then convert
    * to double differently (Java BigDecimal rounds the decimal value
    * once; DuckDB converts the int128 to double and divides by 10^scale
    * — two roundings), which surfaced as a 1-ulp sum_charge drift at
    * sf0.1. Rounding to scale 2 first keeps the scaled integer ≤ 2^53,
    * so both engines perform one exact-numerator IEEE division —
    * bit-identical by construction.
    *
    * VALID MAGNITUDE RANGE (scale limits of this correctness guarantee):
    * the narrowing cast to DECIMAL(18,2) yields NULL under Spark's
    * default non-ANSI mode once |sum| ≥ 10^16, and the one-division
    * bit-identity argument needs the cent-scaled integer ≤ 2^53, i.e.
    * |sum| ≤ ~9.0e13. TPC-H money sums grow ~2e9·sf, so both bounds
    * hold through sf ≈ 10⁴ (≈10 TB of lineitem) — far past any tested
    * scale, but a real ceiling: beyond it, keep the DECIMAL
    * representation end-to-end (drop the double surfacing) instead of
    * widening this helper. */
  private val D2 = DecimalType(18, 2)
  def dsumRaw(c: Column): Column = sum(c).cast(D2).cast("double")
  // ROUND, not a narrowing CAST: DuckDB's decimal→decimal cast TRUNCATES
  // the dropped digits, while Spark's cast rounds HALF_UP. ROUND(x, 2)
  // rounds half away from zero — the same rule as Spark's cast.
  def sqlSumRaw(x: String): String =
    s"CAST(ROUND(SUM($x), 2) AS DOUBLE)"
}
