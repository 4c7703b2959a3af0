package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-arithmetic helpers for hash-stable aggregates.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same SQL (SURVEY.md §5.1). Double summation is order-dependent, and
  * Spark's partial/final aggregation order differs from DuckDB's — so any
  * `sum(double)` would diverge in the low bits. The fixtures' money
  * columns are doubles that carry exactly two decimal digits (FIXTURES.md),
  * so casting to a small decimal *recovers the exact value*; decimal
  * aggregation is then order-independent and bit-identical across engines,
  * and a final cast back to double is a single well-defined rounding.
  *
  * At scale this costs nothing extra: decimal sum is still a hash
  * aggregate with partial/final combine (map-side combine intact).
  */
object Exact {

  /** Money-ish 2-decimal double → exact decimal (values < 1e10). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** 1 - pct (e.g. discount), recovered exactly as decimal(4,2). */
  def oneMinus(c: Column): Column = (lit(1.0) - c).cast(DecimalType(4, 2))

  /** 1 + pct (e.g. tax), recovered exactly as decimal(4,2). */
  def onePlus(c: Column): Column = (lit(1.0) + c).cast(DecimalType(4, 2))

  /** Order-independent exact sum surfaced as double. */
  def exactSum(c: Column): Column = sum(c).cast(DoubleType)

  /** Exact average surfaced as double (decimal sum, then one double div). */
  def exactAvg(c: Column): Column =
    sum(c).cast(DoubleType) / count(lit(1))

  /** Per-row discounted revenue, exact: price * (1 - discount). */
  def revenue(price: Column, discount: Column): Column =
    money(price) * oneMinus(discount)
}
