package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact money aggregation WITHOUT per-row decimal boxing.
  *
  * `sum(CAST(x AS DECIMAL(18,2)))` is semantically exact but physically
  * expensive: Spark's decimal sum allocates a `Decimal` per row inside
  * the aggregation buffer and runs checked precision-promoting adds —
  * at sf1 that made the TPC-H-Q1-shaped q12 ~12x DuckDB on an otherwise
  * optimal partial+final hash-agg plan. The fix is the
  * [[VecCentroid]] quantize-to-long argument applied to money: a 2-dp
  * money value is an exact integer count of cents, so the whole
  * aggregation can run over `long` columns inside whole-stage codegen
  * and only the FINAL per-group value (a handful of rows) touches
  * decimal arithmetic.
  *
  * Quantization ([[cents]]): `floor(x*100 + 0.5)` is half-up rounding
  * to 2 decimals for NONNEGATIVE doubles — identical to
  * `CAST(x AS DECIMAL(18,2))` (BigDecimal HALF_UP) whenever the double
  * is within floating-point error of a 2-dp value and |x| is small
  * enough that `x*100` carries sub-0.5 error (money magnitudes: for
  * x <= 1e12 the combined representation+multiplication error is
  * < 1e-2, far below the 0.5 rounding slack). Unlike `round()`, whose
  * double codegen allocates a BigDecimal via `Double.toString` per row,
  * this is three pure double ops in codegen.
  *
  * Overflow ([[sumUnits]]): a single `sum(long)` is exact only while
  * the group total fits a long — with per-row unit values up to ~1e9
  * (a 1e7-cent price times a 0-100 discount factor) that bound is
  * ~9e9 rows per group, too small for 100 TB fact tables. So the sum
  * is SPLIT: `v == (v >> 20)*2^20 + (v & (2^20-1))` holds for every
  * long (arithmetic shift = floor division), and the two halves are
  * summed separately — the high half at most `perRowMax / 2^20` per
  * row (~1e3 for the discount product: safe to ~9e15 rows/group), the
  * low half < 2^20 (safe to ~9e12 rows/group). The halves recombine in
  * DECIMAL(38,0) on the final per-group rows only, where the cost is
  * nil. This is the split-accumulator escape DuckDB takes internally
  * via its 128-bit sum, expressed in Spark-native longs.
  *
  * Final cast ([[sumMoney]]): the recombined exact integer is divided
  * by 10^scale in decimal (exact — the value has at most `scale`
  * fractional digits and Spark keeps >= 6) and cast to double, i.e. a
  * correctly-rounded double of the exact total — bit-identical to the
  * oracle's `CAST(SUM(DECIMAL) AS DOUBLE)`.
  */
object ExactMoney {

  /** Exact integer cents (10^-2 units) of a nonnegative money double;
    * half-up, matching `CAST(x AS DECIMAL(18,2))` on money magnitudes.
    * Null propagates. Returns LongType.
    */
  def cents(c: Column): Column = floor(c * lit(100) + lit(0.5))

  private val LoBits = 20
  private val LoMask = (1L << LoBits) - 1
  private val d38 = DecimalType(38, 0)

  /** Overflow-split exact sum of long unit values (any sign); returns
    * the exact integer total as decimal. Two codegen long sums per row;
    * decimal recombination happens per GROUP, not per row.
    */
  def sumUnits(units: Column): Column =
    sum(shiftright(units, LoBits)).cast(d38) * lit(1L << LoBits) +
      sum(units.bitwiseAND(lit(LoMask))).cast(d38)

  /** Exact money sum as double: unit values carry 10^-scale currency
    * units (scale=2 for cents, 4 for a cents-times-percent product).
    */
  def sumMoney(units: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 18, s"unsupported money scale $scale")
    val pow = math.pow(10, scale).toLong
    (sumUnits(units) / lit(pow)).cast("double")
  }
}
