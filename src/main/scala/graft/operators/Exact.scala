package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric idioms shared by the oracle-checked suites.
  *
  * The driver's correctness gate hashes EXACT values, and Spark and DuckDB
  * round doubles differently at k-dp boundaries (Spark rounds the shortest
  * decimal string HALF_UP, DuckDB rounds the binary value), while double
  * sums are additionally summation-order-dependent. This bit q2_min_cost at
  * sf0.1 in round 3's local sweep and q11_share at the round-3 driver gate
  * (partkey 1329: 363524.21499999997 rounded .21 by Spark, .22 by DuckDB).
  * Three idioms make numeric output bit-identical on both engines:
  *
  *  1. Exact-decimal sums ([[sumRound]] over [[dec2]]/[[dec3]]/[[revD]]/
  *     [[chargeD]] terms): every money column in the testdata is an exact
  *     2-dp decimal (o_totalprice: 3-dp; l_quantity: integral), so casting
  *     to decimal BEFORE arithmetic is lossless and unambiguous in both
  *     engines (the binary double sits within half an ulp of the true k-dp
  *     value, so string-based and binary-based casts agree). Decimal sums
  *     are exact and order-independent; `round` on a decimal is HALF_UP
  *     away-from-zero in BOTH engines (verified, including negatives and
  *     the exact x.xx5 boundary); and an exact k-dp decimal casts to the
  *     identical nearest double in both engines. Cast to double LAST.
  *  2. [[floorRound]] for quotients/ratios computed from bit-identical
  *     doubles with mirrored operator order: floor(x*10^k + 0.5)/10^k is
  *     pure double arithmetic, bit-identical cross-engine regardless of
  *     either engine's round() implementation. (For negative x this is
  *     half-toward-+infinity rather than half-away-from-zero; both sides
  *     of the oracle use the same formula, so the result is still pinned.)
  *  3. Messy (transcendental) element values: cast each element to
  *     decimal(38,18) before summing for order independence; the residual
  *     cross-engine cast divergence (Spark casts via the shortest decimal
  *     string, DuckDB via binary scaling) is ~1e-14 absolute per element
  *     and sits far inside any 6-dp rounding margin.
  */
object Exact {

  /** Exact decimal view of a 2-dp money column (prices, balances, values). */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact decimal view of a small 2-dp rate column (discount, tax). */
  def rate2(c: Column): Column = c.cast("decimal(4,2)")

  /** Exact decimal view of the 3-dp o_totalprice column. */
  def dec3(c: Column): Column = c.cast("decimal(13,3)")

  /** Exact decimal view of an integral double (l_quantity). */
  def dec0(c: Column): Column = c.cast("decimal(12,0)")

  /** Exact revenue term: extendedprice * (1 - discount), scale 4. */
  def revD: Column =
    dec2(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - rate2(col("l_discount")))

  /** Exact charge term: revenue * (1 + tax), scale 6. */
  def chargeD: Column = revD * (lit(1).cast("decimal(3,2)") + rate2(col("l_tax")))

  /** Order-independent exact sum of a decimal expression, rounded HALF_UP
    * at `scale` and emitted as double — identical in Spark and DuckDB. */
  def sumRound(e: Column, scale: Int): Column = round(sum(e), scale).cast("double")

  /** Exact decimal column rounded at `scale`, emitted as double (for
    * display columns like round(o_totalprice, 2) whose input has MORE
    * true decimals than the display scale — a knife-edge for round()). */
  def decRound(e: Column, scale: Int): Column = round(e, scale).cast("double")

  /** Engine-agnostic rounding of an already-bit-identical double. */
  def floorRound(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + 0.5) / p
  }

  /** SQL-side mirror of [[floorRound]] for oracle strings. */
  def floorRoundSql(expr: String, scale: Int): String = {
    val p = BigDecimal(10).pow(scale).toBigInt
    s"floor(($expr) * $p + 0.5) / $p"
  }
}
