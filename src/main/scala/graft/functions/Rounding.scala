package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** THE portable rounding formula, shared: `floor(x·10^s + 0.5)/10^s`
  * is pure IEEE ops, so identical inputs give identical outputs in any
  * engine (Spark `round()` — BigDecimal HALF_UP on shortest-repr — and
  * DuckDB `round()` — scaled nearbyint — disagree one ulp from a .5
  * boundary). Every double-valued oracle compare uses this on BOTH
  * sides; operators must call these helpers rather than re-inlining
  * the formula so a precision-rule change has one home.
  */
object Rounding {

  /** Column form at 6 places (the operator-contribution scale). */
  def p6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Column form at an arbitrary scale. */
  def pround(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }

  /** Driver-side scalar form at 6 places (for operators that assemble
    * result rows on the driver — same bits as [[p6]]).
    */
  def p6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Driver-side scalar form at an arbitrary scale. */
  def proundD(x: Double, scale: Int): Double = {
    val f = math.pow(10, scale)
    math.floor(x * f + 0.5) / f
  }
}
