package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — multi-dimensional data skipping
  * from a one-dimensional sort, the lakehouse OPTIMIZE ZORDER BY
  * technique. Sorting (or range-partitioning) a write by the
  * interleaved key keeps parquet row-group min/max statistics tight on
  * BOTH source columns at once, so scans filtered on either column
  * prune row groups that a single-column sort could only prune for its
  * leading column. At 100 TB this is the difference between reading
  * one dimension's clustering and reading everything for the other
  * dimension's predicates.
  *
  * The key is pure integer bit surgery (shift/mask/or), bit i of `a`
  * to even position 2i and bit i of `b` to odd position 2i+1 — exact
  * on any engine, no hashing, order-embedding per 2-bit level.
  */
object ZOrder {

  /** 2-D Morton key over non-negative ints < 2^bits (bits <= 31, so
    * the interleave fits a BIGINT with room to spare).
    */
  def morton2(a: Column, b: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Inverse of `morton2`: (a, b) back out of a key — the property
    * tests' round-trip witness (and handy for debugging a layout).
    */
  def demorton2(key: Column, bits: Int = 31): (Column, Column) = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val a = (0 until bits).map { i =>
      shiftleft(shiftright(key, 2 * i).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)
    val b = (0 until bits).map { i =>
      shiftleft(shiftright(key, 2 * i + 1).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)
    (a, b)
  }
}
