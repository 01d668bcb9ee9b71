package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data
  * clustering — the layout move that makes parquet row-group min/max
  * statistics prune on SEVERAL columns at once (Morton's 1966 curve;
  * the same construction the public lakehouse formats document as
  * their clustering primitive). A single-column sort lays rows on one
  * axis: range predicates on that column prune row groups, predicates
  * on every other column scan the full table. Sorting by the
  * interleaved z-value instead places rows that are close in BOTH
  * dimensions into the same row groups, so each row group covers a
  * small (a, b) rectangle of the key space and min/max pruning fires
  * for predicates on EITHER column — at 100 TB that is the difference
  * between "time-range queries are fast" and "time-range AND
  * entity-range queries are fast" on one copy of the data.
  *
  * Everything here is static Column arithmetic (a fold of 32
  * shift/mask terms) — whole-stage-codegen'd, no UDF, no object
  * boundary. The z-value is a LAYOUT key only: callers sort by it and
  * drop it before writing, so floating-point rounding in the bucket
  * normalization can at worst misplace a row by one bucket — it can
  * never corrupt data (correctness is pinned by a layout-independent
  * oracle; pruning effectiveness by ZOrderSpec's scan-metric pin). */
object ZOrder {

  /** Order-preserving 16-bit bucket of `c` over the [lo, hi] range
    * (constants collected once at build time, metadata-scale). Double
    * math is fine here: the quotient is ≤ 65535 and the key is
    * layout-only (see object scaladoc). */
  def bucket16(c: Column, lo: Long, hi: Long): Column = {
    val span = math.max(hi - lo, 1L)
    least(greatest(
      floor((c - lit(lo)).cast("double") * 65535.0 / span.toDouble).cast("long"),
      lit(0L)), lit(65535L))
  }

  /** The 32-bit Morton code of two 16-bit buckets: bit i of `a` lands
    * at position 2i, bit i of `b` at 2i+1. */
  def zvalue16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
}
