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
  * THE one Morton implementation in the engine: p14's 8-bit layout
  * (whose DuckDB oracle pins this exact arithmetic bit for bit via
  * its SQL twin) and p26's 16-bit time×entity layout both call these
  * helpers, and ZOrderSpec re-pins the fold against an independent
  * bit-by-bit reference — one curve convention (`a` → odd bit
  * positions, `b` → even), no second copy to drift.
  *
  * Everything here is static Column arithmetic (a fold of 2·width
  * shift/mask terms) — whole-stage-codegen'd, no UDF, no object
  * boundary. The z-value is a LAYOUT key only: callers sort by it and
  * drop it before writing, so floating-point rounding in the bucket
  * normalization can at worst misplace a row by one bucket — it can
  * never corrupt data (correctness is pinned by layout-independent
  * oracles; pruning effectiveness by ZOrderSpec's scan-metric pin). */
object ZOrder {

  /** The Morton code of two `width`-bit buckets: bit i of `a` lands at
    * position 2i+1, bit i of `b` at 2i (p14's convention — its oracle
    * SQL mirrors this exact placement). */
  def interleave(a: Column, b: Column, width: Int): Column =
    (0 until width).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** Order-preserving `bits`-bit bucket of `c` over the [lo, hi] range
    * (constants collected once at build time, metadata-scale). Double
    * math is fine here: the quotient is ≤ 2^bits − 1 and the key is
    * layout-only (see object scaladoc). */
  def bucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val top = (1L << bits) - 1
    val span = math.max(hi - lo, 1L)
    least(greatest(
      floor((c - lit(lo)).cast("double") * top.toDouble / span.toDouble).cast("long"),
      lit(0L)), lit(top))
  }

  /** 32-bit Morton code of two 16-bit buckets (p26's curve). */
  def zvalue16(a: Column, b: Column): Column = interleave(a, b, 16)

  /** 16-bit normalized bucket (p26's granularity). */
  def bucket16(c: Column, lo: Long, hi: Long): Column = bucket(c, lo, hi, 16)
}
