package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, as codegen'd
  * higher-order functions (SURVEY §7.6).
  *
  * All folds are strictly sequential left-to-right in element order and
  * every operand is cast to double first, so results are bitwise
  * IEEE-754-identical to the DuckDB oracle's `list_reduce` twin — which
  * makes similarity *rankings* (not just values) engine-stable.
  */
object Vectors {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.Bridge.column(e)
  private def expr0(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)

  /** Σ aᵢ·bᵢ (double fold in element order) — native codegen'd
    * [[graft.expressions.FloatDot]]; `dotHof` below is the parity pin. */
  def dot(a: Column, b: Column): Column =
    bridge(graft.expressions.FloatDot(expr0(a), expr0(b)))

  /** Σ aᵢ² (x·x per element then fold — same ops as the HOF form). */
  def normSq(a: Column): Column =
    bridge(graft.expressions.FloatDot(expr0(a), expr0(a)))

  /** Reference HOF formulations — test-only parity pins. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  private[graft] def normSqHof(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0d), (acc, v) => acc + v)

  /** cos(a,b) = dot / (√‖a‖² · √‖b‖²) — exact operand order matters for
    * cross-engine determinism; keep in sync with Sql.cosine. */
  def cosine(a: Column, b: Column, aNormSq: Column, bNormSq: Column): Column =
    dot(a, b) / (sqrt(aNormSq) * sqrt(bNormSq))

  /** Random-hyperplane LSH bucket id over `nPlanes` deterministic
    * pseudo-random ±1 planes: plane j's weight for dimension i is
    * +1 when bit 6 of (i·73856093 XOR j·19349663) is 0, else −1.
    * Bucket = Σ_j [sign_j ≥ 0] · 2^j — the scale path for ANN: candidates
    * collapse from |corpus| to one bucket's occupancy.
    *
    * Delegates to the native codegen'd
    * [[graft.expressions.HyperplaneBits]] (the HOF form below is kept
    * for the bit-parity test — interpreted lambdas made it the top
    * cost of d08 at sf0.1). */
  def lshBucket(v: Column, nPlanes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.HyperplaneBits(
        org.apache.spark.sql.graft.Bridge.expression(v), nPlanes))

  /** Reference HOF formulation of [[lshBucket]] — test-only parity pin. */
  private[graft] def lshBucketHof(v: Column, nPlanes: Int): Column = {
    val planeBits = transform(sequence(lit(0), lit(nPlanes - 1)), j => {
      val planeSum = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => {
          val w = when(shiftright((i * 73856093L).bitwiseXOR(j * 19349663L), 6)
              .bitwiseAND(1) === 0, lit(1.0d))
            .otherwise(lit(-1.0d))
          x.cast("double") * w
        }),
        lit(0d), (acc, p) => acc + p)
      when(planeSum >= 0, pow(lit(2), j).cast("long")).otherwise(lit(0L))
    })
    aggregate(planeBits, lit(0L), (acc, b) => acc + b)
  }
}
