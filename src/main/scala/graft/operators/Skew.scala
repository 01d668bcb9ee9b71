package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (SURVEY "optimize for scale": salting for
  * skew). AQE's skew-join handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even
  * split sub-partitions overwhelm a task, or when AQE is unavailable
  * (streaming joins).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key over
    * `nSalts` sub-keys and replicating the small side to every salt.
    * The salt is derived deterministically from the big side's row
    * content (xxhash64 of the key + a discriminator column) so replays
    * are stable. Result set is exactly the plain join's. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, nSalts: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(key), discriminator), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
