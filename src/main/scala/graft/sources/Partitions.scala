package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** P6 + S1 — partition-domain validation and Hive-layout helpers.
  *
  * The reference validates CLI args against declared domains before
  * building partition prefixes (decompression.py:24-26,64-67;
  * consts.py:1-5) — manual partition pruning. On Spark the layout is
  * `write.partitionBy(...)` and pruning is Catalyst's
  * PruneFileSourcePartitions; the domain check remains a driver-side
  * guard at job-entry.
  */
object Partitions {

  val Signals: Seq[String] = Seq("ACOUSTIC", "IMPACT", "TEMPERATURE", "VISUAL")
  val ReadingTypes: Seq[String] = Signals :+ "vehicleComponent"
  val Months: Seq[String] = (1 to 12).map(i => f"$i%02d")
  val Days: Seq[String] = (1 to 31).map(i => f"$i%02d")

  /** Driver-side domain guard (reference: validate_arg). */
  def validateArg(arg: String, valid: Seq[String]): Unit =
    require(valid.contains(arg), s"Invalid argument: $arg, must be one of $valid")

  /** Distributed twin of [[validateArg]]: a codegen'd membership
    * predicate for flagging/quarantining out-of-domain rows at scale —
    * data problems shouldn't fail the whole job the way a bad CLI arg
    * should. */
  def domainFlag(c: Column, valid: Seq[String]): Column =
    c.isin(valid: _*)

  /** Hive-style partitioned write; readers get partition pruning for
    * free when filtering on the partition columns. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      format: String = "parquet"): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).format(format).save(path)
}
