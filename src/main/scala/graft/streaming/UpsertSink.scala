package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** foreachBatch keyed-upsert sink: merges each micro-batch's per-key
  * increments into a parquet state table, idempotently per batch id.
  *
  * This is the pattern that turns Structured Streaming's at-least-once
  * batch replay into exactly-once STATE: the checkpoint may re-deliver
  * a batch after a crash, so the merge first consults a committed-batch
  * ledger and skips ids it has already applied. Ledger markers are
  * written AFTER the state swap — a crash between the two replays the
  * batch, which the idempotence check then absorbs.
  *
  * The state table here is plain parquet swapped via an atomic rename
  * (new version written beside, then the `current` pointer directory
  * replaced); a real deployment puts a transactional table format
  * under the same `merge` call — the batching, ledger, and join logic
  * are the part a format swap does not change. State size is one row
  * per distinct key — dimension-scale, not stream-scale.
  */
object UpsertSink {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Current state (empty frame with the right schema if none yet). */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    val cur = new org.apache.hadoop.fs.Path(s"$stateDir/current")
    if (fs(spark, stateDir).exists(cur))
      spark.read.parquet(cur.toString)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sv",
            org.apache.spark.sql.types.DataTypes.createDecimalType(28, 4)))))
  }

  /** Merge one batch of `(key, n, sv)` increments. Returns true if the
    * batch was applied, false if its id was already committed (replay). */
  def merge(spark: SparkSession, stateDir: String,
      increments: DataFrame, batchId: Long): Boolean = {
    val hfs = fs(spark, stateDir)
    val marker = new org.apache.hadoop.fs.Path(s"$stateDir/committed/$batchId")
    if (hfs.exists(marker)) return false
    val cur = readState(spark, stateDir)
    val inc = increments.toDF("key", "n", "sv")
    val merged = cur.withColumnRenamed("n", "n0").withColumnRenamed("sv", "sv0")
      .join(inc, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n"), lit(0L))).as("n"),
        (coalesce(col("sv0"), lit(BigDecimal(0)).cast("decimal(28,4)")) +
          coalesce(col("sv"), lit(BigDecimal(0)).cast("decimal(28,4)")))
          .cast("decimal(28,4)").as("sv"))
    // write the new version beside the live one, then swap the pointer:
    // readers never observe a half-written state
    val next = new org.apache.hadoop.fs.Path(s"$stateDir/v$batchId")
    merged.write.mode("overwrite").parquet(next.toString)
    val curPath = new org.apache.hadoop.fs.Path(s"$stateDir/current")
    if (hfs.exists(curPath)) hfs.delete(curPath, true)
    require(hfs.rename(next, curPath), s"state swap failed for batch $batchId")
    hfs.mkdirs(marker.getParent)
    hfs.createNewFile(marker)
    true
  }
}
