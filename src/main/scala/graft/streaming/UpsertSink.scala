package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** foreachBatch keyed-upsert sink: merges each micro-batch's per-key
  * increments into a parquet state table, idempotently per batch id.
  *
  * This is the pattern that turns Structured Streaming's at-least-once
  * batch replay into exactly-once STATE: the checkpoint may re-deliver
  * a batch after a crash, so the merge consults its commit evidence
  * and skips batches it has already applied.
  *
  * Crash safety is VERSIONED, never in-place: each applied batch B
  * writes a complete new state snapshot `v<B>` beside the live ones,
  * and "which state is live" is resolved as the highest-numbered
  * COMPLETE snapshot (one whose parquet `_SUCCESS` commit marker
  * exists — a crashed write never leaves one). There is no pointer
  * file to swap and therefore no swap window: a snapshot only becomes
  * resolvable at the instant its `_SUCCESS` lands, which the committer
  * creates after every data file is in place. The invariants:
  *
  *   - a complete `v<B>` contains every committed batch ≤ B exactly
  *     once (it was derived from the previous live snapshot, whose id
  *     is < B, plus B's increments);
  *   - a replay of batch B with live version ≥ B is therefore a
  *     no-op — the evidence that B is committed IS the snapshot id;
  *   - a crash before `v<B>` completes leaves the previous snapshot
  *     live and the replay re-derives `v<B>` from it.
  *
  * The `committed/<B>` ledger markers are retained as a fast-path
  * check and an audit trail, but correctness never depends on the
  * marker landing: the marker and the snapshot can disagree only in
  * the direction the snapshot-id rule already absorbs. Old snapshots
  * are pruned after each merge (the previous one is kept, so a
  * concurrent reader mid-scan of the prior version never loses its
  * files). A real deployment puts a transactional table format under
  * the same `merge` call — the batching, ledger, and join logic are
  * the part a format swap does not change. State size is one row per
  * distinct key — dimension-scale, not stream-scale.
  */
object UpsertSink {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Batch ids of complete state snapshots, newest first. A snapshot
    * is complete iff the committer's `_SUCCESS` marker exists. */
  private def completeVersions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val hfs = fs(spark, stateDir)
    val root = new Path(stateDir)
    if (!hfs.exists(root)) return Seq.empty
    hfs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption)
      .filter(b => hfs.exists(new Path(s"$stateDir/v$b/_SUCCESS")))
      .sorted(Ordering[Long].reverse)
  }

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sv",
          org.apache.spark.sql.types.DataTypes.createDecimalType(28, 4)))))

  /** Current state (empty frame with the right schema if none yet). */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    completeVersions(spark, stateDir).headOption match {
      case Some(b) => spark.read.parquet(s"$stateDir/v$b")
      case None => emptyState(spark)
    }

  /** Merge one batch of `(key, n, sv)` increments. Returns true if the
    * batch was applied, false if it was already committed (replay). */
  def merge(spark: SparkSession, stateDir: String,
      increments: DataFrame, batchId: Long): Boolean = {
    val hfs = fs(spark, stateDir)
    val marker = new Path(s"$stateDir/committed/$batchId")
    if (hfs.exists(marker)) return false
    val live = completeVersions(spark, stateDir).headOption
    if (live.exists(_ >= batchId)) {
      // the snapshot for this (or a later) batch already completed —
      // the crash hit between snapshot and marker; record and skip
      hfs.mkdirs(marker.getParent)
      hfs.createNewFile(marker)
      return false
    }
    val cur = live.map(b => spark.read.parquet(s"$stateDir/v$b"))
      .getOrElse(emptyState(spark))
    val inc = increments.toDF("key", "n", "sv")
    val merged = cur.withColumnRenamed("n", "n0").withColumnRenamed("sv", "sv0")
      .join(inc, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n"), lit(0L))).as("n"),
        (coalesce(col("sv0"), lit(BigDecimal(0)).cast("decimal(28,4)")) +
          coalesce(col("sv"), lit(BigDecimal(0)).cast("decimal(28,4)")))
          .cast("decimal(28,4)").as("sv"))
    // the new snapshot becomes live atomically when its _SUCCESS lands
    merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
    hfs.mkdirs(marker.getParent)
    hfs.createNewFile(marker)
    // prune all but the new snapshot and its predecessor
    completeVersions(spark, stateDir).drop(2)
      .foreach(b => hfs.delete(new Path(s"$stateDir/v$b"), true))
    true
  }
}
