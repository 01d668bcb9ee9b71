package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 32 shuffle partitions, AQE on); on a real cluster the same settings
  * scale out because nothing here hard-codes a partition count into the
  * plans — shuffle parallelism is a config, skew handling is delegated
  * to AQE, and small-dimension joins are explicitly broadcast.
  */
object GraftSession {

  /** Apply engine defaults to an arbitrary builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    .config("spark.ui.enabled", "false")

  /** Local session for tests / benches. */
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
