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

  /** Cluster-deployment template: the engine-relevant confs a real
    * 1000-executor run sets, with the reference's operating constants
    * (BASELINE.md) mapped onto their Spark equivalents. Returned as a
    * map so deploy tooling can merge it into spark-submit confs. */
  def clusterConfTemplate: Map[String, String] = Map(
    // reference unpack batch cap 128 MB (aws_utils.py:27) → scan split size
    "spark.sql.files.maxPartitionBytes" -> (128L << 20).toString,
    "spark.sql.files.openCostInBytes" -> (4L << 20).toString,
    // reference 50-connection S3 pool (aws_utils.py:11) → S3A pool, scaled per executor
    "spark.hadoop.fs.s3a.connection.maximum" -> "64",
    "spark.hadoop.fs.s3a.fast.upload" -> "true",
    // shuffle sized for wide clusters; AQE coalesces down at runtime
    "spark.sql.shuffle.partitions" -> "2000",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (64L << 20).toString,
    "spark.sql.parquet.compression.codec" -> "zstd",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.extensions" -> "graft.GraftExtensions",
    "spark.sql.session.timeZone" -> "UTC")

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
