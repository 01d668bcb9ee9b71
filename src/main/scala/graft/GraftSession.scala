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

  /** Engine defaults shared by the local test sessions and the cluster
    * template — one source of truth so the tested config can't drift
    * from the documented deployment config. */
  val baseConf: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (64L << 20).toString,
    "spark.sql.files.maxPartitionBytes" -> (128L << 20).toString,
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer")

  /** Apply engine defaults to an arbitrary builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = {
    baseConf.foreach { case (k, v) => b.config(k, v) }
    b.config("spark.ui.enabled", "false")
  }

  /** Cluster-deployment template: the engine-relevant confs a real
    * 1000-executor run sets, with the reference's operating constants
    * (BASELINE.md) mapped onto their Spark equivalents. Returned as a
    * map so deploy tooling can merge it into spark-submit confs. */
  def clusterConfTemplate: Map[String, String] = baseConf ++ Map(
    // reference unpack batch cap 128 MB (aws_utils.py:27) is already the
    // baseConf scan split size; add the file-open amortization
    "spark.sql.files.openCostInBytes" -> (4L << 20).toString,
    // reference 50-connection S3 pool (aws_utils.py:11) → S3A pool, scaled per executor
    "spark.hadoop.fs.s3a.connection.maximum" -> "64",
    "spark.hadoop.fs.s3a.fast.upload" -> "true",
    // shuffle sized for wide clusters; AQE coalesces down at runtime
    "spark.sql.shuffle.partitions" -> "2000",
    "spark.sql.parquet.compression.codec" -> "zstd",
    "spark.sql.extensions" -> "graft.GraftExtensions")

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
