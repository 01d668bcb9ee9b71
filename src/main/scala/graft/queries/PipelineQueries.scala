package graft.queries

import java.nio.file.Paths
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.sinks.CsvSink
import graft.sources.Partitions

/** Pipeline-shape queries: Hive-partitioned layout + pruned reads (S1),
  * the quote-all CSV sink/source roundtrip (K2/S6), and event
  * sessionization (the batch form of stateful stream processing). */
object PipelineQueries {

  /** Shared temp-staging convention (also used by PlanAuditSpec — keep
    * in one place so the pruning pin can't drift from the writer). */
  def staging(tag: String, dir: String): String =
    Paths.get(sys.props("java.io.tmpdir"), s"graft_${tag}_${math.abs(dir.hashCode)}").toString

  /** p01 — S1/K5: write events Hive-partitioned by (event_type, day),
    * read back with partition filters (Catalyst prunes to 2 of ~180
    * directories — PlanAuditSpec pins that), aggregate per day. */
  def p01PartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val path = staging("p01", dir)
    val ev = Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      // co-locate rows with their target partition: one file per Hive
      // dir instead of (shuffle partitions × dirs) small files
      .repartition(col("event_type"), col("day"))
    Partitions.writePartitioned(ev, path, Seq("event_type", "day"))
    spark.read.parquet(path)
      .filter(col("event_type") === "click" &&
        col("day").cast("string").isin("2024-01-01", "2024-01-02"))
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"))
  }

  /** p02 — K2/S6: quote-all CSV sink with row-count-in-name, read back
    * through the all-strings CSV source (the reference's "everything is
    * a nullable string" model), typed projection at the end. */
  def p02CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = staging("p02", dir)
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
    val target = CsvSink.write(part, path, rowCountInName = true, namePrefix = "part")
    CsvSink.read(spark, target)
      .select(col("p_partkey").cast("long").as("p_partkey"),
        col("p_name"),
        col("p_size").as("p_size_str"),
        col("p_retailprice").as("p_retailprice_str"))
      .orderBy(col("p_partkey"))
  }

  /** q21 — sessionization (30-min gap) via window functions: the batch
    * twin of flatMapGroupsWithState sessionization. */
  def q21Sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir))

  /** Core sessionization over any (user_id, ts, event_id) frame —
    * split out so the sub-second gap boundary is unit-testable. */
  def sessionize(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // Gap math in MICROSECONDS on both sides (oracle: epoch_us). The
    // earlier unix_timestamp form floored to whole seconds, so a true gap
    // in (1800 s, 1801 s) could split sessions differently than the
    // fractional-epoch oracle — compare at full precision instead.
    val flagged = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 0)
          .when(unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg((max(col("session_id")) + 1).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_partition_prune" -> p01PartitionPrune _,
    "p02_csv_roundtrip"   -> p02CsvRoundtrip _,
    "q21_sessionize"      -> q21Sessionize _,
  )

  val oracleSql: Map[String, String] = Map(
    "p01_partition_prune" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE event_type = 'click' AND strftime(ts, '%Y-%m-%d') IN ('2024-01-01', '2024-01-02')
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "p02_csv_roundtrip" ->
      """SELECT p_partkey, p_name,
        |  CAST(p_size AS VARCHAR) AS p_size_str,
        |  CAST(p_retailprice AS VARCHAR) AS p_retailprice_str
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q21_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 0
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged),
        |counts AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
        |  MAX(n_events) AS max_session_events
        |FROM counts GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
