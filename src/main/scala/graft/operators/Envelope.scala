package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** E1/E2/K1 — the NDJSON envelope: each extracted XML payload is wrapped
  * as {"payload": ..., "tenant_id": "bhp", "partition_id": <type>} and
  * serialized one-object-per-line (reference: decompression.py:40-44).
  *
  * `to_json(struct(...))` is codegen'd; the sink is a plain text write,
  * so the whole stage is narrow. Hive-style partition layout comes from
  * `write.partitionBy` at the call site (SURVEY §1.4).
  */
object Envelope {
  val TenantId = "bhp"

  val schema: StructType = StructType(Seq(
    StructField("payload", StringType, nullable = true),
    StructField("tenant_id", StringType, nullable = true),
    StructField("partition_id", StringType, nullable = true)))

  /** Wrap payloads into the JSON envelope (adds `envelope` column). */
  def wrap(df: DataFrame, payloadCol: Column, partitionIdCol: Column): DataFrame =
    df.withColumn("envelope", to_json(struct(
      payloadCol.as("payload"),
      lit(TenantId).as("tenant_id"),
      partitionIdCol.as("partition_id"))))

  /** Parse envelopes back into (payload, tenant_id, partition_id). */
  def parse(df: DataFrame, jsonCol: Column, keep: Seq[Column] = Nil): DataFrame =
    df.select(keep :+ from_json(jsonCol, schema).as("_env"): _*)
      .select(keep :+ col("_env.*"): _*)

  /** NDJSON text sink for the envelope column (K1). */
  def writeNdjson(df: DataFrame, envelopeCol: String, path: String): Unit =
    df.select(col(envelopeCol)).write.mode("overwrite").text(path)
}
