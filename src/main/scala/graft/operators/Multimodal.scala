package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.6 / driver mandate): media
  * payloads travel as opaque `binary` columns with typed metadata;
  * decode / feature-extract runs as a *batched* per-partition stage —
  * the Scala analogue of `mapInPandas` (iterator-of-batches in, typed
  * rows out), so a real decoder drops in without touching the plumbing.
  *
  * The actual media decode is STUBBED (this container has no image /
  * audio codecs): [[FeatureExtractor.decodeStub]] derives deterministic
  * features from the raw bytes. The Spark-side contract — schema,
  * batching, partitioning, null handling — is real and tested.
  */
object Multimodal {

  /** Wrap a string column as a media payload: binary bytes + metadata
    * struct. Real pipelines read `binaryFile` sources into this shape. */
  def asPayload(df: DataFrame, idCol: Column, contentCol: Column,
      kindCol: Column): DataFrame =
    df.select(idCol.as("media_id"),
      contentCol.cast("binary").as("payload"),
      struct(kindCol.as("kind"), length(contentCol).as("declared_len")).as("meta"))

  final case class MediaFeatures(media_id: Long, byte_len: Int, first_byte: Int,
      checksum: Long)

  object FeatureExtractor {
    val P = 1000000007L

    /** Deterministic stand-in for a media decoder: byte length, first
      * byte, and a polynomial checksum over bytes. A real image/audio
      * extractor replaces this function only. */
    def decodeStub(id: Long, payload: Array[Byte]): MediaFeatures = {
      var h = 0L
      var i = 0
      while (i < payload.length) {
        h = (h * 31 + (payload(i) & 0xff)) % P
        i += 1
      }
      MediaFeatures(id, payload.length, if (payload.isEmpty) -1 else payload(0) & 0xff, h)
    }
  }

  /** Batched feature extraction over the payload column; one decoder
    * instance per partition, streaming through the iterator (no
    * per-row setup cost — the mapInPandas batch shape). */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here (model load, codec init)
      rows.map { r =>
        FeatureExtractor.decodeStub(r.getLong(idIdx), r.getAs[Array[Byte]](payloadIdx))
      }
    }
  }
}
