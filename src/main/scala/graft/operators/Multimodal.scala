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
      // declared_len is the BYTE length of the payload (octet
      // semantics) — a char count would understate multi-byte content
      struct(kindCol.as("kind"),
        length(contentCol.cast("binary")).as("declared_len")).as("meta"))

  final case class MediaFeatures(media_id: Long, byte_len: Int, first_cp: Int,
      checksum: Long)

  object FeatureExtractor {
    val P = 1000000007L

    /** Deterministic stand-in for a media decoder: byte length, first
      * Unicode code point, and a polynomial checksum over code points
      * (engine-stable vs the SQL oracle's unicode()/charwise fold even
      * for non-ASCII payloads). A real image/audio extractor replaces
      * this function only. */
    def decodeStub(id: Long, payload: Array[Byte]): MediaFeatures = {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % P
        i += Character.charCount(cp)
      }
      MediaFeatures(id, payload.length,
        if (s.isEmpty) -1 else s.codePointAt(0), h)
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

  final case class ResizedMedia(media_id: Long, orig_len: Long, resized_len: Long,
      checksum: Long)

  /** Resize — the image path's downsample op as a stub "codec": keep
    * every `stride`-th code point of the decoded payload (a real
    * resizer replaces the sampling kernel only; the 1:1-row shape,
    * binary-in → features-out contract, and narrow no-shuffle stage
    * are the part that matters at scale). */
  def resize(df: DataFrame, stride: Int): Dataset[ResizedMedia] = {
    require(stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val s = new String(r.getAs[Array[Byte]](payloadIdx),
          java.nio.charset.StandardCharsets.UTF_8)
        val sb = new java.lang.StringBuilder
        var i = 0
        var cp = 0
        while (i < s.length) {
          val c = s.codePointAt(i)
          if (cp % stride == 0) sb.appendCodePoint(c)
          cp += 1
          i += Character.charCount(c)
        }
        val resized = sb.toString
        ResizedMedia(r.getLong(idIdx), cp.toLong,
          resized.codePointCount(0, resized.length).toLong,
          graft.expressions.PolyHash.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(resized)))
      }
    }
  }

  final case class FrameFeatures(media_id: Long, n_frames: Long, frame_idx: Long,
      checksum: Long)

  /** Frame sampling — the video path's 1-payload → N-sampled-frames
    * op. The stub "codec" treats the decoded payload as fixed-size
    * code-point frames (`frameCp` each); a real video decoder replaces
    * only the slicing. Stride sampling capped at `maxFrames` keeps
    * output rows linear in media COUNT, not media LENGTH — the shape
    * that matters when one corrupt 10-hour file would otherwise emit
    * millions of rows. Narrow flatMap: no shuffle, no driver data. */
  def sampleFrames(df: DataFrame, frameCp: Int, stride: Int,
      maxFrames: Int): Dataset[FrameFeatures] = {
    require(frameCp > 0 && stride > 0 && maxFrames > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val s = new String(r.getAs[Array[Byte]](payloadIdx),
          java.nio.charset.StandardCharsets.UTF_8)
        // code-point slicing (not UTF-16 units) so frame boundaries
        // match character-addressed decoders and the SQL oracle
        val totalCp = s.codePointCount(0, s.length)
        val nFrames = (totalCp.toLong + frameCp - 1) / frameCp
        Iterator.range(0L, nFrames, stride.toLong).take(maxFrames).map { k =>
          val fromCp = (k * frameCp).toInt
          val a = s.offsetByCodePoints(0, fromCp)
          val b = s.offsetByCodePoints(0, math.min(fromCp + frameCp, totalCp))
          val checksum = graft.expressions.PolyHash.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(s.substring(a, b)))
          FrameFeatures(id, nFrames, k, checksum)
        }
      }
    }
  }
}
