package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.6 / driver mandate): media
  * payloads travel as opaque `binary` columns with typed metadata;
  * decode / feature-extract runs as a *batched* per-partition stage —
  * the Scala analogue of `mapInPandas` (iterator-of-batches in, typed
  * rows out), so a real decoder drops in without touching the plumbing.
  *
  * The image path is REAL end to end: [[decodeDownsample2x]] (2:1 box
  * filter), [[decodeResizeNearest]] (stride sampling), and
  * [[FeatureExtractor.imageFeatures]] (feature extraction) all decode
  * `image/…` payloads with the JDK's built-in `javax.imageio.ImageIO`
  * codec (no external dependency) and run genuine pixel kernels. The
  * audio path is REAL at the wire level: [[frameEnergy]] parses raw
  * little-endian int16 PCM — the post-codec format — with
  * two's-complement byte math; [[frameDiff]] walks raw video frames
  * the same way. The EXACT codec boundary: the JDK ships no decoder
  * for compressed audio/video containers (MP3, MP4/H.264, Ogg), so
  * those kinds traverse [[FeatureExtractor.textFeatures]] as opaque
  * bytes and [[sampleFrames]]'s code-point frame slicing until an
  * external codec feeds the real post-codec paths — the Spark-side
  * contract (schema, batching, partitioning, null handling) is real
  * and tested, so a codec drops in by replacing one function.
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

  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
      feat: Int, checksum: Long)

  object FeatureExtractor {
    val P = 1000000007L

    /** Text/opaque features: byte length, first Unicode code point in
      * `feat`, and a polynomial checksum over code points
      * (engine-stable vs the SQL oracle's unicode()/charwise fold even
      * for non-ASCII payloads). This is also the documented CODEC
      * BOUNDARY: compressed audio/video containers (MP3, MP4/H.264,
      * Ogg…) have no JDK decoder, so those kinds pass through here as
      * opaque bytes until an external codec feeds the real post-codec
      * paths ([[frameEnergy]] for PCM, [[frameDiff]] for raw frames). */
    def textFeatures(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % P
        i += Character.charCount(cp)
      }
      MediaFeatures(id, kind, payload.length,
        if (s.isEmpty) -1 else s.codePointAt(0), h)
    }

    /** REAL image features — `ImageIO.read` (the JDK's zero-dependency
      * PNG/BMP/GIF/JPEG codecs): `byte_len` is the DECODED RGB byte
      * count (w·h·3 — the post-codec size; the container byte count is
      * encoder-version-dependent and therefore not oracle-checkable),
      * `feat` packs (width << 16) | height, and the checksum folds the
      * decoded pixel channels in (y, x, R-G-B) order — the same walk
      * m03/m04 verify arithmetically against the synthesis formula.
      * Undecodable payloads fail loudly. */
    def imageFeatures(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"media $id: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      var hsh = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          var c = 0
          while (c < 3) {
            hsh = (hsh * 31 + ((rgb >> (16 - 8 * c)) & 0xFF)) % P
            c += 1
          }
          x += 1
        }
        y += 1
      }
      MediaFeatures(id, kind, w * h * 3, (w << 16) | h, hsh)
    }
  }

  /** Batched feature extraction over the payload column, dispatched on
    * `meta.kind`: `image/…` runs the REAL ImageIO decoder
    * ([[FeatureExtractor.imageFeatures]]); everything else takes the
    * code-point path ([[FeatureExtractor.textFeatures]] — also the
    * documented boundary for containers the JDK cannot decode). One
    * decoder instance per partition, streaming through the iterator
    * (no per-row setup cost — the mapInPandas batch shape). */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here (model load, codec init)
      rows.map { r =>
        val kind = r.getStruct(metaIdx).getAs[String]("kind")
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (kind != null && kind.startsWith("image/"))
          FeatureExtractor.imageFeatures(id, kind, payload)
        else FeatureExtractor.textFeatures(id, kind, payload)
      }
    }
  }

  final case class ResizedImage(media_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, checksum: Long)

  /** REAL image resize (nearest-neighbor): `ImageIO.read` each binary
    * payload and keep every `stride`-th pixel in both axes — the
    * sampling kernel a thumbnail/tiling stage uses when a box filter's
    * smoothing is unwanted — then checksum the sampled pixels in
    * (y, x, R-G-B) order. Pixel selection is pure integer indexing, so
    * a codec-less SQL oracle verifies the decode+sample path exactly
    * (same trick as [[decodeDownsample2x]], different kernel). Narrow
    * 1:1 mapPartitions stage: decode cost only, no shuffle. Undecodable
    * payloads fail loudly. */
  def decodeResizeNearest(df: DataFrame, stride: Int): Dataset[ResizedImage] = {
    require(stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payloadIdx)))
        require(img != null, s"media $id: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        val ow = (w + stride - 1) / stride
        val oh = (h + stride - 1) / stride
        var hsh = 0L
        var my = 0
        while (my < oh) {
          var mx = 0
          while (mx < ow) {
            val rgb = img.getRGB(mx * stride, my * stride)
            var c = 0
            while (c < 3) {
              hsh = (hsh * 31 + ((rgb >> (16 - 8 * c)) & 0xFF)) % FeatureExtractor.P
              c += 1
            }
            mx += 1
          }
          my += 1
        }
        ResizedImage(id, w, h, ow, oh, hsh)
      }
    }
  }

  /** Deterministic synthetic RGB image, PNG-encoded with the real JDK
    * codec: channel `c ∈ {0=R,1=G,2=B}` of pixel `(x, y)` is
    * `(id·7 + (y·w + x)·3 + c) mod 256`. PNG is lossless for 8-bit
    * RGB, so a decoder must recover these exact values — which is what
    * lets a SQL oracle with no image codec verify a real codec
    * roundtrip arithmetically. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = id * 7 + (y.toLong * w + x) * 3
        val r = (base % 256).toInt
        val g = ((base + 1) % 256).toInt
        val b = ((base + 2) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, checksum: Long)

  /** REAL image decode + resize (no stub): `ImageIO.read` each binary
    * payload, 2:1 box-filter downsample (integer mean of each 2×2
    * block per channel — floor division, exact in any engine), then a
    * polynomial checksum over the downsampled pixels in (y, x,
    * R-G-B) order. Narrow 1:1 mapPartitions stage: decode cost is the
    * only cost, no shuffle, scales with executor count. Undecodable
    * payloads fail loudly (a silent skip would corrupt downstream
    * training-set statistics). */
  def decodeDownsample2x(df: DataFrame): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payloadIdx)))
        require(img != null, s"media $id: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        val ow = w / 2
        val oh = h / 2
        var hsh = 0L
        var my = 0
        while (my < oh) {
          var mx = 0
          while (mx < ow) {
            var c = 0
            while (c < 3) {
              val shift = 16 - 8 * c
              @inline def ch(px: Int, py: Int): Int = (img.getRGB(px, py) >> shift) & 0xFF
              val v = (ch(2 * mx, 2 * my) + ch(2 * mx + 1, 2 * my) +
                ch(2 * mx, 2 * my + 1) + ch(2 * mx + 1, 2 * my + 1)) / 4
              hsh = (hsh * 31 + v) % FeatureExtractor.P
              c += 1
            }
            mx += 1
          }
          my += 1
        }
        DecodedImage(id, w, h, ow, oh, hsh)
      }
    }
  }

  /** Deterministic synthetic raw PCM clip: little-endian signed 16-bit
    * samples, `v_i = ((id·31 + i·7) mod 4096) − 2048`, with every third
    * `frame`-sample window muted to zero (so silence detection has
    * real positives). Raw PCM IS the post-codec wire format — a real
    * audio decoder (which the JDK does not ship) would produce exactly
    * this array shape, so the byte-level decode below stays unchanged
    * when one drops in. */
  def synthPcm(id: Long, nSamples: Int, frame: Int): Array[Byte] = {
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val silent = (i / frame) % 3 == 2
      val v = if (silent) 0 else (((id * 31 + i.toLong * 7) % 4096) - 2048).toInt
      out(2 * i) = (v & 0xFF).toByte
      out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  final case class AudioFrame(media_id: Long, frame_idx: Long, energy: Long,
      is_silence: Boolean)

  /** REAL PCM frame-energy extraction: parse little-endian int16
    * samples out of the binary payload (two's-complement byte math, no
    * stub), window into `frame`-sample frames, and emit the exact
    * integer energy `Σ v²` per frame plus a silence verdict — the VAD
    * front end of an audio training pipeline. Narrow 1→N flatMap with
    * output linear in clip count × frames-per-clip; no shuffle. */
  def frameEnergy(df: DataFrame, frame: Int): Dataset[AudioFrame] = {
    require(frame > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        require(bytes.length % 2 == 0, s"media $id: odd PCM byte length")
        val n = bytes.length / 2
        Iterator.range(0, n / frame).map { f =>
          var e = 0L
          var i = f * frame
          val end = math.min((f + 1) * frame, n)
          while (i < end) {
            // little-endian int16: sign-extended high byte | unsigned low
            val v = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
            e += v.toLong * v
            i += 1
          }
          AudioFrame(id, f.toLong, e, e == 0L)
        }
      }
    }
  }

  final case class ResampledAudio(media_id: Long, n_in: Long, n_out: Long,
      energy: Long, checksum: Long)

  /** PCM decimation — the audio twin of [[decodeResizeNearest]]'s
    * nearest-neighbor sampling: keep every `factor`-th little-endian
    * int16 sample (naive stride decimation; a production resampler
    * prepends an anti-aliasing FIR — a documented refinement that only
    * changes the per-sample kernel, not this plumbing). Emits per clip
    * the in/out sample counts, the decimated signal's exact integer
    * energy Σv², and a position-weighted checksum Σ(j+1)·v_j — order-
    * sensitive, so a single swapped or dropped sample anywhere breaks
    * the gate. Narrow 1:1 mapPartitions, no shuffle, linear in clip
    * count. */
  def decimatePcm(df: DataFrame, factor: Int): Dataset[ResampledAudio] = {
    require(factor > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        require(bytes.length % 2 == 0, s"media $id: odd PCM byte length")
        val n = bytes.length / 2
        var i = 0
        var j = 0L
        var energy = 0L
        var checksum = 0L
        while (i < n) {
          if (i % factor == 0) {
            val v = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)).toLong
            energy += v * v
            j += 1
            checksum += j * v
          }
          i += 1
        }
        ResampledAudio(id, n.toLong, j, energy, checksum)
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

  /** Deterministic synthetic raw video clip: `nFrames` frames of
    * `frameBytes` bytes each, concatenated. Byte `i` of frame `f` is
    * `(id·13 + f·3 + i·7) mod 256` — a small per-frame drift (+3 per
    * byte, modular wrap rare), the within-scene case — except every
    * 4th frame starts a new "scene" with the independent formula
    * `(id·17 + f·53 + i·11) mod 256`, so both the frame ENTERING a
    * scene and the first frame AFTER it diff like uncorrelated bytes
    * (mean |Δ| ≈ 85/byte) while drift frames score ≈ 6/byte — real
    * positives AND negatives for the detector. Raw frame planes ARE
    * the post-codec wire format — a real video decoder produces
    * exactly this array shape. */
  def synthVideo(id: Long, nFrames: Int, frameBytes: Int): Array[Byte] = {
    val out = new Array[Byte](nFrames * frameBytes)
    var f = 0
    while (f < nFrames) {
      var i = 0
      while (i < frameBytes) {
        val v =
          if (f % 4 == 0) (id * 17 + f.toLong * 53 + i.toLong * 11) % 256
          else (id * 13 + f.toLong * 3 + i.toLong * 7) % 256
        out(f * frameBytes + i) = v.toByte
        i += 1
      }
      f += 1
    }
    out
  }

  final case class KeyFrame(media_id: Long, frame_idx: Long, diff: Long,
      is_keyframe: Boolean)

  /** REAL frame differencing — the keyframe/scene-cut detector at the
    * front of a video training pipeline: parse the payload into
    * `frameBytes`-byte frames, score each frame `f ≥ 1` with the exact
    * integer sum of absolute byte differences vs frame `f−1`, and flag
    * it a keyframe when the diff exceeds `threshold` (scene cuts score
    * ~85·len on random-vs-random bytes; within-scene drift scores far
    * lower). Narrow 1→(nFrames−1) flatMap, zero shuffle, linear in
    * clip count — and the DuckDB oracle (no video stack) recomputes
    * every diff arithmetically from the synthesis formulas, proving
    * the byte-level frame walk end to end. */
  def frameDiff(df: DataFrame, frameBytes: Int, threshold: Long): Dataset[KeyFrame] = {
    require(frameBytes > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        require(bytes.length % frameBytes == 0,
          s"media $id: payload is not whole frames")
        val n = bytes.length / frameBytes
        Iterator.range(1, n).map { f =>
          var d = 0L
          var i = 0
          while (i < frameBytes) {
            d += math.abs((bytes(f * frameBytes + i) & 0xFF) -
              (bytes((f - 1) * frameBytes + i) & 0xFF))
            i += 1
          }
          KeyFrame(id, f.toLong, d, d > threshold)
        }
      }
    }
  }

  final case class ImageHash(media_id: Long, width: Int, height: Int,
      hash_hi: Long, hash_lo: Long)

  /** REAL perceptual hash (aHash, the mean-threshold member of the
    * pHash family): `ImageIO.read` each payload, integer grayscale
    * `(r+g+b)/3` per pixel, box-mean downsample to an 8×8 block grid
    * (floor division — exact in any engine), threshold each block at
    * the floor-mean of the 64 blocks, and pack the 64 bits MSB-first
    * in (row, col) order. The hash is carried as TWO 32-bit halves
    * (`hash_hi` = blocks 0–31, `hash_lo` = blocks 32–63) in
    * non-negative longs: a single 64-bit word would put bit 0 in the
    * sign position, where cross-engine shift semantics and DuckDB's
    * checked arithmetic both bite; two unsigned halves keep every
    * downstream operation (band split by div/mod, xor, popcount) in
    * the engines' common, overflow-free integer algebra. Every step
    * is integer, so the oracle recomputes the hash arithmetically
    * from the synthesis formula — m04's codec-proof trick. Narrow 1:1
    * mapPartitions stage; decode is the only cost. */
  def aHash8(df: DataFrame): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payloadIdx)))
        require(img != null, s"media $id: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        require(w % 8 == 0 && h % 8 == 0,
          s"media $id: ${w}x$h does not tile into an 8x8 block grid")
        val bw = w / 8
        val bh = h / 8
        val blocks = new Array[Long](64)
        var my = 0
        while (my < 8) {
          var mx = 0
          while (mx < 8) {
            var s = 0L
            var y = my * bh
            while (y < (my + 1) * bh) {
              var x = mx * bw
              while (x < (mx + 1) * bw) {
                val rgb = img.getRGB(x, y)
                s += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
                x += 1
              }
              y += 1
            }
            blocks(my * 8 + mx) = s / (bw * bh)
            mx += 1
          }
          my += 1
        }
        var sum = 0L
        var i = 0
        while (i < 64) { sum += blocks(i); i += 1 }
        val mean = sum / 64
        var hi = 0L
        var lo = 0L
        i = 0
        while (i < 64) {
          val bit = if (blocks(i) >= mean) 1L else 0L
          if (i < 32) hi = hi * 2 + bit else lo = lo * 2 + bit
          i += 1
        }
        ImageHash(id, w, h, hi, lo)
      }
    }
  }
}
