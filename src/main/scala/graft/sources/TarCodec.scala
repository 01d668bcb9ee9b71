package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.{DataFrame, Dataset}

/** S4 — tar archive source: archives land as binary blobs (Spark's
  * `binaryFile` source at the edge), members are extracted and UTF-8
  * decoded in a narrow flatMap (reference: decompression.py:29-48).
  *
  * One task per archive split; extraction never shuffles. At 100 TB the
  * parallel unit is the archive, matching the reference's batch-per-task
  * model but with Spark's task scheduling/retry instead of a 5-thread
  * pool.
  */
object TarCodec {

  /** Iterate (memberName, memberBytes) over an in-memory tar. */
  def members(bytes: Array[Byte]): Iterator[(String, Array[Byte])] = {
    val in = new TarArchiveInputStream(new ByteArrayInputStream(bytes))
    Iterator.continually(in.getNextEntry)
      .takeWhile(_ != null)
      .filter(_.isFile)
      .map(e => (e.getName, in.readAllBytes()))
  }

  /** Build a tar archive from (name, bytes) entries (test/synthesis
    * helper — the reference only reads tars). */
  def archive(entries: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val out = new TarArchiveOutputStream(buf)
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    for ((name, data) <- entries) {
      val e = new TarArchiveEntry(name)
      e.setSize(data.length.toLong)
      out.putArchiveEntry(e)
      out.write(data)
      out.closeArchiveEntry()
    }
    out.finish()
    buf.toByteArray
  }

  /** Extract every member of every archive: input Dataset of
    * (archivePath, archiveBytes) → (path, member, content) with UTF-8
    * decode (E4). Optional accumulators mirror the reference's global
    * unpacked-archives / extracted-members tallies (A2,
    * decompression.py:20-21,45,50-53) — Spark-native run counters
    * instead of shared mutable ints. */
  def extract(archives: Dataset[(String, Array[Byte])],
      archivesAcc: Option[org.apache.spark.util.LongAccumulator] = None,
      membersAcc: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.flatMap { case (path, bytes) =>
      archivesAcc.foreach(_.add(1L))
      members(bytes).map { case (name, data) =>
        membersAcc.foreach(_.add(1L))
        (path, name, new String(data, StandardCharsets.UTF_8))
      }
    }.toDF("path", "member", "content")
  }
}
