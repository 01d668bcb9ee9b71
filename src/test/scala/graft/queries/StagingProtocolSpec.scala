package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Failure injection for the meta-last completeness-marker protocol
  * that EVERY persisted index stage relies on (stageImageHashIndex,
  * stageM10Generation, stagePqIndex, stageIvfIndex, the a28 token-hash
  * table, the p22/p26 layouts, ...): data dirs are written first and
  * `meta` is written LAST, so
  *
  *  - a crash mid-write leaves data but no `meta` → the next call must
  *    REBUILD rather than serve the truncated generation;
  *  - a present `meta` short-circuits → the stage is never rewritten
  *    once complete (serving stays read-only).
  *
  * One spec covers the family because every site is the same four
  * lines around the same `fs.exists($stage/meta)` test; this drives
  * the representative with the richest scaladoc (the m10 generational
  * image stage) through both halves of the contract. The truncated
  * state is injected for real: `hashes` is physically replaced by a
  * 1-row parquet, which is exactly what a crash between the two
  * writes can leave behind.
  */
class StagingProtocolSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
  private val dir = "/root/testdata/sf0.001"

  test("meta marker short-circuits when present; its absence forces a rebuild") {
    val pred = col("media_id") % 2 === 1 // the m10 segment generation's shape
    // A DEDICATED test-only stage tag: the injection below physically
    // corrupts the stage on disk, and a failure/interrupt between the
    // injection and the half-2 rebuild would leave a truncated-but-
    // marked-complete stage that every later suite/bench run on this
    // machine silently serves (the fingerprint-keyed cache never
    // rebuilds it). Under its own tag the blast radius is this spec —
    // and force=true at entry re-arms it even after a prior crashed
    // run left the corrupted state behind.
    val stage = AnalyticsQueries.stageM10Generation(
      spark, dir, "m10ihspec", pred, force = true)
    val fs = new Path(stage).getFileSystem(spark.sessionState.newHadoopConf())
    val hashesPath = new Path(s"$stage/hashes")
    val metaPath = new Path(s"$stage/meta")
    assert(fs.exists(metaPath), "fresh build must end with the meta marker")
    val full = spark.read.parquet(s"$stage/hashes").count()
    assert(full > 1, s"fixture too small to distinguish truncation (n=$full)")

    // Inject a truncated generation: physically replace `hashes` with a
    // single row, exactly the state a crash mid-`hashes`-write (or a
    // partially-committed overwrite) can leave on disk.
    val one = spark.read.parquet(s"$stage/hashes").limit(1)
    val oneRows = one.collect().toSeq
    val schema = one.schema
    fs.delete(hashesPath, true)
    spark.createDataFrame(spark.sparkContext.parallelize(oneRows, 1), schema)
      .write.parquet(s"$stage/hashes")

    // Half 1 — marker present: the stage must short-circuit, i.e. the
    // builder trusts `meta` and does NOT rewrite. The injected 1-row
    // table surviving the call is the proof that `meta` (not the data
    // dir) is what gates the rebuild.
    AnalyticsQueries.stageM10Generation(spark, dir, "m10ihspec", pred)
    assert(spark.read.parquet(s"$stage/hashes").count() == 1,
      "a present meta marker must short-circuit: stage was rewritten")

    // Half 2 — the crash state: truncated data, NO marker. The next
    // call must detect the missing marker and rebuild the whole
    // generation instead of serving the 1-row truncation.
    fs.delete(metaPath, true)
    AnalyticsQueries.stageM10Generation(spark, dir, "m10ihspec", pred)
    assert(fs.exists(metaPath), "rebuild must restore the completeness marker")
    assert(spark.read.parquet(s"$stage/hashes").count() == full,
      "missing meta must force a full rebuild, not serve the truncation")
    val n = spark.read.parquet(s"$stage/meta").head.getAs[Long]("n")
    assert(n == full, "meta row count must match the rebuilt generation")
  }
}
