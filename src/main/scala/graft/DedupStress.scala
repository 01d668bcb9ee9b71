package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev measurement: duplicate-heavy dedup stress — nBase
  * [[StressFixtures.zipfDocs]] documents (Zipf(1.0) vocabulary; the
  * pre-round-8 fixture replicated the ~30-word-vocab gated docs, so
  * every shingle lived in a handful of corpus-wide buckets and both
  * paths were measured at a degenerate upper bound) each replicated
  * ×copies under fresh ids with a one-token suffix — replicas are
  * near- but not exact-dups (4-shingle Jaccard ≈ 0.85), so candidate
  * generation faces ×copies² true-pair pressure per base doc while
  * bucket occupancies stay text-like. Compares the exact
  * prefix-filtered path (d02) against banded MinHash+LSH (d03).
  * Results recorded in PERF.md.
  *
  * Usage: runMain graft.DedupStress [sfDir] [copies] [nBase]
  * (nBase overrides the base-doc count — fixing copies×nBase while
  * varying copies isolates DUPLICATION DENSITY from corpus size)
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val nBaseArg = if (args.length > 2) Some(args(2).toLong) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBase = nBaseArg.getOrElse(Tables.documents(spark, sfDir).count())
    StressFixtures.zipfDocs(spark, nBase)
      .crossJoin(spark.range(copies).toDF("copy"))
      .select((col("doc_id") + col("copy") * nBase).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zc"), col("copy"))).as("text"))
      .write.mode("overwrite").parquet("/tmp/graft_dedup_stress")
    val docs = spark.read.parquet("/tmp/graft_dedup_stress")
    println(s"[stress] corpus = ${docs.count()} zipf docs (${copies}x of $nBase)")

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[stress] $label pairs=$rows took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("d03 minhash+LSH") {
      Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), 4, 32, 16, 0.5).count()
    }
    time("d02 exact prefix-filtered") {
      Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 4, 0.5).count()
    }
    spark.stop()
  }
}
