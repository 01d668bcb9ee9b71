package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev measurement: duplicate-heavy dedup stress — every sf0.1 doc
  * replicated ×10 under fresh ids (50k docs, ~100× true pairs). This
  * is the adversarial composition for candidate generation: every
  * shingle bucket's occupancy inflates 10×, so unfiltered exact
  * explode-joins go quadratic. Compares the exact path (d02,
  * prefix-filtered since round 3) against the MinHash+LSH path (d03).
  * Results recorded in PERF.md.
  *
  * Usage: runMain graft.DedupStress [sfDir] [copies]
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val n = base.count()
    val stressed = base
      .crossJoin(spark.range(copies).toDF("copy"))
      .select((col("doc_id") + col("copy") * n).as("doc_id"), col("text"))
    stressed.write.mode("overwrite").parquet("/tmp/graft_dedup_stress")
    val docs = spark.read.parquet("/tmp/graft_dedup_stress")
    println(s"[stress] corpus = ${docs.count()} docs (${copies}x of $n)")

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
