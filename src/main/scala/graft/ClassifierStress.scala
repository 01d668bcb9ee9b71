package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

/** Dev measurement: the TRAINED-MODEL family (t16/t17 — distributed
  * fixed-point gradient descent) under corpus replication, closing the
  * iterative-family stress coverage (AnnStress = ANN, GraphStress =
  * PageRank/CC, this = model training).
  *
  * Documents are replicated ×copies under disjoint doc_id spaces with
  * IDENTICAL text, which makes the run self-verifying: every gradient
  * sum g and the row count n both scale by ×copies, so the weight
  * update ⌊6g/(1000n)⌋ is invariant — the ×copies training run must
  * produce EXACTLY the 1× weights, or an iteration mixed state across
  * rounds. The numbers to watch: per-round wall time (one map-side-
  * combined 5-sum aggregate over the checkpointed feature table)
  * should grow ~linearly in copies; the weight vector must not move.
  *
  * Timed, at 1× and ×copies: the feature-projection scan (one-time,
  * checkpointed — t16's analog of an index build), the 5-round GD
  * loop (the iterative part; driver state = five longs per round),
  * and the t17-shaped scoring scan under the frozen weights.
  * Results recorded in PERF.md.
  *
  * Usage: runMain graft.ClassifierStress [sfDir] [copies]
  */
object ClassifierStress {
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

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[stress] $label took ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val span = base.agg(max(col("doc_id"))).head.getLong(0) + 1
    var w1x: Array[Long] = null
    Seq(("1x", 1), (s"${copies}x", copies)).foreach { case (tag, c) =>
      val docs = base.crossJoin(spark.range(c).toDF("copy"))
        .select((col("doc_id") + col("copy") * span).as("doc_id"), col("text"))
      val ft = timed(s"t16 feature projection   $tag") {
        val f = AnalyticsQueries.qualityFeaturesOf(docs).localCheckpoint()
        f.count() // materialize inside the timed block
        f
      }
      val n = ft.count()
      val w = timed(f"t16 5-round GD ($n%,d rows) $tag") {
        AnalyticsQueries.gdTrainWeights(ft, n)
      }
      println(s"[stress] t16 $tag weights = ${w.mkString(", ")}")
      if (c == 1) w1x = w
      else {
        val same = java.util.Arrays.equals(w, w1x)
        println(s"[stress] t16 $tag weights identical to 1x = $same (want true)")
        require(same, "replicated training diverged from the 1x trajectory")
      }
      timed(s"t17 scoring scan         $tag") {
        AnalyticsQueries.scoreQuality(ft, w).count()
      }
      ft.unpersist()
    }
    spark.stop()
  }
}
