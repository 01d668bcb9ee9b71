package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev measurement: per-group top-k via the window idiom
  * (`row_number() OVER (PARTITION BY … ORDER BY …)`) vs the native
  * single-pass [[graft.expressions.TopKByScore]] aggregate, on
  * lineitem (the largest testdata table). The structural difference —
  * the window shuffles and sorts EVERY row, the aggregate pre-reduces
  * each map slice to ≤ k pairs per group before the exchange — is what
  * PlanAuditSpec pins; this bench puts a local number on it. Results
  * recorded in PERF.md (the gap widens with rows-per-group, i.e. with
  * scale).
  *
  * Usage: runMain graft.TopKBench [sfDir] [reps]
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // score = extended price in cents (integer), id = orderkey*10+line
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("g"),
        (col("l_extendedprice") * 100).cast("long").as("score"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
    li.count() // warm the scan cache path

    def time(label: String)(body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply(times.length / 2)
      println(f"[topkbench] $label rows=${times.head._2} median=$med%.2f s (${times.map(t => f"${t._1}%.2f").mkString(", ")})")
    }

    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    time("window row_number + filter") {
      li.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5).count()
    }
    time("graft_top_k aggregate") {
      li.groupBy(col("g"))
        .agg(graft.expressions.TopKByScore(col("score"), col("id"), 5).as("top"))
        .select(col("g"), explode(col("top"))).count()
    }
    spark.stop()
  }
}
