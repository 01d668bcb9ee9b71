package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query and print its wall time.
  * Usage: runMain graft.RunOne <queryName> [sfDir] [explain]. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("warm")) { // absorb JVM/codegen warm-up like Bench does
      try SparkEntry.entry(spark).count()
      catch { case _: Throwable => () }
    }
    val fn = SparkEntry.queries(name)
    // time the whole query fn + a full plan execution (NOT
    // Dataset.count, whose rewrite can prune cardinality-preserving
    // joins and the presentation sort — Bench.scala has the details)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    val n = df.queryExecution.executedPlan.execute().count()
    println(f"[runone] $name rows=$n took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // "dump:<dir>" writes <dir>/<name> parquet + oracle_sql.json so
    // tools/selfcheck.py can gate a single query
    args.find(_.startsWith("dump:")).map(_.stripPrefix("dump:")).foreach { out =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      val sql = SparkEntry.oracleSql(name)
        .flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
          case '\r' => "\\r"; case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
        }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
        s"""{"$name": "$sql"}""")
    }
    spark.stop()
  }
}
