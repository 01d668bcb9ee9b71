package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: HYBRID retrieval scale stress — the documents AND
  * embeddings corpora replicated ×N under fresh ids (texts suffixed
  * with their copy index so replicas are near- but not exact-dups;
  * embeddings cyclically rotated per copy, AnnStress's trick), then
  * a17 (hybrid keyword⊕vector RRF) and a18's exact side timed on the
  * grown corpus. What the fixed-SF bench can't show: the keyword
  * channel's term-join grows with corpus TOKENS (Σ_t df(t) candidate
  * pairs), the vector channel with corpus ROWS — both linear, and the
  * fusion cost is constant (queries×k). Results recorded in PERF.md.
  *
  * Usage: runMain graft.RetrievalStress [sfDir] [copies]
  */
object RetrievalStress {
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

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val nDocs = docs.count()
    val nVecs = emb.count()
    val dim = 64
    val stageDir = "/tmp/graft_retrieval_stress"
    docs.crossJoin(spark.range(copies).toDF("copy"))
      .select((col("doc_id") + col("copy") * nDocs).as("doc_id"),
        // copy 0 keeps the original text (the query docs live there);
        // replicas get a distinguishing suffix token
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" copytag"), col("copy"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$stageDir/documents.parquet")
    emb.crossJoin(spark.range(copies).toDF("copy"))
      .select((col("vec_id") + col("copy") * nVecs).as("vec_id"),
        when(col("copy") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), (col("copy") % dim).cast("int") + 1,
              lit(dim) - (col("copy") % dim).cast("int")),
            slice(col("embedding"), lit(1), (col("copy") % dim).cast("int"))))
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$stageDir/embeddings.parquet")
    val totD = spark.read.parquet(s"$stageDir/documents.parquet").count()
    println(s"[stress] corpus = $totD docs (${copies}x of $nDocs), " +
      s"${copies * nVecs} vectors")

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[stress] $label rows=$rows took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // warm-up pass then measured pass, both at 1x and Nx
    Seq(("1x", sfDir), (s"${copies}x", stageDir)).foreach { case (tag, dir) =>
      timed(s"a17 hybrid RRF    $tag") {
        graft.queries.AnalyticsQueries.a17HybridSearch(spark, dir).count()
      }
      timed(s"a17 hybrid (warm) $tag") {
        graft.queries.AnalyticsQueries.a17HybridSearch(spark, dir).count()
      }
    }
    spark.stop()
  }
}
