package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed co-located join (SURVEY "co-locate joins via bucketing"):
  * two tables bucketed on the join key must join with NO shuffle
  * exchange — the physical property that removes the dominant cost of
  * repeated fact-to-fact joins at 100 TB. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse").toString
    // NB: tune() sets a broadcast threshold — the -1 override must come
    // AFTER it or the dimension side gets broadcast and hides bucketing
    val s = GraftSession.tune(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", wh))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, dir)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("lineitem_b")

    // the bare join: bucketed scans satisfy the join's distribution —
    // a sort-merge join with NO exchange on either side
    val bare = spark.table("lineitem_b")
      .join(spark.table("orders_b"), Seq("o_orderkey"))
    val plan = bare.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    // and it computes the same answer as the plain-parquet join
    val joined = bare.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val expect = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }
}
