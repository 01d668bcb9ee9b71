package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational capability surface (SURVEY §2.7/§2.8: the engine gets
  * group-by / join / window / sort / set ops from Catalyst; these queries
  * pin their semantics against the DuckDB oracle on the driver testdata).
  *
  * Conventions shared with the oracle SQL in [[graft.SparkEntry.oracleSql]]:
  *   - money aggregates go through DECIMAL(18,4) so the sum is exact and
  *     associative (a double sum would depend on partition order at scale),
  *     then round + cast to double for a stable comparable value;
  *   - every query ends in a deterministic ORDER BY (ties broken by keys);
  *   - column names are aliased identically on both sides (the driver's
  *     compare sorts columns by name before hashing).
  *
  * Scale notes: every aggregate here is partial-aggregated map-side by
  * Catalyst; dimension joins (region/nation/supplier/part at TPC-H scale)
  * are explicitly broadcast so the fact table never shuffles for them.
  */
object Relational {

  /** Exact money arithmetic: cast to decimal before aggregation. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** q01: TPC-H Q1-style scan + filter + group-by aggregate (A1 counts +
    * the full agg family the bench exercises). */
  def q01AggSum(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_base_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: projection + predicate pushed down to the parquet scan (TPC-H
    * Q6-style selective filter; `.explain` shows PushedFilters). */
  def q02FilterPushdown(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(
        col("l_shipdate") >= lit("1995-01-01").cast("date") &&
        col("l_shipdate") < lit("1996-01-01").cast("date") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 2)
        .cast("double").as("revenue"))
  }

  /** q03: fact-to-fact join + broadcast dimension join + top-k.
    * customer is broadcast (small dim); orders⋈lineitem shuffles on the
    * join key once, and the aggregate reuses that partitioning. */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q04: snowflake of broadcast joins — region⋈nation⋈customer rollup. */
  def q04BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(dec(col("c_acctbal"))), 2).cast("double").as("total_acctbal"))
      .orderBy(col("r_name"))
  }

  /** q05: global sort + limit (top-k orders; Spark's TakeOrderedAndProject
    * avoids the full sort shuffle). */
  def q05SortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** q06: distinct (hash aggregate, map-side partial). */
  def q06Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q07: window functions — latest shipment per supplier (single shuffle
    * on the partition key; rank + running sum share one Window). */
  def q07WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .orderBy(col("l_suppkey"))
  }

  /** q08: semi/anti joins — customers with no finished ('F') orders, per
    * nation (left_anti keeps the build side small and broadcastable). */
  def q08AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_no_order"))
      .orderBy(col("c_nationkey"))
  }

  /** q09: rollup (grouping sets) over return flag / line status. */
  def q09Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** q10: pivot (V1's wide-column synthesis, relational flavor) — one
    * column per line status, values fixed so the plan is single-pass. */
  def q10Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(dec(col("l_quantity"))), 2).cast("double"))
      .orderBy(col("l_returnflag"))

  /** q11: set ops — big-balance ∪ building-segment, minus customers with
    * open orders. */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val rich = c.filter(col("c_acctbal") > 7500).select(col("c_custkey"))
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey"))
    rich.union(building).distinct()
      .except(open.distinct())
      .orderBy(col("c_custkey"))
  }

  /** q12: join + group + having (orders with more than 4 line items). */
  def q12Having(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") > 4)
      .orderBy(col("l_orderkey"))

  /** q13: top-k per group via window (3 priciest parts per brand). */
  def q13TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    p.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("p_brand"), col("rnk"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** q14: date functions — monthly order volume. */
  def q14DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(dec(col("o_totalprice"))), 2).cast("double").as("total"))
      .orderBy(col("yr"), col("mo"))

  /** q15: string functions — parts whose name contains a token, keyed by
    * the first word of p_type. */
  def q15StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").contains("a"))
      .groupBy(split(col("p_type"), " ").getItem(0).as("type_head"))
      .agg(count(lit(1)).as("n"),
        max(upper(substring(col("p_name"), 1, 3))).as("max_prefix"))
      .orderBy(col("type_head"))

  /** q16: conditional aggregation over the events stream table. */
  def q16ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(when(col("value") > 100, dec(col("value"))).otherwise(lit(0).cast("decimal(18,4)"))), 2)
          .cast("double").as("big_value_sum"),
        count(when(col("user_id") % 2 === 0, 1)).as("n_even_users"))
      .orderBy(col("event_type"))

  /** q17: JSON extraction from the events.props payload (E2's inverse). */
  def q17JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") > 50)
      .orderBy(col("event_id"))

  /** q18: numeric bucketing (histogram of event values). */
  def q18Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** q19: multi-distinct — exact distinct counts per group. */
  def q19CountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** q20: event-time tumbling aggregation (batch form of the streaming
    * windowed agg; date_trunc on both sides). */
  def q20TimeWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("value"))), 2).cast("double").as("v"))
      .orderBy(col("hour"), col("event_type"))

  /** All queries + oracle SQL, keyed for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_sum"         -> q01AggSum _,
    "q02_filter_pushdown" -> q02FilterPushdown _,
    "q03_join_agg"        -> q03JoinAgg _,
    "q04_broadcast_join"  -> q04BroadcastJoin _,
    "q05_sort_limit"      -> q05SortLimit _,
    "q06_distinct"        -> q06Distinct _,
    "q07_window_rank"     -> q07WindowRank _,
    "q08_anti_join"       -> q08AntiJoin _,
    "q09_rollup"          -> q09Rollup _,
    "q10_pivot"           -> q10Pivot _,
    "q11_set_ops"         -> q11SetOps _,
    "q12_having"          -> q12Having _,
    "q13_topk_per_group"  -> q13TopKPerGroup _,
    "q14_date_funcs"      -> q14DateFuncs _,
    "q15_string_funcs"    -> q15StringFuncs _,
    "q16_conditional_agg" -> q16ConditionalAgg _,
    "q17_json_extract"    -> q17JsonExtract _,
    "q18_histogram"       -> q18Histogram _,
    "q19_count_distinct"  -> q19CountDistinct _,
    "q20_time_window"     -> q20TimeWindow _,
  )

  val oracleSql: Map[String, String] = Map(
    "q01_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_join_agg" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q05_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q06_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q07_window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_no_order FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q09_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q10_pivot" ->
      """SELECT l_returnflag,
        |  CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS F,
        |  CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_set_ops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 7500
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |) u WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q12_having" ->
      """SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) > 4 ORDER BY l_orderkey""".stripMargin,
    "q13_topk_per_group" ->
      """SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part) t WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q14_date_funcs" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |  COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q15_string_funcs" ->
      """SELECT SPLIT_PART(p_type, ' ', 1) AS type_head, COUNT(*) AS n,
        |  MAX(UPPER(SUBSTRING(p_name, 1, 3))) AS max_prefix
        |FROM part WHERE p_name LIKE '%a%'
        |GROUP BY 1 ORDER BY type_head""".stripMargin,
    "q16_conditional_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CASE WHEN value > 100 THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS big_value_sum,
        |  COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_even_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
    "q18_histogram" ->
      """SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q19_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q20_time_window" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
  )
}
