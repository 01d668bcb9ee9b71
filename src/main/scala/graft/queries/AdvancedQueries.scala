package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Skew

/** Advanced relational surface: skew-salted joins, composed as-of
  * joins, sketch-accuracy bounds, SQL-entry scalar subqueries, cube. */
object AdvancedQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** q22 — salted equi-join (skew mitigation): same result as the plain
    * join, by construction; the oracle checks exactly that. */
  def q22SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus"))
    Skew.saltedJoin(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), o,
        key = "o_orderkey", discriminator = col("l_linenumber"), nSalts = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** q23 — sketch bounds: approx_count_distinct must land within 10% of
    * the exact distinct count (the oracle pins the boolean outcome, so
    * a sketch regression fails the gate). */
  def q23ApproxBounds(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .select(col("event_type"),
        (abs(col("approx") - col("exact")).cast("double") / col("exact") <= 0.10)
          .as("within_10pct"))
      .orderBy(col("event_type"))

  /** q24 — as-of join, composed from union + window (SURVEY §7.4
    * preference (a): compose built-ins before custom operators): for
    * each click event, the user's most recent error event at-or-before
    * it (tuple-ordered by (ts, event_id) so ties are exact). */
  def q24AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val tagged = ev.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"),
      when(col("event_type") === "error", col("event_id")).as("err_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_err_id", last(col("err_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("last_err_id"))
      .orderBy(col("click_id"))
  }

  /** q25 — scalar subquery through the SQL entry point (spark.sql over
    * registered views — the engine's SQL front door). */
  def q25ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS n_above_avg
        |FROM orders_v
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) >
        |  (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders_v)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** q26 — cube over return flag / line status. */
  def q26Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** q27 — window-frame variants: rows-frame running sum, lead, ntile
    * over one supplier-partitioned ordering (single shuffle). */
  def q27WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // l_quantity tie-break: the synthetic data can repeat an
    // (orderkey, linenumber) pair (1 instance at sf0.1), and engines
    // order such ties differently — the running sum then differs
    // mid-tie. With quantity in the ordering, prefix sums are
    // well-defined even for fully duplicated rows.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    // lead/ntile take the plain ordering spec (Spark rejects them over
    // an explicit rows frame); the running sum gets the rows frame
    li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(dec(col("l_quantity"))).over(
          w.rowsBetween(Window.unboundedPreceding, 0)), 2).cast("double").as("running_qty"),
        lead(col("l_orderkey"), 1).over(w).as("next_orderkey"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** q28 — CTE through the SQL front door: top-quartile customers by
    * order spend, labeled by nation. */
  def q28Cte(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v28")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v28")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_v28")
    spark.sql(
      """WITH spend AS (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total
        |  FROM orders_v28 GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, total, NTILE(4) OVER (ORDER BY total DESC, o_custkey) AS quartile
        |  FROM spend)
        |SELECT n_name, COUNT(*) AS n_top_customers,
        |  CAST(ROUND(SUM(total), 2) AS DOUBLE) AS top_spend
        |FROM ranked JOIN customer_v28 ON o_custkey = c_custkey
        |JOIN nation_v28 ON c_nationkey = n_nationkey
        |WHERE quartile = 1
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  /** q29 — array aggregation: per-order sorted line numbers as a
    * comparable string (array_to_string keeps the oracle hash-stable). */
  def q29ArrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("lines"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_orderkey"))

  /** q30 — exact per-group median via a VALUE HISTOGRAM: the
    * integer-safe distributed-quantile pattern for bounded/discrete
    * domains. The ⌈n/2⌉-th and ⌊n/2⌋+1-th order statistics (equal for
    * odd n) are emitted as (median_lo, median_hi) so no float
    * averaging ever happens — cross-engine exact, unlike
    * percentile_cont whose interpolation arithmetic differs per
    * engine. Instead of rank-numbering raw rows (a per-group sort of
    * n rows over a 3-value skewed key — the previous form, and a real
    * bottleneck at scale), rows first collapse to a (group, value,
    * count) histogram with a map-side-combined hash-agg; the
    * cumulative window then runs over DISTINCT VALUES per group
    * (~50 here), and the k-th order statistic is the smallest value
    * whose cumulative count reaches k. Work at 100 TB: one partial
    * agg shuffle of histogram rows, a window over value-domain-sized
    * groups — never a sort of data rows. */
  def q30GroupMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"), col("l_quantity").cast("long").as("qty"))
    val hist = li.groupBy(col("flag"), col("qty")).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("flag")).orderBy(col("qty"))))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("flag"))))
    cum.groupBy(col("flag"))
      .agg(
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("qty"))).as("median_lo"),
        min(when(col("cum") >= expr("n DIV 2 + 1"), col("qty"))).as("median_hi"),
        min(col("n")).as("n"))
      .orderBy(col("flag"))
  }

  /** q31 — BUCKETED co-located fact-to-fact join, the storage-layout
    * lever that removes the dominant recurring cost at 100 TB: both
    * sides are written `bucketBy(8, o_orderkey)` (+ in-bucket sort),
    * so the join's hash distribution is satisfied by the LAYOUT and
    * the sort-merge join plans with NO shuffle exchange on either side
    * — pay the shuffle once at write time, never again per query.
    * BucketingSpec pins the exchange-free plan (with broadcast
    * disabled so the property is visible at dimension sizes); here the
    * bucketed round-trip also goes through the correctness gate.
    * External-table paths keep the warehouse out of the repo tree. */
  def q31BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ordersT, lineitemT) = stageQ31(spark, dir)
    spark.table(lineitemT)
      .join(spark.table(ordersT), Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** One-time layout build for q31 — bucketing is a STORAGE decision,
    * paid at write time, not a per-query cost; staging it once per
    * (session, source dir) makes the q31 timing reflect what the
    * operator exists to show: the steady-state exchange-free join.
    * Table names carry the dir's digest so two sessions (or two dirs
    * within one session) get DISTINCT catalog tables that coexist —
    * with a shared name, one caller could drop/recreate the table
    * while another session's q31 job was still reading it. */
  private def stageQ31(spark: SparkSession, dir: String): (String, String) = synchronized {
    // fingerprinted like stageOnce: a source dir regenerated in place
    // must not keep serving the old bucketed layout
    val key = PipelineQueries.stagingKey(
      dir + "\n" + PipelineQueries.contentFingerprint(dir))
    val ordersT = s"graft_q31_orders_b_$key"
    val lineitemT = s"graft_q31_lineitem_b_$key"
    if (!spark.catalog.tableExists(ordersT) || !spark.catalog.tableExists(lineitemT)) {
      val stage = PipelineQueries.staging("q31", dir)
      graft.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").option("path", s"$stage/orders_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordersT)
      graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
        .write.mode("overwrite").option("path", s"$stage/lineitem_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(lineitemT)
    }
    (ordersT, lineitemT)
  }

  /** q32 — Bloom-filter runtime join pruning, the explicit form of the
    * row-level runtime filter that makes selective fact-to-dim joins
    * survive 100 TB: build a [[graft.expressions.BloomAgg]] bitset over
    * the filtered dimension keys (one 128 KiB blob — partial-aggregable,
    * the exchange moves one bitset per map task, never the keys), pull
    * that single sketch row to the driver (metadata-scale, the same
    * contract as Spark's own InSubquery runtime filter), and prune the
    * fact SCAN with a codegen'd `graft_bloom_contains` probe BEFORE the
    * join exchange. False positives are discarded by the exact join
    * that follows, so the result is join-exact while the shuffle only
    * carries ~1/5 of the fact rows (the dimension's selectivity).
    * Unlike AQE's automatic variant, the filter is a persistable
    * artifact: build it once beside the corpus and apply it to
    * tomorrow's increment without re-reading the dimension. */
  def q32BloomPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.{BloomAgg, BloomContains}
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val filterBytes = dim
      .agg(BloomAgg(col("o_orderkey"), numBits = 1 << 20, numHashes = 5).as("f"))
      .head.getAs[Array[Byte]]("f")
    val pruned = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .filter(BloomContains(lit(filterBytes), col("l_orderkey")))
    pruned.join(dim, pruned("l_orderkey") === dim("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("qty"))
      .orderBy(col("l_returnflag"))
  }

  /** q33 — correlated EXISTS subquery (the TPC-H Q4 shape), entered
    * through SQL: Catalyst rewrites the per-row subquery into one LEFT
    * SEMI join on the correlation key (pinned in PlanAuditSpec), so
    * the cost is a single hash-shuffled semi join — not an n² re-
    * execution of the inner query, which is what the naive reading of
    * EXISTS would do at 100 TB. Complements q08 (DataFrame anti-join)
    * and q25 (scalar subquery). */
  def q33ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_q33_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q33_lineitem")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM graft_q33_orders
        |WHERE EXISTS (SELECT 1 FROM graft_q33_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** q34 — quantile-sketch accuracy bounds, q23's pattern for
    * percentiles: `approx_percentile` (the mergeable KLL-style sketch a
    * 100 TB profile job actually runs — exact percentile needs a global
    * sort) must land within 1% of the exact rank statistic at p50 and
    * p95. The gate pins the BOOLEAN, so a sketch regression fails
    * loudly while the hash compare never touches the approximate
    * values themselves. */
  def q34QuantileBounds(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("exact"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("approx"))
      .select(col("l_returnflag"),
        (abs(col("approx")(0) - col("exact")(0)) / col("exact")(0) <= 0.01)
          .as("p50_within_1pct"),
        (abs(col("approx")(1) - col("exact")(1)) / col("exact")(1) <= 0.01)
          .as("p95_within_1pct"))
      .orderBy(col("l_returnflag"))

  /** Bucket width of q35's banded interval decomposition — 6 h in µs.
    * Kept in sync with the oracle SQL's literal. */
  private val Q35WindowUs = 21600000000L

  /** q35 — banded RANGE join (anchor-context extraction): for every
    * `error` event, count and value-sum the same user's events in the
    * preceding 6 hours. Spark has no native range-join strategy — the
    * naive `a.us - W <= b.us AND b.us < a.us` condition keeps the
    * interval predicate out of the join key, so every anchor meets the
    * user's ENTIRE history (years of it, at 100 TB) before the filter
    * runs. The banded decomposition puts time INTO the equi-key: both
    * sides bucket `us DIV W`, each anchor probes its own and the
    * preceding bucket (a window of width W spans at most 2 W-aligned
    * buckets), and the exact interval check runs only within
    * co-bucketed pairs — candidates per anchor are bounded by the
    * user's activity in 2W of wall-clock, independent of history
    * length. A candidate's bucket matches at most one of the anchor's
    * two probes, so no dedup step is needed. This is the standard
    * range-join rewrite (Databricks' RANGE_JOIN hint, Flink's interval
    * join) expressed in plain DataFrame algebra; the plan is pinned to
    * a shuffled equi-join — no BNLJ, no cartesian. The oracle runs the
    * plain inequality join: same answer, different physics. */
  def q35RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = Q35WindowUs
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
    val cand = ev.select(col("user_id"), col("us").as("c_us"),
      col("value").as("c_value"), expr(s"us DIV $W").as("bucket"))
    val anchors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("us").as("a_us"))
    val probes = anchors.withColumn("bucket",
      explode(array(expr(s"a_us DIV $W - 1"), expr(s"a_us DIV $W"))))
    val ctx = probes.join(cand, Seq("user_id", "bucket"))
      .filter(col("c_us") >= col("a_us") - W && col("c_us") < col("a_us"))
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_prior"),
        sum(col("c_value").cast("decimal(18,4)")).as("sv"))
    anchors.select(col("anchor_id"), col("user_id"))
      .join(ctx, Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("user_id"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        round(coalesce(col("sv"), lit(0).cast("decimal(18,4)")), 2)
          .cast("double").as("sum_value"))
      .orderBy(col("anchor_id"))
  }

  /** q36 — correlated LATERAL subquery through the SQL entry point
    * (the modern top-N-per-outer-row construct; q25's front-door
    * companion): for each region, the top-3 customers by account
    * balance across its nations. Catalyst decorrelates the lateral
    * into a ranked join — no per-row re-execution — which is exactly
    * why the construct is usable at scale; the oracle runs the
    * identical SQL text in DuckDB. Raw column values only (no float
    * arithmetic), so doubles compare exactly. */
  def q36LateralTopN(spark: SparkSession, dir: String): DataFrame = {
    Tables.region(spark, dir).createOrReplaceTempView("region_v")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT r.r_name AS region, l.c_name, l.c_acctbal
        |FROM region_v r, LATERAL (
        |  SELECT c_name, c_acctbal
        |  FROM customer_v JOIN nation_v ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = r.r_regionkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 3
        |) l
        |ORDER BY region, c_acctbal DESC, c_name""".stripMargin)
  }

  /** q37 — RECURSIVE CTE through the SQL entry point (Spark 4's
    * `WITH RECURSIVE`, UNION ALL form): flatten a dimension hierarchy
    * by walking every node's ancestor chain to the root and reporting
    * the depth distribution — the category-tree rollup every catalog
    * pipeline runs. The parent relation is the arithmetic heap tree
    * `parent(k) = k DIV 2` over the part keys (a deterministic
    * stand-in for a parent column; the recursion neither knows nor
    * cares that the edge is computed). Tree recursion keeps UNION ALL
    * safe — ancestor paths are unique, so no dedup is needed and the
    * iteration count is the tree depth (⌊log₂ maxkey⌋, ~17 at sf0.1),
    * far under the engine's recursion limit. The oracle runs the same
    * recursion in DuckDB; agreement pins Spark's recursive-CTE
    * iteration semantics against an independent implementation. */
  def q37RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("part_v")
    spark.sql(
      """WITH RECURSIVE walk(id, anc, depth) AS (
        |  SELECT p_partkey, p_partkey DIV 2, 1 FROM part_v WHERE p_partkey > 1
        |  UNION ALL
        |  SELECT w.id, w.anc DIV 2, w.depth + 1 FROM walk w WHERE w.anc > 1
        |)
        |SELECT depth_to_root, COUNT(*) AS n_nodes,
        |  MIN(id) AS min_key, MAX(id) AS max_key
        |FROM (SELECT id, MAX(depth) AS depth_to_root FROM walk GROUP BY id)
        |GROUP BY depth_to_root ORDER BY depth_to_root""".stripMargin)
  }

  /** q41 — exact heavy hitters via a mergeable Misra–Gries sketch
    * (Misra & Gries '82; merge per Agarwal et al. PODS'12): the
    * frequency member of the sketch trio (q38 = distinct, q39 =
    * quantiles). Items are character bigrams of the document text —
    * the corpus domain with real frequency skew. Two scans, neither
    * shuffling the key space: scan 1 folds the corpus into one ≤ 64-
    * entry [[graft.expressions.MisraGries]] summary (+ the exact item
    * total in the same pass — partial summaries merge in the shuffle,
    * so exchange volume is k entries regardless of n); scan 2 recounts
    * ONLY the candidates (a ≤ 64-term IN-list, scan-local filter) and
    * keeps those with exact freq·k > n. MG guarantees every true
    * heavy hitter (freq > n/k) survives any partitioning, so the
    * output is a pure function of the data even though the candidate
    * set is not — which is why the hash gate is against a plain
    * GROUP-BY-HAVING oracle, exact counts included. At 100 TB the
    * full GROUP BY shuffles the whole vocabulary; this shuffles
    * 64 strings.
    *
    * Structurally this is TWO Spark jobs with a driver hop between
    * them: the `.head` below pulls the single merged ≤ 64-entry
    * summary to the driver so the candidate set can become an IN-list
    * literal in job 2's plan (a pushable scan-local filter, not a
    * join). That hop is deliberate and bounded — 64 entries of
    * metadata, the same size class as a broadcast variable — and is
    * NOT a data-path collect: no row of corpus data ever reaches the
    * driver. */
  def q41HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))).as("bigram"))
    val row = bigrams
      .agg(graft.expressions.MisraGries(col("bigram"), 64).as("cand"),
        count(lit(1)).as("n"))
      .head
    val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val n = row.getLong(1)
    bigrams.filter(col("bigram").isin(cands: _*))
      .groupBy(col("bigram")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 64 > n)
      .withColumn("n_total", lit(n))
      .orderBy(col("freq").desc, col("bigram"))
  }

  /** q40 — UNPIVOT through the SQL front door (q10's pivot run in
    * reverse — wide measure columns melted to (measure, value) rows,
    * the long form every metric store and plotting layer wants): the
    * four lineitem measure columns unpivot per row, then aggregate per
    * (returnflag, measure). Both engines support the SQL-standard
    * UNPIVOT clause, so the IDENTICAL query text runs on both (the
    * q36/q37 front-door discipline); Catalyst plans UNPIVOT as an
    * Expand — each input row emits its 4 long-form rows inside the
    * scan projection, no join and no shuffle beyond the final
    * aggregation. Money goes through the DECIMAL(18,4) round-trip
    * (house double-summation rule). */
  def q40Unpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q40_lineitem")
    spark.sql(q40Sql("graft_q40_lineitem"))
  }

  private def q40Sql(table: String): String =
    s"""SELECT l_returnflag, measure, COUNT(*) AS n,
       |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
       |FROM (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax
       |      FROM $table)
       |UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
       |GROUP BY l_returnflag, measure
       |ORDER BY l_returnflag, measure""".stripMargin

  /** q39 — mergeable quantile sketch, engine-exact: q38's bottom-k
    * idea applied to QUANTILES. A bottom-k-by-hash row sample is a
    * uniform sample without replacement (the hash imposes a random
    * permutation of the rows; keeping the k smallest is the classic
    * bottom-k sketch — Cohen & Kaplan PODS'07, public), and unlike a
    * reservoir it is DETERMINISTIC given the hash and mergeable by
    * heap union — which is what makes it a sketch: per group every map
    * task reduces its slice to ≤ k (hash, key) pairs before the
    * exchange (shuffle = groups×k), disjoint shards merge by
    * re-merging heaps, and nearest-rank quantiles read off the sorted
    * sample with error O(1/√k). The whole pipeline — hash, heap,
    * sample membership, rank selection — is integer-deterministic, so
    * the ESTIMATES hash-gate across engines (q34 could only gate an
    * error-bound boolean around Spark's opaque approx_percentile).
    * Per o_orderpriority: sample k=128 order keys by the salted
    * 31-base polynomial hash (q38's uniformity lesson — a bare
    * integer key never wraps the modulus), fetch the sampled rows'
    * o_totalprice with a broadcast join of the (groups×k)-row key
    * table against the orders scan, and report nearest-rank
    * p25/p50/p75/p90 over the per-group sorted sample (index
    * ⌈q·m⌉ = (q·100·m + 99) DIV 100, 1-based, integer in both
    * engines). The values themselves pass through unchanged — no
    * float arithmetic anywhere. */
  def q39QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.TopKByScore
    val k = 128
    val orders = Tables.orders(spark, dir)
    val base = orders.select(col("o_orderpriority").as("grp"), col("o_orderkey"),
      graft.functions.TextFunctions.polyHash(
        concat(col("o_orderkey").cast("string"), lit("-qsk-0123456789abcdef")))
        .as("h"))
    val agg = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_exact"),
        TopKByScore(-col("h"), col("o_orderkey"), k).as("mk"))
    val keys = agg.select(col("grp"), explode(col("mk")).as("t"))
      .select(col("grp"), col("t.id").as("o_orderkey"))
    val v = orders.select(col("o_orderkey"), col("o_totalprice"))
      .join(broadcast(keys), Seq("o_orderkey"))
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("o_totalprice"))).as("vs"))
    def estP(q: Int): Column =
      element_at(col("vs"), expr(s"CAST(($q * size(vs) + 99) DIV 100 AS INT)"))
        .as(s"est_p$q")
    agg.select(col("grp"), col("n_exact")).join(v, Seq("grp"))
      .select(col("grp"), col("n_exact"), size(col("vs")).cast("long").as("m_sample"),
        estP(25), estP(50), estP(75), estP(90))
      .orderBy(col("grp"))
  }

  /** q38 — KMV (k-minimum-values) distinct sketch, engine-exact: the
    * MERGEABLE approximate-distinct shape (Bar-Yossef et al. 2002, the
    * same family as HyperLogLog but deterministic given the hash, so
    * the whole sketch — kth minimum AND the estimate — hash-gates
    * across engines, where q23 could only gate a boolean error bound
    * around Spark's opaque HLL++). Per event_type: hash each distinct
    * user to the shared 31-base polynomial hash (uniform on [0, P)),
    * keep the k=64 smallest via [[graft.expressions.TopKByScore]]
    * (score = −h, so best-first = ascending h), estimate
    * distinct ≈ (k−1)·P / h₍ₖ₎ in integer DIV — exact in both engines.
    * The hashed string is the id plus a 26-char salt suffix: a bare
    * 1–4 digit id never exceeds 31⁴·57 ≪ P, so its hash occupies a
    * tiny prefix of the key space and the kth minimum wildly
    * over-estimates; the salt forces ≥ 26 fold steps past the modulus,
    * mixing the value over all of [0, P) (KMV's uniformity
    * precondition, Bar-Yossef §2).
    * Scale shape: the min-k heap is a partial-aggregable
    * TypedImperativeAggregate, so every map task reduces its slice to
    * ≤ k longs per group before the exchange — shuffle volume is
    * groups×k, the defining property that lets one sketch summarize a
    * 100 TB column; sketches from disjoint shards union by re-merging
    * heaps (the same `merge` the partial aggregation already
    * exercises). The upstream distinct is demo bookkeeping so exact
    * and estimate read off one frame; a production sketch-only pass
    * dedups inside the heap instead. */
  def q38KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val P = graft.functions.TextFunctions.HashP
    val d = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.functions.TextFunctions.polyHash(
          concat(col("user_id").cast("string"), lit("-kmv-0123456789abcdef")))
          .as("h"))
      .distinct()
    d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"),
        graft.expressions.TopKByScore(-col("h"), col("h"), k).as("mk"))
      .select(col("event_type"), col("n_exact"),
        when(size(col("mk")) < k, col("n_exact"))
          .otherwise(expr(s"(CAST(${k - 1} AS BIGINT) * CAST($P AS BIGINT)) DIV element_at(mk, $k).id"))
          .as("kmv_est"))
      .withColumn("err4",
        floor(lit(10000.0) * abs(col("kmv_est") - col("n_exact")) / col("n_exact"))
          .cast("long"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_heavy_hitters"   -> q41HeavyHitters _,
    "q40_unpivot"         -> q40Unpivot _,
    "q39_quantile_sketch" -> q39QuantileSketch _,
    "q38_kmv_distinct"    -> q38KmvDistinct _,
    "q37_recursive_cte"   -> q37RecursiveCte _,
    "q36_lateral_topn"    -> q36LateralTopN _,
    "q35_range_join"      -> q35RangeJoin _,
    "q34_quantile_bounds" -> q34QuantileBounds _,
    "q33_exists_subquery" -> q33ExistsSubquery _,
    "q32_bloom_prune"     -> q32BloomPrune _,
    "q31_bucketed_join"   -> q31BucketedJoin _,
    "q30_group_median"    -> q30GroupMedian _,
    "q27_window_frames"   -> q27WindowFrames _,
    "q28_cte"             -> q28Cte _,
    "q29_array_agg"       -> q29ArrayAgg _,
    "q22_salted_join"     -> q22SaltedJoin _,
    "q23_approx_bounds"   -> q23ApproxBounds _,
    "q24_asof_join"       -> q24AsOfJoin _,
    "q25_scalar_subquery" -> q25ScalarSubquery _,
    "q26_cube"            -> q26Cube _,
  )

  /** DuckDB mirror of [[graft.expressions.PolyHash]] — same 31-base
    * codepoint fold mod 1e9+7 as AnalyticsQueries' oracle DSL. */
  private def duckPolyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($s)+1), _pc -> unicode(substring($s, _pc, 1)))), " +
      s"(_pa,_pb) -> (_pa*31+_pb) % 1000000007)"

  val oracleSql: Map[String, String] = Map(
    // the exact heavy hitters recomputed as a plain GROUP BY + HAVING —
    // the MG candidate detour must be invisible in the output
    "q41_heavy_hitters" ->
      """WITH b AS (SELECT unnest(list_transform(range(1, length(text)),
        |    i -> substring(text, i, 2))) AS bigram
        |  FROM documents WHERE length(text) >= 2),
        |n AS (SELECT COUNT(*) AS n FROM b),
        |c AS (SELECT bigram, COUNT(*) AS freq FROM b GROUP BY bigram)
        |SELECT c.bigram, c.freq, (SELECT n FROM n) AS n_total
        |FROM c WHERE c.freq * 64 > (SELECT n FROM n)
        |ORDER BY c.freq DESC, c.bigram""".stripMargin,
    // the identical SQL-standard UNPIVOT text, pointed at the base table
    "q40_unpivot" -> q40Sql("lineitem"),
    // the same bottom-128 hash sample (rn ≤ k under (h, key) order =
    // the heap's (−h desc, id asc)), values re-fetched by key, then
    // identical 1-based nearest-rank indices off the sorted sample
    "q39_quantile_sketch" ->
      s"""WITH s0 AS (SELECT o_orderpriority AS grp, o_orderkey,
         |    ${duckPolyHash("CAST(o_orderkey AS VARCHAR) || '-qsk-0123456789abcdef'")} AS h
         |  FROM orders),
         |r AS (SELECT grp, o_orderkey,
         |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h, o_orderkey) AS rn,
         |    COUNT(*) OVER (PARTITION BY grp) AS nex FROM s0),
         |b AS (SELECT grp, CAST(MAX(nex) AS BIGINT) AS n_exact FROM r GROUP BY grp),
         |k AS (SELECT grp, o_orderkey FROM r WHERE rn <= 128),
         |v AS (SELECT k.grp, list_sort(list(o.o_totalprice)) AS vs
         |  FROM k JOIN orders o USING (o_orderkey) GROUP BY k.grp)
         |SELECT b.grp, b.n_exact, CAST(len(v.vs) AS BIGINT) AS m_sample,
         |  v.vs[(25*len(v.vs)+99)//100] AS est_p25,
         |  v.vs[(50*len(v.vs)+99)//100] AS est_p50,
         |  v.vs[(75*len(v.vs)+99)//100] AS est_p75,
         |  v.vs[(90*len(v.vs)+99)//100] AS est_p90
         |FROM b JOIN v USING (grp) ORDER BY grp""".stripMargin,
    // min-k over the same hash; rn=64's h is the kth minimum, the
    // estimate is the same integer DIV, lateral alias reuse for err4
    "q38_kmv_distinct" ->
      s"""WITH d AS (SELECT DISTINCT event_type,
         |    ${duckPolyHash("CAST(user_id AS VARCHAR) || '-kmv-0123456789abcdef'")} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, h,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nex FROM d),
         |b AS (SELECT event_type, CAST(MAX(nex) AS BIGINT) AS n_exact
         |  FROM r GROUP BY event_type),
         |kth AS (SELECT event_type, h AS h_k FROM r WHERE rn = 64)
         |SELECT b.event_type, b.n_exact,
         |  CAST(CASE WHEN kth.h_k IS NULL THEN b.n_exact
         |       ELSE (63 * CAST(1000000007 AS BIGINT)) // kth.h_k END AS BIGINT) AS kmv_est,
         |  CAST(floor(10000.0 * abs(kmv_est - b.n_exact) / b.n_exact) AS BIGINT) AS err4
         |FROM b LEFT JOIN kth USING (event_type) ORDER BY event_type""".stripMargin,
    // the same recursion, DuckDB syntax (// for integer division)
    "q37_recursive_cte" ->
      """WITH RECURSIVE walk(id, anc, depth) AS (
        |  SELECT p_partkey, p_partkey // 2, 1 FROM part WHERE p_partkey > 1
        |  UNION ALL
        |  SELECT w.id, w.anc // 2, w.depth + 1 FROM walk w WHERE w.anc > 1
        |)
        |SELECT depth_to_root, COUNT(*) AS n_nodes,
        |  MIN(id) AS min_key, MAX(id) AS max_key
        |FROM (SELECT id, MAX(depth) AS depth_to_root FROM walk GROUP BY id)
        |GROUP BY depth_to_root ORDER BY depth_to_root""".stripMargin,
    "q36_lateral_topn" ->
      """SELECT r.r_name AS region, l.c_name, l.c_acctbal
        |FROM region r, LATERAL (
        |  SELECT c_name, c_acctbal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_regionkey = r.r_regionkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 3
        |) l
        |ORDER BY region, c_acctbal DESC, c_name""".stripMargin,
    // the banded rewrite must equal the plain inequality join
    "q35_range_join" ->
      """WITH a AS (SELECT event_id AS anchor_id, user_id, ts FROM events
        |  WHERE event_type = 'error'),
        |j AS (SELECT a.anchor_id, COUNT(*) AS n_prior,
        |    SUM(CAST(b.value AS DECIMAL(18,4))) AS sv
        |  FROM a JOIN events b ON a.user_id = b.user_id
        |    AND epoch_us(b.ts) >= epoch_us(a.ts) - 21600000000
        |    AND epoch_us(b.ts) < epoch_us(a.ts)
        |  GROUP BY 1)
        |SELECT a.anchor_id, a.user_id, COALESCE(j.n_prior, 0) AS n_prior,
        |  CAST(ROUND(COALESCE(j.sv, 0), 2) AS DOUBLE) AS sum_value
        |FROM a LEFT JOIN j USING (anchor_id) ORDER BY anchor_id""".stripMargin,
    "q34_quantile_bounds" ->
      """SELECT l_returnflag, TRUE AS p50_within_1pct, TRUE AS p95_within_1pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_exists_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q32_bloom_prune" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_bucketed_join" ->
      """SELECT o.o_orderstatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_cte" ->
      """WITH spend AS (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, total, NTILE(4) OVER (ORDER BY total DESC, o_custkey) AS quartile
        |  FROM spend)
        |SELECT n_name, COUNT(*) AS n_top_customers,
        |  CAST(ROUND(SUM(total), 2) AS DOUBLE) AS top_spend
        |FROM ranked JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE quartile = 1
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q29_array_agg" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q30_group_median" ->
      """WITH s AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |r AS (SELECT flag, qty,
        |    ROW_NUMBER() OVER (PARTITION BY flag ORDER BY qty) AS rn,
        |    COUNT(*) OVER (PARTITION BY flag) AS n FROM s)
        |SELECT flag, MIN(qty) AS median_lo, MAX(qty) AS median_hi, MIN(n) AS n
        |FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        |GROUP BY flag ORDER BY flag""".stripMargin,
    "q27_window_frames" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE) AS running_qty,
        |  LEAD(l_orderkey, 1) OVER w AS next_orderkey,
        |  NTILE(4) OVER w AS quartile
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q22_salted_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q23_approx_bounds" ->
      """SELECT event_type, TRUE AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q24_asof_join" ->
      """SELECT event_id AS click_id, user_id, last_err_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_err_id
        |  FROM events) t
        |WHERE event_type = 'click' ORDER BY click_id""".stripMargin,
    "q25_scalar_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n_above_avg
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) >
        |  (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q26_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
  )
}
