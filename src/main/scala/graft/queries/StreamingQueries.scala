package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import graft.streaming.{InMemoryRecordProducer, KinesisSink, Replay, UpsertSink}

/** Oracle-checked exercises of the streaming surface (SURVEY §2.9).
  * Replay pacing runs with timeScale = 0 here (correctness, not
  * wall-clock); the pacing math itself is pinned by ReplaySpec. */
object StreamingQueries {

  /** Scope `spark.sql.shuffle.partitions` down around a streaming
    * query's START. Every stateful operator commits one state store
    * per shuffle partition per micro-batch; at the session's 32
    * partitions that fixed cost dwarfs these correctness-gate volumes
    * (measured 23 s → 13 s cold on the stream-stream join). The value
    * is captured in the query's own offset log at start, so the
    * save/restore cannot leak into a later batch plan — and a real
    * deployment sizes this to its data, which is exactly the point of
    * it being a config. */
  private def withStreamShuffle[A](spark: SparkSession, n: Int)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Streaming INPUT fixtures (staged parquet files a file-source
    * stream admits batch by batch) are deterministic functions of the
    * immutable testdata dir, so they are built once per (tag, dir) via
    * [[PipelineQueries.stageOnce]] (versioned + locked + crash-clean).
    * The operator's timed cost is then the STREAM — source admission,
    * state-store commits, drain — not re-writing its own input files:
    * the same layout-vs-query split q31 applies to storage. Mutable
    * per-run state (s12's upsert ledger) must NOT go through this —
    * only inputs. */
  private def stageOnce(tag: String, dir: String, dataDirs: Seq[String] = Nil)(
      build: => Unit): Unit =
    PipelineQueries.stageOnce(tag, dir, dataDirs)(build)

  /** The ONE streamed-landing scaffold the foreachBatch family shares
    * (s17/s18/s20/s21/s24/s25/s26): stage the input frame once (the
    * caller shapes it to 4 partitions — 4 files → 4 micro-batches
    * under maxFilesPerTrigger=1), delete THIS RUN's landing root
    * (mutable per-run state never goes through stageOnce), stream the
    * staged files, hand each micro-batch to `onBatch` with the
    * landing root — every batch writes batch-id-keyed paths, so a
    * crash-replayed batch overwrites its own landing idempotently —
    * drain with AvailableNow, and return the landing root for the
    * post-stream readback. A fix to the landing protocol lands in
    * every streamed query at once. */
  private def streamedLandings(spark: SparkSession, dir: String, tag: String,
      landingName: String)(input: => DataFrame)(
      onBatch: (DataFrame, Long, String) => Unit): String = {
    val root = java.nio.file.Paths.get(PipelineQueries.staging(tag, dir))
    val staged = root.resolve("in")
    stageOnce(s"${tag}in", dir, Seq(staged.toString)) {
      input.write.mode("overwrite").parquet(staged.toString)
    }
    val landed = root.resolve(landingName).toString
    val hfs = new org.apache.hadoop.fs.Path(landed)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(landed), true) // fresh run
    val inSchema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          onBatch(batch, id, landed); ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    landed
  }

  /** events.ts has shipped in two physical encodings across testdata
    * generations (see [[graft.Tables.events]]): TIMESTAMP(NANOS, ntz),
    * readable only as BIGINT under the nanosAsLong legacy conf, and
    * plain TIMESTAMP(MICROS, ntz). File-stream sources declare their
    * schema up front, so probe the footer once (metadata-only) and
    * derive (declared ts type, ts-normalizer SQL, replay-millis SQL)
    * from what the file actually holds — both encodings then run the
    * identical downstream plan on identical values. */
  private def eventsTsIsLong(spark: SparkSession, dir: String): Boolean = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType
  }

  private def eventsStreamSchema(tsIsLong: Boolean): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", if (tsIsLong) LongType else TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** SQL normalizing the declared ts column to TIMESTAMP (session-tz
    * UTC everywhere in this library, so ntz → ltz is the identity on
    * the underlying micros). Nanos floor-truncate to micros — the same
    * narrowing DuckDB applies. */
  private def tsNormExpr(tsIsLong: Boolean): String =
    if (tsIsLong) "timestamp_micros(ts DIV 1000)" else "CAST(ts AS TIMESTAMP)"

  /** SQL yielding epoch millis for the replay source's schedule. */
  private def tsMillisExpr(tsIsLong: Boolean): String =
    if (tsIsLong) "ts DIV 1000000" else "unix_millis(CAST(ts AS TIMESTAMP))"

  /** s01 — T1/T2/T3/T4 + K3: replay the events table (timestamp-grouped,
    * ascending) into the in-memory keyed sink, then read the sink back.
    * One replay per event_type mirrors the reference's
    * one-producer-per-reading-type model (main.py:51). */
  def s01ReplaySink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select(
      col("event_type"), col("props"),
      unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
    val types = ev.select(col("event_type")).distinct().as[String].collect().sorted
    val producer = new InMemoryRecordProducer(nShards = 4)
    types.foreach { t =>
      Replay.replay(ev.filter(col("event_type") === t), col("ts_ms"), "props",
        partitionKey = t, stream = "graft-stream", producer = producer, timeScale = 0.0)
    }
    val got = producer.records.map { case (_, key, _, data) =>
      (key, new String(data, "UTF-8"))
    }
    spark.createDataset(got).toDF("partition_id", "payload")
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n"), min(col("payload")).as("min_payload"),
        max(col("payload")).as("max_payload"))
      .orderBy(col("partition_id"))
  }

  /** s02 — Structured Streaming: file-source stream over the events
    * parquet → event-time tumbling window aggregate with watermark →
    * memory sink (complete mode), drained synchronously with
    * Trigger.AvailableNow. Same answer as the batch q20 shape. */
  def s02StreamWindow(spark: SparkSession, dir: String): DataFrame = {
    // scoped conf: the file stream source consults it while the query
    // runs; AvailableNow drains synchronously inside this method, so
    // save/restore around awaitTermination is sound (the memory-table
    // read below never touches parquet)
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try s02StreamWindowImpl(spark, dir)
    finally prevNanos match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  private def s02StreamWindowImpl(spark: SparkSession, dir: String): DataFrame = {
    val tsIsLong = eventsTsIsLong(spark, dir)
    val schema = eventsStreamSchema(tsIsLong)
    // the file stream source wants a directory: stage the single-file
    // table into a per-sf temp dir. Copy unconditionally — a staged
    // file from an earlier run must not be served stale if the source
    // table changed under the same path.
    val staged = java.nio.file.Paths.get(PipelineQueries.staging("s02", dir))
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "events.parquet"),
      staged.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
      .withColumn("ts", expr(tsNormExpr(tsIsLong)))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val name = s"s02_out_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(name)
      .select(col("w.start").cast("timestamp_ntz").as("hour"), col("event_type"), col("n"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** s03 — stateful running counts (mapGroupsWithState) drained over
    * the events table as a two-batch stream; the final per-key state
    * must equal the batch group-by counts. */
  def s03StatefulCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // MemoryStream is a driver-fed demonstration source (real
    // deployments read files/queues); feed it via toLocalIterator in
    // bounded chunks so this query never collects the table at once
    val total = Tables.events(spark, dir).count()
    val it = Tables.events(spark, dir)
      .select(col("event_type")).as[String].toLocalIterator()
    val mem = MemoryStream[String]
    val name = s"s03_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      graft.streaming.Stateful.runningCounts(mem.toDS())
        .writeStream.outputMode("update").format("memory").queryName(name).start()
    }
    // feed in bounded chunks; process twice (mid + end) so the state
    // provably crosses a micro-batch boundary without paying a full
    // streaming cycle per chunk
    var fed = 0L
    var processedMid = false
    val chunk = new scala.collection.mutable.ArrayBuffer[String](5000)
    while (it.hasNext) {
      chunk.clear()
      while (it.hasNext && chunk.size < 5000) chunk += it.next()
      mem.addData(chunk.toSeq: _*)
      fed += chunk.size
      if (!processedMid && fed >= total / 2) { q.processAllAvailable(); processedMid = true }
    }
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .groupBy(col("key").as("event_type"))
      .agg(max(col("n")).as("n")) // latest emission per key = running total
      .orderBy(col("event_type"))
  }

  /** s04 — T1/T2 through the REAL streaming source: replay events via
    * `graft-replay` (a rate-limited MicroBatchStream with
    * checkpointable offsets — see ReplaySource), aggregate per
    * partition key, drain with Trigger.AvailableNow. Same semantic
    * contract as s01's driver loop, now restart-safe. */
  def s04ReplaySource(spark: SparkSession, dir: String): DataFrame = {
    val stream = spark.readStream.format("graft-replay")
      .option("path", s"$dir/events.parquet")
      .option("nanosAsLong", "true") // scoped to the source's staging read
      .option("tsMillisExpr", tsMillisExpr(eventsTsIsLong(spark, dir)))
      // drain cap: bound batches by DATA size, not group count — 100k
      // single-row groups at sf0.1 in 10k-group batches would pay 10
      // micro-batch fixed costs (~1.5s each) for no added coverage;
      // bounded-batch admission itself is pinned by StreamingSpec
      .option("maxGroupsPerTrigger", "1000000")
      .option("keyExpr", "event_type")
      .option("payloadExpr", "props")
      .load()
    val agg = stream.groupBy(col("partition_key").as("partition_id"))
      .agg(count(lit(1)).as("n"), min(col("payload")).as("min_payload"),
        max(col("payload")).as("max_payload"))
    val name = s"s04_out_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(name).orderBy(col("partition_id"))
  }

  /** JVM-shared sink state for s05: the producer must be one instance
    * across tasks (closures serialize even in local mode), and the
    * transient-failure injector needs a shared attempt count per
    * record. In-proc demo sink, same caveat as s01. */
  private object S05 {
    import java.util.concurrent.ConcurrentHashMap
    val holders = new ConcurrentHashMap[String, InMemoryRecordProducer]()
    private val attempts = new ConcurrentHashMap[String, Integer]()
    def producer(key: String): InMemoryRecordProducer =
      holders.computeIfAbsent(key, _ => new InMemoryRecordProducer(nShards = 4,
        failWhen = r => {
          val pay = key + "/" + new String(r.data, java.nio.charset.StandardCharsets.UTF_8)
          // every fifth payload (by hash) fails its FIRST attempt only —
          // a deterministic throttled-service model
          math.floorMod(pay.hashCode, 5) == 0 &&
            attempts.merge(pay, 1, (a, b) => a + b) == 1
        }))
    def drop(key: String): Unit = {
      holders.remove(key)
      attempts.keySet.removeIf(_.startsWith(key + "/"))
    }
  }

  /** s05 — the pipeline end-to-end in streaming form: the REAL replay
    * source feeds foreachBatch, which produces every record to the
    * keyed sink with the at-least-once flip ON (retries = 2) while a
    * deterministic fault injector throttles every fifth record's first
    * attempt. The sink's final contents must equal the batch
    * aggregate — converged, no loss, no duplicates (successes are
    * never resent). */
  def s05StreamPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val key = s"s05_${System.nanoTime()}"
    val stream = spark.readStream.format("graft-replay")
      .option("path", s"$dir/events.parquet")
      .option("nanosAsLong", "true")
      .option("tsMillisExpr", tsMillisExpr(eventsTsIsLong(spark, dir)))
      .option("keyExpr", "event_type")
      .option("payloadExpr", "props")
      .option("maxGroupsPerTrigger", "1000000")
      .load()
    val q = stream
      .select(col("partition_key").as("partitionKey"),
        col("payload").cast("binary").as("data"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val leftover = KinesisSink.produce(
          batch, "graft-stream", () => S05.producer(key), retries = 2).count()
        require(leftover == 0,
          s"at-least-once retries must clear transient failures, $leftover left")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = S05.producer(key).records.map { case (_, k, _, data) =>
      (k, new String(data, java.nio.charset.StandardCharsets.UTF_8))
    }
    S05.drop(key)
    spark.createDataset(got).toDF("partition_id", "payload")
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n"), min(col("payload")).as("min_payload"),
        max(col("payload")).as("max_payload"))
      .orderBy(col("partition_id"))
  }

  /** s06 — streaming deduplication (the ingestion-time dedup stage of
    * a training-data pipeline): a file-source stream over the documents
    * table → exact dedup on (lang, text-fingerprint) via
    * `dropDuplicates` → per-lang unique counts, drained with
    * Trigger.AvailableNow. Dedup state is one 8-byte hash per distinct
    * (lang, text) — the bounded-state production variant is
    * `dropDuplicatesWithinWatermark` when an event-time column exists
    * (the documents table has none). Keyed on (lang, fp), not fp, so
    * per-lang counts are deterministic no matter which duplicate
    * survives. */
  def s06StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType)))
    val staged = java.nio.file.Paths.get(PipelineQueries.staging("s06", dir))
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "documents.parquet"),
      staged.resolve("documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
      .select(col("lang"),
        graft.expressions.PolyHash(lower(trim(col("text")))).as("fp"))
      .dropDuplicates("lang", "fp")
    val agg = stream.groupBy(col("lang")).agg(count(lit(1)).as("n_unique"))
    val name = s"s06_out_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(name).orderBy(col("lang"))
  }

  /** s07 — the native top-k aggregate INSIDE Structured Streaming:
    * stream the documents table, keep each language's top-3 longest
    * docs via `graft_top_k` in a complete-mode aggregation. The
    * TypedImperativeAggregate's binary buffer round-trips through the
    * streaming state store between micro-batches — the serialization
    * path a batch-only test never exercises. Oracle = the batch window
    * form. */
  def s07StreamTopK(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType)))
    // stage TWO disjoint halves and admit one file per trigger, so the
    // aggregate state provably round-trips through the state store
    // between micro-batches (a single batch would eval the buffer it
    // just built and never exercise restore+merge)
    val staged = java.nio.file.Paths.get(PipelineQueries.staging("s07", dir))
    stageOnce("s07", dir, Seq(staged.toString)) {
      val docs = Tables.documents(spark, dir)
      val median = docs.count() / 2
      def stageHalf(half: DataFrame, name: String): Unit = {
        val tmp = staged.resolve(s"_stage_$name")
        half.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles(
          (_: java.io.File, n: String) => n.endsWith(".parquet")).head
        java.nio.file.Files.createDirectories(staged)
        java.nio.file.Files.move(part.toPath, staged.resolve(s"$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      stageHalf(docs.filter(col("doc_id") < median), "a")
      stageHalf(docs.filter(col("doc_id") >= median), "b")
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
      .select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"))
    val agg = stream.groupBy(col("lang"))
      .agg(graft.expressions.TopKByScore(col("n_words"), col("doc_id"), 3).as("top"))
    val name = s"s07_out_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(name)
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("n_words"))
      .orderBy(col("lang"), col("rank"))
  }

  /** s08 — stream-stream INTERVAL JOIN as an oracle row (round-3
    * verdict item 6 — previously this semantics lived only in
    * StreamingSpec): click events join purchase events of the same
    * user arriving within the next 30 minutes. Each side streams from
    * its own staged directory in TWO files with one file per trigger,
    * so the join state provably persists across micro-batches — a
    * click from batch 1 must still match a purchase from batch 2.
    * Watermarks bound state retention (the 100 TB property: state =
    * one window of each side, not the whole stream); the delay here is
    * deliberately generous so the drained result is exactly the batch
    * join and the oracle can hash-check it. Late-data DROP semantics
    * stay pinned in StreamingSpec, where nondeterministic arrival is
    * controlled. */
  def s08IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val staged = java.nio.file.Paths.get(PipelineQueries.staging("s08", dir))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    // two disjoint halves per side + maxFilesPerTrigger=1 ⇒ ≥2
    // micro-batches per side crossing the join state store. ONE
    // partitioned write stages all four files (partition columns are
    // stripped from the data files, so the stream schema is unchanged)
    val clickDir = staged.resolve("clicks").toString
    val purchDir = staged.resolve("purchases").toString
    stageOnce("s08", dir, Seq(staged.toString)) {
      val stageTmp = staged.resolve("_stage")
      ev.filter(col("event_type").isin("click", "purchase"))
        .withColumn("half", (col("event_id") % 2).cast("int"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("half"))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("event_type", "half")
        .parquet(stageTmp.toString)
      def stageSide(tag: String, typ: String): Unit = {
        val side = staged.resolve(tag)
        java.nio.file.Files.createDirectories(side)
        Seq(0, 1).foreach { half =>
          val src = stageTmp.resolve(s"event_type=$typ").resolve(s"half=$half")
          // an absent/empty partition means the input has no rows for
          // this (type, half) — fail with the actual problem, not a
          // FileNotFoundException from deep inside the listing
          require(java.nio.file.Files.isDirectory(src),
            s"s08 staging: no '$typ' events with event_id % 2 = $half in $dir")
          val parts = PipelineQueries.parquetFileSizes(spark, src.toString)
          require(parts.nonEmpty,
            s"s08 staging: empty partition for '$typ' half=$half in $dir")
          java.nio.file.Files.move(src.resolve(parts.head._1),
            side.resolve(s"$half.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
      stageSide("clicks", "click")
      stageSide("purchases", "purchase")
    }
    def sideStream(d: String, user: String, id: String, ts: String) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
        .select(col("user_id").as(user), col("event_id").as(id),
          expr("timestamp_micros(ts_us)").as(ts))
        .withWatermark(ts, "3650 days")
    val clicks = sideStream(clickDir, "c_user", "click_id", "c_ts")
    val purchases = sideStream(purchDir, "p_user", "purchase_id", "p_ts")
    val joined = clicks.join(purchases, expr(
      "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"))
    val name = s"s08_out_${System.nanoTime()}"
    // a stream-stream join commits FOUR state stores per shuffle
    // partition per micro-batch (keyed + key-with-index, each side);
    // at 32 partitions × multiple batches that fixed cost dwarfs this
    // data. Scope the partition count down for the streaming query
    // (it is captured in the query's own offset log at start, so the
    // save/restore cannot leak into a concurrent batch plan).
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try joined.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    q.awaitTermination()
    spark.table(name)
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_seconds(col("p_ts")) - unix_seconds(col("c_ts"))).as("lag_s"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** s09 — streaming dedup with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keyed on (event_type, user_id).
    * s06's `dropDuplicates` is exactly correct but keeps every key
    * forever — state grows with the stream; within-watermark is the
    * steady-state form a 100 TB stream actually runs, evicting keys
    * once they age past the watermark horizon. The delay here is
    * generous so the drained result equals the batch distinct count
    * and the oracle can hash it; the EVICTION semantics (a re-arriving
    * key after expiry re-emits) are pinned in StreamingSpec, where
    * arrival order is controlled. */
  def s09StreamDedupBounded(spark: SparkSession, dir: String): DataFrame = {
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try s09Impl(spark, dir)
    finally prevNanos match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  private def s09Impl(spark: SparkSession, dir: String): DataFrame = {
    val tsIsLong = eventsTsIsLong(spark, dir)
    val schema = eventsStreamSchema(tsIsLong)
    val staged = java.nio.file.Paths.get(PipelineQueries.staging("s09", dir))
    stageOnce("s09", dir, Seq(staged.toString)) {
      java.nio.file.Files.createDirectories(staged)
      java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "events.parquet"),
        staged.resolve("events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
      .withColumn("ts", expr(tsNormExpr(tsIsLong)))
      .withWatermark("ts", "3650 days")
      .dropDuplicatesWithinWatermark("event_type", "user_id")
    val agg = stream.groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
    val name = s"s09_out_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(name).orderBy(col("event_type"))
  }

  /** s10 — streaming SESSIONIZATION via `session_window`: the
    * event-time analogue of batch q21, but as a native streaming
    * aggregate whose windows MERGE as events arrive (two touching
    * [ts, ts+gap) spans coalesce into one session in the state store).
    * Session windows only support APPEND mode (Spark 4), and append
    * emits a session only once the watermark passes its end — so the
    * drain stages a SENTINEL flush event (dummy user, ts far past the
    * data, second file via maxFilesPerTrigger=1) whose batch advances
    * the watermark beyond every real session; the real sessions then
    * flush from the state store and the sentinel's own never does
    * (filtered out). This is the textbook watermark-close pattern for
    * draining an append-mode session stream deterministically. Gap
    * rule: a ≥ 30 min silence starts a new session (session_window
    * spans are end-exclusive). Output: per-user session count and
    * largest session. */
  def s10SessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try s10Impl(spark, dir)
    finally prevNanos match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  private def s10Impl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tsIsLong = eventsTsIsLong(spark, dir)
    val schema = eventsStreamSchema(tsIsLong)
    val staged = java.nio.file.Paths.get(PipelineQueries.staging("s10", dir))
    stageOnce("s10", dir, Seq(staged.toString)) {
      java.nio.file.Files.createDirectories(staged)
      val dataFile = staged.resolve("events.parquet")
      java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "events.parquet"),
        dataFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // sentinel: one event a day past the data's max ts, for a user id
      // that cannot occur. Staged as a SECOND file with a LATER mtime so
      // maxFilesPerTrigger=1 processes data first, sentinel second —
      // sentinel-first would mark all real data late and drop it
      val flushTmp = staged.resolve("_flush_tmp")
      val maxTsRow = spark.read.schema(schema).parquet(dataFile.toString)
        .agg(max(col("ts"))).head
      val sentinel =
        if (tsIsLong)
          Seq((-1L, maxTsRow.getLong(0) + 86400L * 1000000000L,
            -1L, "flush", 0.0, ""))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        else
          Seq((-1L, maxTsRow.getAs[java.time.LocalDateTime](0).plusDays(1),
            -1L, "flush", 0.0, ""))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      sentinel.coalesce(1).write.mode("overwrite").parquet(flushTmp.toString)
      val part = PipelineQueries.parquetFileSizes(spark, flushTmp.toString).head._1
      java.nio.file.Files.move(flushTmp.resolve(part), staged.resolve("zz_flush.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dataFile,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
      java.nio.file.Files.setLastModifiedTime(staged.resolve("zz_flush.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      .withColumn("ts", expr(tsNormExpr(tsIsLong)))
      .withWatermark("ts", "1 second")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
    val name = s"s10_out_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(name)
      .filter(col("user_id") >= 0) // drop the sentinel's own session
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  /** s11 — stream-static enrichment join, the shape every streaming
    * fact pipeline runs: the event stream joins a STATIC dimension
    * snapshot (customer ⋈ nation) per micro-batch, then aggregates per
    * nation. The static side is broadcast — at scale the stream only
    * ever streams, the dimension rides the broadcast, and no stream
    * row is shuffled for the join (only the groups×1 agg exchange).
    * Money math routes through DECIMAL(18,4) on both engines so the
    * cross-engine hash holds. */
  def s11StreamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try s11Impl(spark, dir)
    finally prevNanos match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  private def s11Impl(spark: SparkSession, dir: String): DataFrame = {
    val schema = eventsStreamSchema(eventsTsIsLong(spark, dir))
    val staged = java.nio.file.Paths.get(PipelineQueries.staging("s11", dir))
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "events.parquet"),
      staged.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
      .select(col("user_id"), col("value").cast("decimal(18,4)").as("v"))
    val dim = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("user_id"), col("n_name"))
    val agg = stream.join(broadcast(dim), Seq("user_id"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val name = s"s11_out_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(name)
      .select(col("n_name"), col("n"),
        round(col("sv"), 2).cast("double").as("sum_value"))
      .orderBy(col("n_name"))
  }

  /** s12 — foreachBatch idempotent keyed upsert, the exactly-once SINK
    * pattern: the stream is split into four micro-batches
    * (maxFilesPerTrigger=1 over a 4-file staging), each batch's per-key
    * partial aggregate is MERGED into a parquet state table through
    * [[UpsertSink.merge]] — full-outer join on the key, versioned
    * snapshots whose ids double as commit evidence, and a
    * committed-batch ledger so checkpoint replay of a batch after a
    * crash is absorbed instead of double-counted (the replay and
    * crash-window paths are pinned in StreamingSpec). State is one row per
    * distinct key, dimension-scale; each batch touches only its own
    * increments plus that table. */
  def s12ForeachBatchUpsert(spark: SparkSession, dir: String): DataFrame = {
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try s12Impl(spark, dir)
    finally prevNanos match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  private def s12Impl(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(PipelineQueries.staging("s12", dir))
    val staged = root.resolve("in")
    // input fixture staged once; the upsert STATE is per-run mutable
    // (merge is cumulative across batches) so it is deleted fresh —
    // deliberately outside stageOnce
    stageOnce("s12in", dir, Seq(staged.toString)) {
      Tables.events(spark, dir)
        .select(col("event_type"), col("value"))
        .repartition(4) // 4 files → 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite").parquet(staged.toString)
    }
    val stateDir = root.resolve("state").toString
    val hfs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(stateDir), true) // fresh run
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val incr = batch.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,4)")).as("sv"))
          UpsertSink.merge(spark, stateDir, incr, id)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    UpsertSink.readState(spark, stateDir)
      .select(col("key").as("event_type"), col("n"),
        round(col("sv"), 2).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** s13 — the ARBITRARY-STATE API (`transformWithState`, Spark 4):
    * per-user stats kept in TYPED state variables — a ValueState
    * counter, a MapState of seen event types, a ValueState running
    * max ([[graft.streaming.Stateful.UserStatsProcessor]]) — the
    * successor to mapGroupsWithState's single state blob, and the
    * API a long-running keyed enrichment of the reference's telemetry
    * would actually use today. Requires the RocksDB state store
    * (scoped conf): per-variable storage is a state-store-backed
    * column family, not an in-memory map. The events table streams in
    * two MemoryStream chunks so state provably crosses a micro-batch
    * boundary; every emitted stat is order-independent, so the
    * latest emission per key equals the batch aggregate the oracle
    * computes. */
  def s13TransformWithState(spark: SparkSession, dir: String): DataFrame = {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try s13Impl(spark, dir)
    finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None    => spark.conf.unset(confKey)
    }
  }

  private def s13Impl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    import graft.streaming.Stateful
    implicit val sqlCtx = spark.sqlContext
    val total = Tables.events(spark, dir).count()
    val it = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[Stateful.UserEvent].toLocalIterator()
    val mem = MemoryStream[Stateful.UserEvent]
    val out = mem.toDS()
      .groupByKey(_.user_id)
      .transformWithState(new Stateful.UserStatsProcessor,
        TimeMode.None(), OutputMode.Update(),
        Encoders.product[Stateful.UserStats])
    val name = s"s13_${System.nanoTime()}"
    val q = withStreamShuffle(spark, 4) {
      out.writeStream.outputMode("update").format("memory").queryName(name).start()
    }
    // bounded chunks, processed twice (mid + end) — the s03 pattern
    var fed = 0L
    var processedMid = false
    val chunk = new scala.collection.mutable.ArrayBuffer[Stateful.UserEvent](5000)
    while (it.hasNext) {
      chunk.clear()
      while (it.hasNext && chunk.size < 5000) chunk += it.next()
      mem.addData(chunk.toSeq: _*)
      fed += chunk.size
      if (!processedMid && fed >= total / 2) { q.processAllAvailable(); processedMid = true }
    }
    q.processAllAvailable()
    q.stop()
    // stats are monotone across batches: latest emission per key = max
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("n_types")).as("n_types"),
        max(col("max_value")).as("max_value"))
      .orderBy(col("user_id"))
  }

  /** s14 — STREAMING ANN-index ingest: a12's append-only update run as
    * a micro-batched stream, the shape of a vector store's continuous
    * write path (new embeddings arrive → encode → append to the
    * serving index; FAISS `add` per batch). The increment (odd
    * vec_ids, d13's "today" convention) streams in four micro-batches
    * (maxFilesPerTrigger=1); each batch encodes ITS OWN rows against
    * the frozen corpus-trained codebooks ([[AnalyticsQueries
    * .pqEncodeAgainst]] — M argmin assignments per row, the only
    * per-batch cost) and writes the one-byte codes to a
    * batch-id-keyed directory with overwrite semantics, so a
    * checkpoint replay of a batch after a crash rewrites the same
    * files instead of duplicating codes — idempotence by path, the
    * same exactly-once argument as s12's ledger but cheaper (no read
    * side). The persisted corpus index is never touched. The final
    * search — stored corpus codes ∪ streamed increment codes through
    * the a09 ADC + exact re-rank — is algebraically a12's, so the
    * oracle hash pins that micro-batched ingest ≡ one-shot update:
    * batch boundaries must not leak into the index contents. At
    * 100 TB each batch's work is O(batch)×M with everything joined
    * broadcast; the index grows by appended parquet files, no
    * rewrite, no shuffle of existing codes. */
  def s14StreamAnnIngest(spark: SparkSession, dir: String): DataFrame = {
    val stage = AnalyticsQueries.a12CorpusIndexStage(spark, dir)
    val root = java.nio.file.Paths.get(PipelineQueries.staging("s14", dir))
    val staged = root.resolve("in")
    stageOnce("s14in", dir, Seq(staged.toString)) {
      Tables.embeddings(spark, dir).filter(col("vec_id") % 2 === 1)
        .repartition(4) // 4 files → 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite").parquet(staged.toString)
    }
    // per-run ingest target: mutable across batches, so outside stageOnce
    val ingestDir = root.resolve("codes").toString
    val hfs = new org.apache.hadoop.fs.Path(ingestDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(ingestDir), true) // fresh run
    val cbAll = spark.read.parquet(s"$stage/codebooks")
    val inSchema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          AnalyticsQueries.pqEncodeAgainst(AnalyticsQueries.pqSubcodes(batch), cbAll)
            .write.mode("overwrite").parquet(s"$ingestDir/batch=$id")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    val corpusCodes = spark.read.parquet(s"$stage/codes")
    val incCodes = spark.read.parquet(ingestDir)
      .select(corpusCodes.columns.map(col).toIndexedSeq: _*) // drop the batch partition col
    val n = spark.read.parquet(s"$stage/meta").head.getAs[Long]("n")
    val emb = Tables.embeddings(spark, dir)
    val qside = AnalyticsQueries.pqSubcodes(emb.filter(col("vec_id") < 20))
      .withColumnRenamed("vec_id", "query_id")
    AnalyticsQueries.pqAdcTail(spark, dir, corpusCodes.unionByName(incCodes),
      AnalyticsQueries.pqLutsFrom(qside, cbAll),
      math.max(AnalyticsQueries.PqL.toLong, n / 20).toInt)
  }

  /** s15 — streaming DELETES against the stored ANN index (the
    * retraction feed: a GDPR/takedown id stream, the delete half of
    * s14's ingest): tombstone ids arrive over four micro-batches, each
    * appended to the persisted tombstone set as a batch-id-keyed file
    * (idempotent overwrite per batch — checkpoint replay rewrites the
    * same file, so at-least-once delivery yields an exactly-once
    * delete set), and the post-stream search bars the accumulated set
    * from the a15 compacted index via a16's broadcast anti-join. The
    * oracle hash is a16's: however the deletes arrived — one shot or
    * streamed, whatever the batch boundaries — the search must be
    * EXACTLY the same, and no code row is rewritten at delete time.
    * At 100 TB the delete stream is ids-only (8 B/row); each batch's
    * work is one tiny file append, and the standing cost is the
    * broadcast anti-join probe a16 already prices. */
  def s15StreamDeletes(spark: SparkSession, dir: String): DataFrame = {
    val a15 = AnalyticsQueries.a15CompactedStage(spark, dir)
    val root = java.nio.file.Paths.get(PipelineQueries.staging("s15", dir))
    val staged = root.resolve("in")
    stageOnce("s15in", dir, Seq(staged.toString)) {
      Tables.embeddings(spark, dir).filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id"))
        .repartition(4) // 4 files → 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite").parquet(staged.toString)
    }
    // per-run tombstone target: mutable across batches, so outside stageOnce
    val tombDir = root.resolve("tombstones").toString
    val hfs = new org.apache.hadoop.fs.Path(tombDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(tombDir), true) // fresh run
    val inSchema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$tombDir/batch=$id")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    val codes = spark.read.parquet(s"$a15/codes")
      .join(broadcast(spark.read.parquet(tombDir).select(col("vec_id"))),
        Seq("vec_id"), "left_anti")
    val cbAll = spark.read.parquet(s"$a15/codebooks")
    val n = spark.read.parquet(s"$a15/meta").head.getAs[Long]("n")
    val qside = AnalyticsQueries.pqSubcodes(
      Tables.embeddings(spark, dir).filter(col("vec_id") < 20))
      .withColumnRenamed("vec_id", "query_id")
    AnalyticsQueries.pqAdcTail(spark, dir, codes,
      AnalyticsQueries.pqLutsFrom(qside, cbAll),
      math.max(AnalyticsQueries.PqL.toLong, n / 20).toInt)
  }

  /** s16 — STREAMING export with an atomic final commit: p20's
    * manifest-last protocol driven by a stream (the export twin of
    * s14's streamed index ingest — together they close the
    * ingest/export symmetry: p15/s14 in, p20/s16 out). Documents
    * arrive in four micro-batches; each batch is sharded with exactly
    * the batch export's salted hash ([[AnalyticsQueries.shardFrameOf]])
    * and lands as a batch-id-keyed file set (idempotent overwrite per
    * batch — checkpoint replay of a batch re-lands the same bytes
    * instead of duplicating them). The manifest is derived from ALL
    * landed batches and written strictly last, AFTER the stream
    * drains: a crash at any earlier point — mid-batch, between
    * batches, before the manifest — leaves no commit record, and the
    * consumer path refuses the torn export. The registered result is
    * the consumer's reconciliation, hash-gated with p20's own oracle:
    * batch boundaries leave no trace in what the consumer accepts. */
  def s16StreamExport(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(PipelineQueries.staging("s16", dir))
    val staged = root.resolve("in")
    stageOnce("s16in", dir, Seq(staged.toString)) {
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("text"))
        .repartition(4) // 4 files → 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite").parquet(staged.toString)
    }
    // per-run export target: mutable across batches, so outside stageOnce
    val export = root.resolve("export").toString
    val hfs = new org.apache.hadoop.fs.Path(export)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(export), true) // fresh run
    val inSchema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          AnalyticsQueries.shardFrameOf(batch)
            .write.mode("overwrite").partitionBy("shard")
            .parquet(s"$export/data/batch=$id")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    // the commit record: derived from every landed batch, written last
    AnalyticsQueries.shardStats(spark.read.parquet(s"$export/data"))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("checksum"))
      .coalesce(1).write.mode("overwrite").parquet(s"$export/manifest")
    AnalyticsQueries.p20Validate(spark, export)
  }

  /** s17 — STREAMING keyword-index ingest: s14's protocol on the text
    * index (together with a19/a20 the keyword channel now has the full
    * lifecycle the ANN family got in rounds 6–7: build → pruned search
    * → append-only update → streamed ingest). The increment (odd
    * doc_ids) arrives over four micro-batches; each batch is tokenized
    * ONCE and lands two batch-id-keyed artifacts (idempotent overwrite
    * per batch — checkpoint replay re-lands the same bytes): postings
    * for frozen-dictionary terms encoded at ingest (term_id, doc_id,
    * impact — the amortized path), and raw term-vector rows for
    * out-of-vocabulary terms (doc_id, term, tf — per-segment stats
    * can only be finalized once the segment is complete, so OOV
    * encoding happens at search over the accumulated landings, exactly
    * a20's segment-local math). The post-stream search reads stored
    * corpus postings ∪ landed known postings ∪ OOV-encoded landings
    * and is hash-gated with a20's ORACLE: however the increment
    * arrived — one shot or streamed, whatever the batch boundaries —
    * the merged search is exactly the same. */
  def s17StreamKeywordIngest(spark: SparkSession, dir: String): DataFrame = {
    val stage = AnalyticsQueries.a20CorpusKwIndexStage(spark, dir)
    val terms = spark.read.parquet(s"$stage/terms")
    val meta = spark.read.parquet(s"$stage/meta").head
    val (nCorpus, maxTermId) = (meta.getAs[Long]("n"), meta.getAs[Long]("max_term_id"))
    val dictB = broadcast(terms.select(col("term"), col("term_id"), col("idf")))
    val termsOnly = broadcast(terms.select(col("term")))
    val ingest = streamedLandings(spark, dir, "s17", "landed")(
      Tables.documents(spark, dir).filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"))
        .repartition(4)) { (batch, id, landed) =>
      val tfB = batch
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint() // one tokenize per batch, two landings
      tfB.join(dictB, Seq("term"))
        .select(col("term_id"), col("doc_id"),
          (col("tf") * col("idf")).as("impact"))
        .write.mode("overwrite").parquet(s"$landed/known/batch=$id")
      tfB.join(termsOnly, Seq("term"), "left_anti")
        .write.mode("overwrite").parquet(s"$landed/oov/batch=$id")
    }
    val landedKnown = spark.read.parquet(s"$ingest/known")
      .select(col("term_id"), col("doc_id"), col("impact"))
    val landedOov = spark.read.parquet(s"$ingest/oov")
      .select(col("doc_id"), col("term"), col("tf"))
    val oovLocal = AnalyticsQueries.kwOovDict(spark, landedOov, nCorpus, maxTermId)
    val oovPost = landedOov
      .join(broadcast(oovLocal.select(col("term"), col("term_id"), col("idf"))),
        Seq("term"))
      .select(col("term_id"), col("doc_id"), (col("tf") * col("idf")).as("impact"))
    AnalyticsQueries.kwPrunedSearch(spark, dir,
      terms.select(col("term"), col("term_id"), col("df"))
        .unionByName(oovLocal.select(col("term"), col("term_id"), col("df"))),
      spark.read.parquet(s"$stage/postings").unionByName(landedKnown)
        .unionByName(oovPost))
  }

  /** s18 — streamed classifier scoring through the FROZEN t17 model:
    * the filter fleet's steady state as a stream. The staged model
    * (trained once on the even corpus half) is read before the stream
    * starts — five longs, never touched again; each micro-batch of
    * unseen odd-id documents is feature-projected and scored by the
    * codegen'd dot product (a stateless 1:1 transform — T5's shape
    * with a real model inside) and landed under a batch-id-keyed path,
    * so a crash-replayed batch overwrites its own landing
    * idempotently. The post-stream readback is hash-gated with t17's
    * ORACLE: whether the unseen half arrives as one scan or as four
    * micro-batches, the scored output is exactly the same — batch
    * boundaries leave no trace, and no gradient ever runs inside the
    * stream. */
  def s18StreamClassifier(spark: SparkSession, dir: String): DataFrame = {
    val stage = AnalyticsQueries.qualityModelStage(spark, dir)
    val w = spark.read.parquet(s"$stage/model").orderBy(col("j"))
      .collect().map(_.getAs[Long]("w"))
    val scored = streamedLandings(spark, dir, "s18", "scored")(
      Tables.documents(spark, dir).filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"))
        .repartition(4)) { (batch, id, landed) =>
      AnalyticsQueries
        .scoreQuality(AnalyticsQueries.qualityFeaturesOf(batch), w)
        .write.mode("overwrite").parquet(s"$landed/batch=$id")
    }
    spark.read.parquet(scored)
      .select(col("doc_id"), col("score4"), col("pred_keep"),
        col("label_keep"), col("correct"))
      .orderBy(col("doc_id"))
  }

  /** s19 — streamed distribution-drift monitor (the data-quality watch
    * a production ingest runs continuously: "has the language mix of
    * what we're ingesting moved away from the corpus we trained on?").
    * The corpus lang distribution is the FROZEN baseline; the stream
    * carries the same documents tagged into 4 monitoring windows
    * (w = doc_id % 4 — deterministic, so the oracle can reproduce
    * window membership). Each micro-batch lands its per-(window, lang)
    * counts keyed by batch id (idempotent — a replayed batch
    * overwrites its own landing, s12's exactly-once discipline); after
    * the drain, counts SUM across batch landings, so micro-batch
    * boundaries leave no trace in the drift numbers. Per window:
    * per-mille lang distribution (integer DIV — engine-exact), L1
    * distance to baseline, and the alarm bit at 150‰ (≈2× the
    * sampling noise of a 125-doc window over 4 langs, so the alarm
    * discriminates instead of firing on every window). Scale shape:
    * state is (windows × langs) counters — metadata-sized regardless
    * of stream volume; the baseline is computed once and broadcast;
    * nothing per-document survives the micro-batch beyond its counter
    * increments. */
  def s19DriftMonitor(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(PipelineQueries.staging("s19", dir))
    val staged = root.resolve("in")
    stageOnce("s19in", dir, Seq(staged.toString)) {
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), pmod(col("doc_id"), lit(4)).as("w"))
        .repartition(4) // 4 files → 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite").parquet(staged.toString)
    }
    val countsDir = root.resolve("counts").toString
    val hfs = new org.apache.hadoop.fs.Path(countsDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(countsDir), true) // fresh run
    val inSchema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.groupBy(col("w"), col("lang")).agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(s"$countsDir/batch=$id")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    val docs = Tables.documents(spark, dir)
    val tot = docs.count()
    val base = docs.groupBy(col("lang")).agg(count(lit(1)).as("cb"))
    val wc = spark.read.parquet(countsDir)
      .groupBy(col("w"), col("lang")).agg(sum(col("cnt")).as("c"))
    val wn = wc.groupBy(col("w")).agg(sum(col("c")).as("nw"))
    wn.crossJoin(base)
      .join(wc, Seq("w", "lang"), "left")
      .withColumn("pmw", expr("(1000 * coalesce(c, CAST(0 AS BIGINT))) DIV nw"))
      .withColumn("pmb", expr(s"(1000 * cb) DIV CAST($tot AS BIGINT)"))
      .groupBy(col("w"))
      .agg(max(col("nw")).as("n_docs"),
        sum(abs(col("pmw") - col("pmb"))).as("l1_drift3"))
      .select(col("w").cast("long").as("w"), col("n_docs"),
        col("l1_drift3"), (col("l1_drift3") > 150).as("drifted"))
      .orderBy(col("w"))
  }

  /** s20 — the ONLINE SERVING LOOP: queries arrive as a stream and are
    * answered from the FROZEN a19 keyword index — the other half of
    * the index lifecycle (s17 streams writes INTO the index; s20
    * streams reads OUT of it, the request path of a retrieval
    * service). The persisted index is staged before the stream starts
    * and never touched again; each micro-batch of query documents is
    * tokenized, pruned to its [[AnalyticsQueries.KwKeepTerms]] rarest
    * terms against the broadcast stored dictionary, probed as an
    * IN-list against the stored postings, and its ranked top-20 lands
    * under a batch-id-keyed path (idempotent — a crash-replayed batch
    * overwrites its own landing). Queries are independent rows, so the
    * union of per-batch result landings must be ROW-IDENTICAL to the
    * one-shot a19 batch search — the gate runs a19's own oracle, and
    * the spec pins s20 ≡ a19 row for row: batch boundaries leave no
    * trace in what the index serves. Scale shape: per batch the work
    * is the query slice × index-probe only (Σ df over ≤ queries×8
    * terms — corpus-independent, a19's serving economics verbatim);
    * state is zero, landings are results-sized. */
  def s20StreamSearch(spark: SparkSession, dir: String): DataFrame = {
    val stage = AnalyticsQueries.keywordIndexStage(spark, dir)
    val dict = spark.read.parquet(s"$stage/terms")
      .select(col("term"), col("term_id"), col("df"))
    val postings = spark.read.parquet(s"$stage/postings")
    val served = streamedLandings(spark, dir, "s20", "served")(
      Tables.documents(spark, dir).filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
        .repartition(4)) { (batch, id, landed) =>
      val qt = batch
        .select(col("doc_id").as("query_id"),
          explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
        .distinct()
      AnalyticsQueries.kwPrunedSearchFor(spark, qt, dict, postings)
        .write.mode("overwrite").parquet(s"$landed/batch=$id")
    }
    spark.read.parquet(served)
      .select(col("query_id"), col("kw_rank"), col("doc_id"), col("kw_score"))
      .orderBy(col("query_id"), col("kw_rank"))
  }

  /** s21 — streamed multimodal feature extraction: the m-family's
    * streaming twin (every other major family already has one — s14
    * ANN, s17 keyword, s18 classifier, s20 serving). Binary media
    * payloads (the m03/m04 deterministic 16×16 PNG fixture) arrive in
    * four micro-batches; each batch runs the REAL ImageIO
    * decode + nearest-neighbor resize kernel inside the stream (a
    * stateless 1:1 mapPartitions — T5's shape with a real codec
    * inside) and lands its thumbnails batch-id-keyed, so a
    * crash-replayed batch overwrites its own landing idempotently. The
    * readback is hash-gated with m03's ORACLE (which recomputes the
    * sampled pixels arithmetically from the synthesis formula):
    * whether the media arrives as one scan or four micro-batches, the
    * decoded pixels are exactly the same — batch boundaries leave no
    * trace in decoded output, and the decoder holds no cross-batch
    * state. Scale shape: per-batch cost is decode-only (narrow, no
    * shuffle inside the batch); this is the backfill-vs-streaming
    * equivalence a multimodal ingest needs before it can trust
    * incremental processing. */
  def s21StreamMultimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val thumbs = streamedLandings(spark, dir, "s21", "thumbs")(
      Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .repartition(4) // decode distributes over the 4 batch files
        .mapPartitions(_.map(id =>
          (id, graft.operators.Multimodal.synthPng(id, 16, 16))))
        .toDF("media_id", "payload")) { (batch, id, landed) =>
      graft.operators.Multimodal.decodeResizeNearest(batch, stride = 4).toDF()
        .write.mode("overwrite").parquet(s"$landed/batch=$id")
    }
    spark.read.parquet(thumbs)
      .select(col("media_id"), col("width"), col("height"),
        col("out_w"), col("out_h"), col("checksum"))
      .orderBy(col("media_id"))
  }

  /** s24 — streamed image-hash INGEST + near-dup serving: m09's
    * build/serve split with the build arriving as a STREAM (the
    * s14/s17 landing protocol on the media channel — ANN, keyword,
    * and now perceptual-hash indexes all ingest the same way). The
    * m03/m04 16×16 PNG fixture arrives in four micro-batches; each
    * batch pays its ImageIO decode ONCE inside the stream (the only
    * time pixels are touched — exactly m09's decode-at-ingest moment)
    * and lands its 24-byte (media_id, hash_hi, hash_lo) rows
    * batch-id-keyed, so a crash-replayed batch overwrites its own
    * landing idempotently. After the drain the landed table IS the
    * m09 hash index: the readback runs the same exact-cluster →
    * banded-Hamming tail ([[AnalyticsQueries.nearDupFromHashes]]) and
    * is hash-gated with m07's ORACLE — one-shot decode, prebuilt
    * index, or four streamed batches must leave no trace in the
    * near-dup output. Per-batch cost is decode-only (narrow, no
    * shuffle inside the batch); the landing is index-scale, not
    * pixel-scale. */
  def s24StreamImageHashIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = streamedLandings(spark, dir, "s24", "hashes")(
      Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .repartition(4) // decode distributes over the 4 batch files
        .mapPartitions(_.map(id =>
          (id, graft.operators.Multimodal.synthPng(id, 16, 16))))
        .toDF("media_id", "payload")) { (batch, id, landed) =>
      graft.operators.Multimodal.aHash8(batch).toDF()
        .select(col("media_id"), col("hash_hi"), col("hash_lo"))
        .write.mode("overwrite").parquet(s"$landed/batch=$id")
    }
    AnalyticsQueries.nearDupFromHashes(
      spark.read.parquet(hashes)
        .select(col("media_id"), col("hash_hi"), col("hash_lo")))
  }

  /** s25 — streamed token-hash INGEST for the late-interaction index:
    * the s14/s17/s24 landing protocol on the token channel, closing
    * the last index-lifecycle asymmetry (ANN, keyword, image-hash,
    * and now token-hash indexes all build → serve → append → stream).
    * The increment (odd doc_ids) arrives over four micro-batches;
    * each batch is tokenized + polyHashed ONCE — the only moment text
    * is touched, a28's decode-at-ingest economics — and lands its
    * (doc_id, th) rows batch-id-keyed, so a crash-replayed batch
    * overwrites its own landing idempotently (at-least-once replay
    * re-lands the same bytes). Because a token-hash row is a pure
    * per-doc function there are no cross-document statistics to
    * finalize (no OOV segment, no frozen idf): base ∪ landings is
    * EXACTLY the full inline index, so the post-stream MaxSim
    * readback hash-gates against a27's ORACLE — one-shot append (a30)
    * or four streamed batches, the merged search is identical and
    * batch boundaries leave no trace. Per-batch cost is
    * tokenize-only (narrow, no shuffle inside the batch); the landing
    * is index-scale (~72 bytes/doc), not text-scale. */
  def s25StreamTokenHashIngest(spark: SparkSession, dir: String): DataFrame = {
    val base = AnalyticsQueries.a30TokenBaseStage(spark, dir)
    val ingest = streamedLandings(spark, dir, "s25", "landed")(
      Tables.documents(spark, dir).filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"))
        .repartition(4)) { (batch, id, landed) =>
      batch.select(col("doc_id"),
          AnalyticsQueries.tokHashes(col("text")).as("th"))
        .write.mode("overwrite").parquet(s"$landed/batch=$id")
    }
    val t = spark.read.parquet(s"$base/tokens")
      .unionByName(spark.read.parquet(ingest).select(col("doc_id"), col("th")))
    AnalyticsQueries.maxSimTail(
      t.select(col("doc_id"), col("th").as("dh")),
      t.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("th").as("qh")))
  }

  /** s26 — the COMPOSED serving stack under a STREAMED query load:
    * s20's frozen-index serving loop run over the whole modern stack
    * instead of the bare keyword channel. Queries arrive over four
    * micro-batches; each batch runs the full a31 composition against
    * the four FROZEN stored indexes — keyword shortlist (depth 50)
    * from the inverted index, RRF fusion with the stored-IVF-PQ
    * ranks, MMR diversification, MaxSim re-rank from the token-hash
    * table — and lands its final ranking batch-id-keyed (idempotent
    * overwrite on replay). Nothing is built inside the stream: every
    * per-batch cost is a query-batch-scale probe of a stored artifact
    * (the batch's ids push as IN-lists onto the vector, embedding,
    * and token layouts — [[AnalyticsQueries.servingStackStagesFor]]).
    * Every stage of the stack is per-query decomposable, so the
    * union of per-batch landings must be row-identical to the
    * one-shot a31 — batch boundaries leave no trace in what the
    * indexes serve, and the gate is a31's ORACLE, which replays all
    * four chains inline. */
  def s26StreamStackServing(spark: SparkSession, dir: String): DataFrame = {
    val served = streamedLandings(spark, dir, "s26", "served")(
      Tables.documents(spark, dir).filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"))
        .repartition(4)) { (batch, id, landed) =>
      val stages = AnalyticsQueries.servingStackStagesFor(spark, dir,
        batch.select(col("doc_id"), col("text")))
      stages.dropRight(1).foreach(_._2()) // shortlist → fuse → diversify
      stages.last._2()
        .write.mode("overwrite").parquet(s"$landed/batch=$id")
    }
    // each batch's stack construction released the previous batch's
    // pinned intermediates (ServingPins generations); the landing
    // write above consumed the last batch's, so drop it too
    AnalyticsQueries.ServingPins.release(s"stack:$dir")
    spark.read.parquet(served)
      .select(col("query_id"), col("rank"), col("doc_id"), col("ms_score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s27 — streamed query load on the BARE VECTOR channel: s20's
    * frozen-index serving loop pointed at the IVF-PQ index (the last
    * channel whose serve side had no streamed twin — s14 streams
    * writes INTO this index; s27 streams reads OUT of it). The stage
    * is frozen before the stream starts; query ids then arrive over
    * four micro-batches, and each batch probes the stored artifacts
    * through [[AnalyticsQueries.a13SearchFor]] — the batch's ids push
    * onto the query-side embedding scan, drive the probe assignment
    * against the broadcast stored centroids, and everything
    * downstream (ADC over probed cells, exact top-5 re-rank) is a13's
    * serving algebra verbatim. Nothing is built inside the stream;
    * per-batch cost is the batch's probes × cell mass, corpus-coupled
    * only through the stored layout exactly as a13 is. Queries are
    * independent rows (probes, LUT scoring, and re-rank are all
    * per-query), so the union of batch landings must be ROW-IDENTICAL
    * to the one-shot a13 — the gate is a13's own oracle (the full
    * inline IVF-PQ CTE chain), and the spec pins s27 ≡ a13 row for
    * row: batch boundaries leave no trace in what the index serves. */
  def s27StreamVectorServing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    AnalyticsQueries.ivfIndexStage(spark, dir) // freeze before streaming
    val served = streamedLandings(spark, dir, "s27", "served")(
      Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
        .select(col("vec_id"))
        .repartition(4)) { (batch, id, landed) =>
      // batch-scale metadata collect (≤ the micro-batch size): the id
      // list becomes the pushed query predicate on the stored layouts
      val ids = batch.select(col("vec_id")).as[Long].collect().sorted.toSeq
      AnalyticsQueries.a13SearchFor(spark, dir, col("vec_id").isin(ids: _*))
        .write.mode("overwrite").parquet(s"$landed/batch=$id")
    }
    spark.read.parquet(served)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s22 — streamed ingest decontamination guard (d14's streaming
    * twin, pointed the PRODUCTION direction): d09/d14 audit a frozen
    * corpus for eval overlap after the fact; the guard a training
    * ingest actually runs sits ON the stream and flags contaminated
    * TRAIN docs before they reach the corpus. The eval benchmark
    * (doc_id ≡ 0 mod 10) is frozen batch-side into two artifacts — a
    * 2²⁰-bit Bloom over its shingles (the constant-size sketch that
    * rides into every micro-batch as a codegen'd scan predicate) and
    * the exact eval vocabulary (benchmark-sized, so broadcastable at
    * any corpus scale) for the verify join. Train docs arrive over
    * four micro-batches; per batch, per-doc eval-overlap counts run
    * Bloom-first — only the surviving sliver reaches the exact
    * broadcast join, d14's economics paid per micro-batch — and land
    * batch-id-keyed (idempotent overwrite: at-least-once replay
    * re-lands the same verdicts instead of duplicating them). A doc
    * with ≥10% eval-shingle overlap is `quarantined` — what a real
    * pipeline diverts to review instead of training on. The oracle
    * recomputes per-train-doc overlap from the base table in ONE
    * shot: Bloom false positives die in the exact join, and batch
    * boundaries leave no trace in the landed verdicts. */
  def s22StreamDecontamGuard(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.{BloomAgg, BloomContains, WordShingleHashes}
    val sets0 = Tables.documents(spark, dir).select(col("doc_id"),
      WordShingleHashes(col("text"), 4).as("hv"))
    val isEval = pmod(col("doc_id"), lit(10)) === 0
    // frozen eval artifacts: constant-size sketch + exact vocabulary
    val filterBytes = sets0.filter(isEval)
      .select(explode(col("hv")).as("h"))
      .agg(BloomAgg(col("h"), numBits = 1 << 20, numHashes = 5).as("f"))
      .head.getAs[Array[Byte]]("f")
    val evalVocab = sets0.filter(isEval)
      .select(explode(col("hv")).as("h")).distinct()
      .localCheckpoint() // frozen once; every micro-batch probes it
    val root = java.nio.file.Paths.get(PipelineQueries.staging("s22", dir))
    val staged = root.resolve("in")
    stageOnce("s22in", dir, Seq(staged.toString)) {
      Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(10)) =!= 0)
        .select(col("doc_id"), col("text"))
        .repartition(4) // 4 files → 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite").parquet(staged.toString)
    }
    val landed = root.resolve("verdicts").toString
    val hfs = new org.apache.hadoop.fs.Path(landed)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(landed), true) // fresh run
    val inSchema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val sets = batch.select(col("doc_id"),
            WordShingleHashes(col("text"), 4).as("hv"))
            .filter(size(col("hv")) > 0)
          val hits = sets.select(col("doc_id"), explode(col("hv")).as("h"))
            .filter(BloomContains(lit(filterBytes), col("h")))
            .join(broadcast(evalVocab), Seq("h"))
            .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
          sets.select(col("doc_id"), size(col("hv")).cast("long").as("n_shingles"))
            .join(hits, Seq("doc_id"), "left")
            .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
            .write.mode("overwrite").parquet(s"$landed/batch=$id")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.read.parquet(landed)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap") * 10 >= col("n_shingles")).as("quarantined"))
      .orderBy(col("doc_id"))
  }

  /** s23 — streamed heavy hitters: q41's mergeable-summaries property
    * exercised ACROSS micro-batch boundaries (the property Agarwal et
    * al.'s merge exists for — per-shard/per-day summaries that combine
    * later). Documents arrive over four micro-batches; each batch
    * folds its bigrams into its OWN ≤64-entry Misra–Gries summary and
    * lands it batch-id-keyed (term, residual cnt, batch item count —
    * idempotent overwrite, so checkpoint replay re-lands the same
    * summary). After the stream drains, the landed summaries are
    * re-merged IN BATCH-ID ORDER through the same PODS'12 merge the
    * shuffle path uses, and the merged candidates are exactly
    * recounted over the full corpus — q41's tail. MG's merged
    * guarantee (no true heavy hitter lost, however the stream was
    * batched) makes the final table independent of batch boundaries:
    * it is hash-gated with q41's ORACLE, exact counts included. Per
    * batch the landing is ≤ 64 rows — the constant-size artifact a
    * real per-shard frequency monitor ships.
    *
    * Like q41, the post-drain re-merge is a deliberate bounded driver
    * hop: the `collect()` below reads the LANDED SUMMARIES (≤ 64 rows
    * × batches — metadata, not corpus data) so the batch-ordered
    * PODS'12 merge can run locally and feed job 2 an IN-list; the
    * exact recount then scans the corpus distributed, same as q41. */
  def s23StreamHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.{MGSummary, MisraGries}
    val root = java.nio.file.Paths.get(PipelineQueries.staging("s23", dir))
    val staged = root.resolve("in")
    stageOnce("s23in", dir, Seq(staged.toString)) {
      Tables.documents(spark, dir).filter(length(col("text")) >= 2)
        .select(col("doc_id"), col("text"))
        .repartition(4) // 4 files → 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite").parquet(staged.toString)
    }
    val landed = root.resolve("summaries").toString
    val counts = root.resolve("counts").toString
    val hfs = new org.apache.hadoop.fs.Path(landed)
      .getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(new org.apache.hadoop.fs.Path(landed), true) // fresh run
    hfs.delete(new org.apache.hadoop.fs.Path(counts), true)
    val inSchema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = withStreamShuffle(spark, 4) {
      stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          import batch.sparkSession.implicits._
          val bigrams = batch.select(explode(transform(
            sequence(lit(1), length(col("text")) - 1),
            i => col("text").substr(i, lit(2)))).as("bigram"))
          val row = bigrams
            .agg(MisraGries(col("bigram"), 64).as("cand"), count(lit(1)).as("n"))
            .head
          row.getSeq[org.apache.spark.sql.Row](0)
            .map(e => (e.getString(0), e.getLong(1), row.getLong(1)))
            .toDF("term", "cnt", "n_batch")
            .coalesce(1).write.mode("overwrite").parquet(s"$landed/batch=$id")
          // the batch item count lands as its OWN single-row artifact:
          // a batch whose MG summary drains to empty still contributes
          // its n to the heavy-hitter threshold (an empty summaries
          // landing would silently drop it)
          Seq(row.getLong(1)).toDF("n_batch")
            .coalesce(1).write.mode("overwrite").parquet(s"$counts/batch=$id")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    // re-merge the landed summaries in batch-id order through the same
    // PODS'12 merge the shuffle path uses; total n = Σ per-batch counts
    val lan = spark.read.parquet(landed)
      .select(col("batch").cast("long").as("batch"), col("term"),
        col("cnt"), col("n_batch"))
      .collect()
    val merged = new MGSummary(64)
    lan.map(_.getLong(0)).distinct.sorted.foreach { b =>
      val s = new MGSummary(64)
      lan.filter(_.getLong(0) == b).foreach(r =>
        s.counts.put(r.getString(1), r.getLong(2)))
      merged.mergeFrom(s)
    }
    // total n from the per-batch count artifacts, NOT the summary
    // rows — independent of summary occupancy
    val n = spark.read.parquet(counts)
      .agg(sum(col("n_batch"))).head.getLong(0)
    val cands = merged.sortedEntries.map(_._1).toSeq
    // q41's exact-recount tail over the full corpus
    Tables.documents(spark, dir).filter(length(col("text")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))).as("bigram"))
      .filter(col("bigram").isin(cands: _*))
      .groupBy(col("bigram")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 64 > n)
      .withColumn("n_total", lit(n))
      .orderBy(col("freq").desc, col("bigram"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s26_stream_stack_serving" -> s26StreamStackServing _,
    "s27_stream_vector_serving" -> s27StreamVectorServing _,
    "s25_stream_token_hash_ingest" -> s25StreamTokenHashIngest _,
    "s24_stream_image_hash_ingest" -> s24StreamImageHashIngest _,
    "s23_stream_heavy_hitters" -> s23StreamHeavyHitters _,
    "s22_stream_decontam_guard" -> s22StreamDecontamGuard _,
    "s21_stream_multimodal" -> s21StreamMultimodal _,
    "s20_stream_search" -> s20StreamSearch _,
    "s19_drift_monitor" -> s19DriftMonitor _,
    "s18_stream_classifier" -> s18StreamClassifier _,
    "s17_stream_keyword_ingest" -> s17StreamKeywordIngest _,
    "s16_stream_export" -> s16StreamExport _,
    "s15_stream_deletes" -> s15StreamDeletes _,
    "s14_stream_ann_ingest" -> s14StreamAnnIngest _,
    "s13_transform_with_state" -> s13TransformWithState _,
    "s12_foreachbatch_upsert" -> s12ForeachBatchUpsert _,
    "s11_stream_static_join" -> s11StreamStaticJoin _,
    "s01_replay_sink"  -> s01ReplaySink _,
    "s02_stream_window" -> s02StreamWindow _,
    "s03_stateful_counts" -> s03StatefulCounts _,
    "s04_replay_source" -> s04ReplaySource _,
    "s05_stream_pipeline" -> s05StreamPipeline _,
    "s06_stream_dedup" -> s06StreamDedup _,
    "s07_stream_topk" -> s07StreamTopK _,
    "s08_interval_join" -> s08IntervalJoin _,
    "s09_stream_dedup_bounded" -> s09StreamDedupBounded _,
    "s10_session_window" -> s10SessionWindow _,
  )

  val oracleSql: Map[String, String] = Map(
    // queries are independent rows, so the streamed serving loop must
    // be indistinguishable from the one-shot a19 search — the SAME
    // oracle hash pins that batch boundaries leave no trace in the
    // results the frozen index serves
    "s20_stream_search" -> AnalyticsQueries.oracleSql("a19_keyword_search_prebuilt"),
    // every stage of the composed stack is per-query decomposable, so
    // four query micro-batches against the frozen indexes must union
    // to exactly the one-shot composition — a31's full-stack oracle
    // (all four chains replayed inline) pins the streamed serve
    "s26_stream_stack_serving" -> AnalyticsQueries.oracleSql("a31_stack_served"),
    // probes, ADC scoring, and the exact re-rank are all per-query, so
    // four query micro-batches against the frozen IVF-PQ index must
    // union to exactly the one-shot a13 — the SAME inline-CTE oracle
    // pins that batch boundaries leave no trace in vector serving
    "s27_stream_vector_serving" ->
      AnalyticsQueries.oracleSql("a13_ivfpq_search_prebuilt"),
    // token hashes are a pure per-doc function, so base ∪ streamed
    // landings is EXACTLY the full inline index — the SAME oracle
    // hash pins a27 (inline), a28 (prebuilt), a30 (one-shot append),
    // and s25 (streamed append): four arrival shapes, one answer
    "s25_stream_token_hash_ingest" -> AnalyticsQueries.oracleSql("a27_maxsim_rerank"),
    // perceptual hashes are a pure function of the pixels, so the
    // streamed batch-id-keyed landings re-clustered after the drain
    // must be indistinguishable from m07's one-shot decode (and m09's
    // prebuilt index) — the SAME oracle hash pins all three channels
    "s24_stream_image_hash_ingest" -> AnalyticsQueries.oracleSql("m07_image_neardup"),
    // MG's merged guarantee makes the exact-recounted heavy hitters
    // independent of how the stream was batched — the SAME oracle as
    // the one-shot q41, exact counts included
    "s23_stream_heavy_hitters" -> AdvancedQueries.oracleSql("q41_heavy_hitters"),
    // the guard's verdicts recomputed in one shot from the base table
    // (d09's shingle CTE, probe direction reversed: per-TRAIN-doc
    // overlap against the eval vocabulary) — Bloom false positives die
    // in the exact join and batch boundaries leave no trace, so the
    // streamed landings must hash-match this batch recompute
    "s22_stream_decontam_guard" ->
      s"""WITH hs AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(string_split_regex(trim(text), '\\s+'))-3),
         |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, length(array_to_string(
         |        string_split_regex(trim(text), '\\s+')[i:i+3], ' '))+1),
         |        _pc -> unicode(substring(array_to_string(
         |          string_split_regex(trim(text), '\\s+')[i:i+3], ' '), _pc, 1)))),
         |      (_pa,_pb) -> (_pa*31+_pb) % 1000000007))) AS hv
         |  FROM documents),
         |tr AS (SELECT doc_id, hv, len(hv) AS n_shingles FROM hs
         |  WHERE doc_id % 10 <> 0 AND len(hv) > 0),
         |ev AS (SELECT DISTINCT unnest(hv) AS h FROM hs WHERE doc_id % 10 = 0),
         |probe AS (SELECT doc_id, unnest(hv) AS h FROM tr),
         |c AS (SELECT probe.doc_id, COUNT(*) AS n_overlap
         |  FROM probe JOIN ev USING (h) GROUP BY 1)
         |SELECT tr.doc_id, tr.n_shingles,
         |  COALESCE(c.n_overlap, 0) AS n_overlap,
         |  COALESCE(c.n_overlap, 0) * 10 >= tr.n_shingles AS quarantined
         |FROM tr LEFT JOIN c USING (doc_id) ORDER BY tr.doc_id""".stripMargin,
    // the decoder holds no cross-batch state, so streamed decode must
    // be indistinguishable from the one-shot m03 — the SAME oracle
    // (arithmetic pixel recompute) pins it
    "s21_stream_multimodal" -> AnalyticsQueries.oracleSql("m03_resize"),
    // s14's search over corpus∪streamed-increment codes is
    // algebraically a12's one-shot update: the SAME oracle hash pins
    // that micro-batch boundaries leave no trace in the index
    "s14_stream_ann_ingest" -> AnalyticsQueries.oracleSql("a12_pq_index_update"),
    // s17 must be indistinguishable from the one-shot a20 update: same
    // frozen-dictionary impacts, same segment-local OOV stats, same
    // pruned search — batch boundaries leave no trace
    "s17_stream_keyword_ingest" -> AnalyticsQueries.oracleSql("a20_keyword_index_update"),
    // s18's streamed scoring must equal t17's one-shot apply: the SAME
    // oracle hash pins that micro-batch boundaries leave no trace in
    // the scores the frozen model serves
    "s18_stream_classifier" -> AnalyticsQueries.oracleSql("t17_classifier_apply"),
    // the drift numbers summed across batch landings must equal the
    // batch twin computed directly from the table — window membership
    // (doc_id % 4) is deterministic, so the oracle reproduces it
    "s19_drift_monitor" ->
      """WITH d AS (SELECT doc_id % 4 AS w, lang FROM documents),
        |base AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |wc AS (SELECT w, lang, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY w, lang),
        |wn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS nw FROM d GROUP BY w),
        |j AS (SELECT a.w, a.nw, a.lang,
        |    (1000 * COALESCE(wc.c, 0)) // a.nw AS pmw,
        |    (1000 * a.cb) // a.n AS pmb
        |  FROM (SELECT wn.w, wn.nw, base.lang, base.cb, tot.n
        |        FROM wn CROSS JOIN base CROSS JOIN tot) a
        |  LEFT JOIN wc ON wc.w = a.w AND wc.lang = a.lang)
        |SELECT CAST(w AS BIGINT) AS w, CAST(MAX(nw) AS BIGINT) AS n_docs,
        |  CAST(SUM(ABS(pmw - pmb)) AS BIGINT) AS l1_drift3,
        |  CAST(SUM(ABS(pmw - pmb)) AS BIGINT) > 150 AS drifted
        |FROM j GROUP BY w ORDER BY w""".stripMargin,
    // s15's post-stream search is algebraically a16's soft-delete
    // search: the SAME oracle hash pins that delete batch boundaries
    // leave no trace in what search can see
    "s15_stream_deletes" -> AnalyticsQueries.oracleSql("a16_tombstone_search"),
    // the streamed export must reconcile exactly like the batch one:
    // batch boundaries leave no trace in what the consumer accepts
    "s16_stream_export" -> AnalyticsQueries.oracleSql("p20_export_manifest"),
    // max_value is a raw stored double (no arithmetic), so the hash
    // compare is exact
    "s13_transform_with_state" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types, MAX(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "s12_foreachbatch_upsert" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "s11_stream_static_join" ->
      """SELECT n_name, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s01_replay_sink" ->
      """SELECT event_type AS partition_id,
        |  COUNT(*) AS n, MIN(props) AS min_payload, MAX(props) AS max_payload
        |FROM events GROUP BY event_type ORDER BY partition_id""".stripMargin,
    "s02_stream_window" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "s03_stateful_counts" ->
      """SELECT event_type, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s04_replay_source" ->
      """SELECT event_type AS partition_id,
        |  COUNT(*) AS n, MIN(props) AS min_payload, MAX(props) AS max_payload
        |FROM events GROUP BY event_type ORDER BY partition_id""".stripMargin,
    // delivered-exactly despite injected transient failures → the sink
    // holds precisely the events table
    "s05_stream_pipeline" ->
      """SELECT event_type AS partition_id,
        |  COUNT(*) AS n, MIN(props) AS min_payload, MAX(props) AS max_payload
        |FROM events GROUP BY event_type ORDER BY partition_id""".stripMargin,
    // streaming dedup must agree with the batch distinct count
    "s06_stream_dedup" ->
      """SELECT lang, COUNT(DISTINCT lower(trim(text))) AS n_unique
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // streaming top-k state must agree with the batch window form
    "s07_stream_topk" ->
      """WITH s AS (SELECT lang, doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words
        |  FROM documents),
        |r AS (SELECT lang, doc_id, n_words,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_words DESC, doc_id) AS rank
        |  FROM s)
        |SELECT lang, rank, doc_id, n_words FROM r WHERE rank <= 3
        |ORDER BY lang, rank""".stripMargin,
    // the drained stream-stream interval join must equal the batch
    // interval join (whole-second timestamps, so lag_s is exact)
    "s08_interval_join" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        |  date_diff('second', a.ts, b.ts) AS lag_s
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |ORDER BY a.user_id, click_id, purchase_id""".stripMargin,
    // bounded-state dedup drained within one watermark horizon must
    // equal the batch distinct count
    "s09_stream_dedup_bounded" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // lag-based sessionization with the same >= 30 min split rule as
    // session_window's end-exclusive spans (testdata has no gap of
    // exactly 30 min, so the boundary convention is unambiguous)
    "s10_session_window" ->
      """WITH o AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM o),
        |g AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
