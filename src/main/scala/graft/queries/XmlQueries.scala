package graft.queries

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators._
import graft.sources.{GreedyBatcher, TarCodec}

/** Oracle-checkable exercises of the XML operator suite (SURVEY §2.1-2.6).
  *
  * The reference's inputs are XML documents; the driver testdata is
  * parquet. Each query here synthesizes XML *deterministically from the
  * testdata tables with codegen'd expressions*, runs it through the real
  * operators (tokenizer → flattener → wide projection → envelope/lambda),
  * and projects back scalar columns whose expected values the DuckDB
  * oracle recomputes directly from the tables. This makes the XML path a
  * hash-checked roundtrip rather than a rows-only smoke test.
  *
  * Numeric fidelity: doubles travel as exact cents
  * (CAST(ROUND(value*100) AS BIGINT)) and timestamps as epoch
  * microseconds, so no float formatting is hash-compared.
  */
object XmlQueries {

  private val SignalNsDecl = "xmlns:NS1=\"http://uptake.com/bhp/1/sensors\""

  /** Signal XML synth shared by x01/x03/x06/x09: one doc per event row. */
  private def signalDoc(extraReadings: Column): Column =
    concat(
      format_string(
        s"""<NS1:message $SignalNsDecl><NS1:messagePayload>""" +
          "<NS1:vehicleIdentifier>V%s</NS1:vehicleIdentifier>" +
          "<NS1:typeOfReading>%s</NS1:typeOfReading>" +
          "<NS1:readingTimestampUTC>%s</NS1:readingTimestampUTC>" +
          "<NS1:readingCollection>" +
          "<NS1:reading><NS1:attributeName>RMSTotalDB</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue></NS1:reading>" +
          "<NS1:reading><NS1:attributeName>speed</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue><NS1:attributeUoM>km/h</NS1:attributeUoM></NS1:reading>",
        col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).cast("string"),
        round(col("value") * 100).cast("long").cast("string"),
        col("event_id").cast("string")),
      extraReadings,
      lit("</NS1:readingCollection></NS1:messagePayload></NS1:message>"))

  /** x01 — U1+U2+V1+P4 end-to-end: events → signal XML docs →
    * compacted multi-doc strings (grouped, bounded ~500 docs/blob) →
    * tokenize → flatten → fixed wide projection. */
  def x01SignalRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val docs = ev.select(
      // DIV keeps docs-per-blob bounded (≤500) as data grows; a modulo
      // would instead bound the blob COUNT and grow each blob linearly
      col("event_type"), (col("event_id") / 500).cast("long").as("grp"),
      signalDoc(lit("")).as("doc"))
    val compacted = docs.groupBy(col("event_type"), col("grp"))
      .agg(concat_ws("\n", collect_list(col("doc"))).as("content"))
    val tokenized = Tokenizer.tokenize(compacted, col("content"), SignalFlattener.endTag)
    val flat = FlattenOps.flattenStrict(tokenized, "xml", SignalFlattener, Nil)
    val cols = Seq("vehicleIdentifier", "typeOfReading", "readingTimestampUTC",
      "RMSTotalDB", "speed", "speed_UoM")
    WideColumns.project(flat, "fields", cols)
      .orderBy(cols.map(col): _*)
  }

  /** x02 — optional collection + null scalars: odd events have no
    * readingCollection; readingLocation is an empty element (→ null). */
  def x02SignalNulls(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val doc = concat(
      format_string(
        s"""<NS1:message $SignalNsDecl><NS1:messagePayload>""" +
          "<NS1:vehicleIdentifier>V%s</NS1:vehicleIdentifier>" +
          "<NS1:readingLocation></NS1:readingLocation>" +
          "<NS1:eventKey>%s</NS1:eventKey>",
        col("user_id"), col("event_id").cast("string")),
      when(col("event_id") % 2 === 0, format_string(
        "<NS1:readingCollection><NS1:reading>" +
          "<NS1:attributeName>RMSTotalDB</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue>" +
          "</NS1:reading></NS1:readingCollection>",
        round(col("value") * 100).cast("long").cast("string"))).otherwise(lit("")),
      lit("</NS1:messagePayload></NS1:message>"))
    val flat = FlattenOps.flattenStrict(ev.select(doc.as("doc")), "doc", SignalFlattener, Nil)
    WideColumns.project(flat, "fields",
      Seq("eventKey", "vehicleIdentifier", "readingLocation", "RMSTotalDB"))
      .orderBy(length(col("eventKey")), col("eventKey")) // numeric-safe string order
  }

  /** x03 — V3 duplicate-key last-writer-wins: reading `v` appears twice;
    * the later (event_id) value must win. */
  def x03DupLastWins(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val doc = format_string(
      s"""<NS1:message $SignalNsDecl><NS1:messagePayload>""" +
        "<NS1:eventKey>%s</NS1:eventKey>" +
        "<NS1:readingCollection>" +
        "<NS1:reading><NS1:attributeName>v</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue></NS1:reading>" +
        "<NS1:reading><NS1:attributeName>v</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue></NS1:reading>" +
        "</NS1:readingCollection></NS1:messagePayload></NS1:message>",
      col("event_id").cast("string"),
      round(col("value") * 100).cast("long").cast("string"),
      col("event_id").cast("string"))
    val flat = FlattenOps.flattenStrict(ev.select(doc.as("doc")), "doc", SignalFlattener, Nil)
    WideColumns.project(flat, "fields", Seq("eventKey", "v"))
      .orderBy(length(col("eventKey")), col("eventKey"))
  }

  /** x04 — U3+U4+U5+V2+U6: a 3-level component tree per region
    * (region → nations → suppliers), flattened with recursive unnest,
    * parent_code adjacency, root-attr broadcast, 1-child null
    * attributes, and the dynamic (two-pass) wide schema-union. */
  def x04ComponentTree(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir).select(
      col("s_nationkey"),
      format_string(
        "<NS1:component><NS1:componentCode>S_%s</NS1:componentCode>" +
          "<NS1:serialNumber>SS_%s</NS1:serialNumber></NS1:component>",
        col("s_suppkey").cast("string"), col("s_suppkey").cast("string")).as("frag"))
    val supAgg = sup.groupBy(col("s_nationkey"))
      .agg(concat_ws("", collect_list(col("frag"))).as("subs"))
    val nat = Tables.nation(spark, dir)
      .join(supAgg, col("n_nationkey") === col("s_nationkey"), "left")
      .select(col("n_regionkey"), concat(
        format_string(
          "<NS1:component><NS1:componentCode>N_%s</NS1:componentCode>" +
            "<NS1:componentAttributeCollection>" +
            "<NS1:attribute><NS1:attributeName>nname</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue></NS1:attribute>" +
            "<NS1:attribute><NS1:attributeName>decom</NS1:attributeName></NS1:attribute>" +
            "</NS1:componentAttributeCollection>",
          col("n_nationkey").cast("string"), col("n_name")),
        when(col("subs").isNotNull && length(col("subs")) > 0,
          concat(lit("<NS1:subcomponentCollection>"), col("subs"), lit("</NS1:subcomponentCollection>")))
          .otherwise(lit("")),
        lit("</NS1:component>")).as("frag"))
    val natAgg = nat.groupBy(col("n_regionkey"))
      .agg(concat_ws("", collect_list(col("frag"))).as("subs"))
    val doc = Tables.region(spark, dir)
      .join(natAgg, col("r_regionkey") === col("n_regionkey"))
      .select(format_string(
        "<NS1:vehicleComponent xmlns:NS1=\"http://www.uptake.com/bhp/1/vehicleComponent\">" +
          "<NS1:vehicleIdentifier>VEH_%s</NS1:vehicleIdentifier>" +
          "<NS1:componentCollection>" +
          "<NS1:component><NS1:componentCode>R_%s</NS1:componentCode><NS1:serialNumber>SR_%s</NS1:serialNumber>" +
          "<NS1:subcomponentCollection>%s</NS1:subcomponentCollection></NS1:component>" +
          "</NS1:componentCollection></NS1:vehicleComponent>",
        col("r_name"), col("r_regionkey").cast("string"),
        col("r_regionkey").cast("string"), col("subs")).as("doc"))
    val flat = FlattenOps.flattenStrict(doc, "doc", VehicleComponentFlattener, Nil)
    WideColumns.widen(flat, "fields").orderBy(col("componentCode"))
  }

  /** x05 — E1/E2/K1: JSON envelope wrap → parse roundtrip. */
  def x05Envelope(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val wrapped = Envelope.wrap(ev, col("props"), col("event_type"))
    Envelope.parse(wrapped, col("envelope"), Seq(col("event_id")))
      .orderBy(col("event_id"))
  }

  /** x06 — P3/E3/T5: base64 Firehose record → fixed 38-column lambda
    * projection (7 required attrs, null-seeded readings, UoM allowlist). */
  def x06LambdaProjection(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val fullDoc = format_string(
      s"""<NS1:message $SignalNsDecl><NS1:messagePayload>""" +
        "<NS1:vehicleIdentifier>V%s</NS1:vehicleIdentifier>" +
        "<NS1:componentIdentifier>C_%s</NS1:componentIdentifier>" +
        "<NS1:positionInTrain>%s</NS1:positionInTrain>" +
        "<NS1:typeOfReading>%s</NS1:typeOfReading>" +
        "<NS1:readingTimestampUTC>%s</NS1:readingTimestampUTC>" +
        "<NS1:readingLocation>SITE_%s</NS1:readingLocation>" +
        "<NS1:sourceSystem>RailBAM</NS1:sourceSystem>" +
        "<NS1:readingCollection>" +
        "<NS1:reading><NS1:attributeName>RMSTotalDB</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue></NS1:reading>" +
        "<NS1:reading><NS1:attributeName>speed</NS1:attributeName><NS1:attributeValue>%s</NS1:attributeValue><NS1:attributeUoM>km/h</NS1:attributeUoM></NS1:reading>" +
        "</NS1:readingCollection></NS1:messagePayload></NS1:message>",
      col("user_id").cast("string"), (col("user_id") % 5).cast("string"),
      (col("user_id") % 30).cast("string"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).cast("string"),
      (col("event_id") % 3).cast("string"),
      round(col("value") * 100).cast("long").cast("string"),
      col("event_id").cast("string"))
    val records = ev.select(col("event_id"), base64(fullDoc.cast("binary")).as("data"))
    LambdaTransform.transform(records, col("data"), Seq(col("event_id")))
      .select(col("event_id"), col("vehicleIdentifier"), col("componentIdentifier"),
        col("positionInTrain"), col("typeOfReading"), col("readingTimestampUTC"),
        col("readingLocation"), col("sourceSystem"), col("RMSTotalDB"),
        col("speed"), col("speed_UoM"), col("WheelflatDB"), col("weight"), col("weight_UoM"))
      .orderBy(length(col("event_id")), col("event_id"))
  }

  /** x07 — E6 strict guards as a side-output: odd events carry an
    * unknown nested collection; flattenSafe quarantines them instead of
    * failing the job (SURVEY §7.5 at-scale error handling). */
  def x07StrictGuards(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val doc = concat(
      format_string(
        s"""<NS1:message $SignalNsDecl><NS1:messagePayload>""" +
          "<NS1:vehicleIdentifier>V%s</NS1:vehicleIdentifier>",
        col("user_id").cast("string")),
      when(col("event_id") % 2 === 1,
        lit("<NS1:badCollection><NS1:x>1</NS1:x></NS1:badCollection>")).otherwise(lit("")),
      lit("</NS1:messagePayload></NS1:message>"))
    val flat = FlattenOps.flattenSafe(
      ev.select(col("event_type"), doc.as("doc")), "doc", SignalFlattener, Seq("event_type"))
    flat.groupBy(col("event_type"))
      .agg(count(when(col("error").isNull, 1)).as("n_ok"),
        count(when(col("error").isNotNull, 1)).as("n_err"))
      .orderBy(col("event_type"))
  }

  /** x08 — S4/E4/E1: documents → in-memory tar archives (one per task)
    * → tar extraction flatMap → envelope wrap/parse roundtrip. */
  def x08TarUnpack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val archives = docs.as[(Long, String)].mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val entries = rows.map { case (id, text) =>
          (id.toString, text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        Iterator.single((s"part-${TaskContext.getPartitionId()}", TarCodec.archive(entries)))
      }
    }
    val extracted = TarCodec.extract(archives)
    val enveloped = Envelope.wrap(extracted, col("content"), lit("documents"))
    Envelope.parse(enveloped, col("envelope"), Seq(col("member")))
      .select(col("member").cast("long").as("doc_id"),
        length(col("payload")).as("payload_len"), col("tenant_id"))
      .orderBy(col("doc_id"))
  }

  /** x09 — P5/E5: snake_case projection of the flatten output. */
  def x09SnakeCase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val flat = FlattenOps.flattenStrict(ev.select(signalDoc(lit("")).as("doc")), "doc", SignalFlattener, Nil)
    val wide = WideColumns.project(flat, "fields",
      Seq("vehicleIdentifier", "readingTimestampUTC", "RMSTotalDB", "speed_UoM"))
    val renamed = WideColumns.snakeCase(wide)
    renamed.orderBy(renamed.columns.map(col).toIndexedSeq: _*)
  }

  /** x10 — S2: greedy size-bounded batching (exact reference semantics
    * incl. `>=` threshold + oversized singletons) over the documents
    * listing. The fold runs on the listing (metadata scale), mirroring
    * Spark's own FilePartition packing. */
  def x10GreedyBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sizes = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
      .as[(Long, Long)].collect() // listing-sized, not data-sized
    val ids = GreedyBatcher.assign(sizes.map(_._2).toSeq, 5000L)
    val assigned = sizes.zip(ids).map { case ((docId, n), b) => (docId, n, b.toLong) }
    spark.createDataset(assigned.toSeq).toDF("doc_id", "n_chars", "batch_id")
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("batch_chars"))
      .orderBy(col("batch_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_signal_roundtrip" -> x01SignalRoundtrip _,
    "x02_signal_nulls"     -> x02SignalNulls _,
    "x03_dup_lastwins"     -> x03DupLastWins _,
    "x04_component_tree"   -> x04ComponentTree _,
    "x05_envelope"         -> x05Envelope _,
    "x06_lambda_projection" -> x06LambdaProjection _,
    "x07_strict_guards"    -> x07StrictGuards _,
    "x08_tar_unpack"       -> x08TarUnpack _,
    "x09_snake_case"       -> x09SnakeCase _,
    "x10_greedy_batch"     -> x10GreedyBatch _,
  )

  val oracleSql: Map[String, String] = Map(
    "x01_signal_roundtrip" ->
      """SELECT 'V' || CAST(user_id AS VARCHAR) AS vehicleIdentifier,
        |  event_type AS typeOfReading,
        |  CAST(epoch_us(ts) AS VARCHAR) AS readingTimestampUTC,
        |  CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR) AS RMSTotalDB,
        |  CAST(event_id AS VARCHAR) AS speed, 'km/h' AS speed_UoM
        |FROM events ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,
    "x02_signal_nulls" ->
      """SELECT CAST(event_id AS VARCHAR) AS eventKey,
        |  'V' || CAST(user_id AS VARCHAR) AS vehicleIdentifier,
        |  CAST(NULL AS VARCHAR) AS readingLocation,
        |  CASE WHEN event_id % 2 = 0 THEN CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR) END AS RMSTotalDB
        |FROM events ORDER BY LENGTH(eventKey), eventKey""".stripMargin,
    "x03_dup_lastwins" ->
      """SELECT CAST(event_id AS VARCHAR) AS eventKey, CAST(event_id AS VARCHAR) AS v
        |FROM events ORDER BY LENGTH(eventKey), eventKey""".stripMargin,
    "x04_component_tree" ->
      """SELECT * FROM (
        |  SELECT 'R_' || CAST(r_regionkey AS VARCHAR) AS componentCode,
        |    CAST(NULL AS VARCHAR) AS decom, CAST(NULL AS VARCHAR) AS nname,
        |    CAST(NULL AS VARCHAR) AS parent_code,
        |    'SR_' || CAST(r_regionkey AS VARCHAR) AS serialNumber,
        |    'VEH_' || r_name AS vehicleIdentifier
        |  FROM region
        |  UNION ALL
        |  SELECT 'N_' || CAST(n_nationkey AS VARCHAR), NULL, n_name,
        |    'R_' || CAST(n_regionkey AS VARCHAR), NULL, 'VEH_' || r_name
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  UNION ALL
        |  SELECT 'S_' || CAST(s_suppkey AS VARCHAR), NULL, NULL,
        |    'N_' || CAST(s_nationkey AS VARCHAR),
        |    'SS_' || CAST(s_suppkey AS VARCHAR), 'VEH_' || r_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |) ORDER BY componentCode""".stripMargin,
    "x05_envelope" ->
      """SELECT event_id, props AS payload, 'bhp' AS tenant_id, event_type AS partition_id
        |FROM events ORDER BY event_id""".stripMargin,
    "x06_lambda_projection" ->
      """SELECT CAST(event_id AS VARCHAR) AS event_id,
        |  'V' || CAST(user_id AS VARCHAR) AS vehicleIdentifier,
        |  'C_' || CAST(user_id % 5 AS VARCHAR) AS componentIdentifier,
        |  CAST(user_id % 30 AS VARCHAR) AS positionInTrain,
        |  event_type AS typeOfReading,
        |  CAST(epoch_us(ts) AS VARCHAR) AS readingTimestampUTC,
        |  'SITE_' || CAST(event_id % 3 AS VARCHAR) AS readingLocation,
        |  'RailBAM' AS sourceSystem,
        |  CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR) AS RMSTotalDB,
        |  CAST(event_id AS VARCHAR) AS speed, 'km/h' AS speed_UoM,
        |  CAST(NULL AS VARCHAR) AS WheelflatDB,
        |  CAST(NULL AS VARCHAR) AS weight, CAST(NULL AS VARCHAR) AS weight_UoM
        |FROM events ORDER BY events.event_id""".stripMargin,
    "x07_strict_guards" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_ok,
        |  COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_err
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "x08_tar_unpack" ->
      """SELECT doc_id, LENGTH(text) AS payload_len, 'bhp' AS tenant_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x09_snake_case" ->
      """SELECT 'V' || CAST(user_id AS VARCHAR) AS vehicle_identifier,
        |  CAST(epoch_us(ts) AS VARCHAR) AS reading_timestamp_utc,
        |  CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR) AS rms_total_db,
        |  'km/h' AS speed_uo_m
        |FROM events ORDER BY 1, 2, 3, 4""".stripMargin,
    // State machine per reference aws_utils.py:27-45 with state after each
    // row = (batch_id, acc, closed); `closed` explicitly marks an
    // oversized-singleton batch (next row must open batch_id + 1). An
    // explicit flag rather than the acc = 0 sentinel, so legitimate
    // zero-size items (n_chars = 0) don't get misclassified as closed.
    "x10_greedy_batch" ->
      """WITH RECURSIVE d AS (
        |  SELECT n_chars, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM documents
        |), packed AS (
        |  SELECT rn, n_chars, CAST(0 AS BIGINT) AS batch_id,
        |    CAST(n_chars AS BIGINT) AS acc,
        |    n_chars >= 5000 AS closed
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.n_chars,
        |    CASE WHEN p.closed OR p.acc + d.n_chars >= 5000 THEN p.batch_id + 1
        |         ELSE p.batch_id END AS batch_id,
        |    CASE WHEN p.closed OR p.acc + d.n_chars >= 5000 THEN CAST(d.n_chars AS BIGINT)
        |         ELSE p.acc + d.n_chars END AS acc,
        |    CASE WHEN p.closed THEN d.n_chars >= 5000
        |         WHEN p.acc + d.n_chars >= 5000 THEN d.n_chars >= 5000
        |         ELSE FALSE END AS closed
        |  FROM d JOIN packed p ON d.rn = p.rn + 1
        |)
        |SELECT batch_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS batch_chars
        |FROM packed GROUP BY batch_id ORDER BY batch_id""".stripMargin,
  )
}
