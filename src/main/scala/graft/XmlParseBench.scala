package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{FlattenOps, SignalFlattener}

/** Dev measurement (SURVEY §7.4): Spark's built-in `from_xml` vs the
  * engine's custom pull parser on the same synthesized signal docs.
  * The custom parser exists because the reference's row model is a
  * DYNAMIC string map (unknown attribute names become columns), which
  * a fixed `from_xml` schema cannot express — this bench quantifies
  * what that flexibility costs. Results recorded in PERF.md.
  *
  * Usage: runMain graft.XmlParseBench [sfDir] [reps]
  */
object XmlParseBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.events(spark, sfDir)
    val doc = concat(
      format_string(
        """<NS1:message xmlns:NS1="http://uptake.com/bhp/1/sensors"><NS1:messagePayload>""" +
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
      lit("</NS1:readingCollection></NS1:messagePayload></NS1:message>"))
    val docs = ev.select(doc.as("xml"))
    docs.write.mode("overwrite").parquet("/tmp/graft_xmlbench")
    val staged = spark.read.parquet("/tmp/graft_xmlbench")

    // fixed schema for from_xml — expressible ONLY because this bench
    // knows the attribute names up front; the real pipeline does not
    val readingT = StructType(Seq(
      StructField("NS1:attributeName", StringType),
      StructField("NS1:attributeValue", StringType),
      StructField("NS1:attributeUoM", StringType)))
    val payloadT = StructType(Seq(
      StructField("NS1:vehicleIdentifier", StringType),
      StructField("NS1:typeOfReading", StringType),
      StructField("NS1:readingTimestampUTC", StringType),
      StructField("NS1:readingCollection", StructType(Seq(
        StructField("NS1:reading", ArrayType(readingT)))))))
    val msgT = StructType(Seq(StructField("NS1:messagePayload", payloadT)))

    def time(label: String)(body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val med = times.map(_._1).sorted.apply(times.length / 2)
      println(f"[xmlbench] $label rows=${times.head._2} median=$med%.2f s (${times.map(t => f"${t._1}%.2f").mkString(", ")})")
    }

    time("custom pull parser (flattenStrict)") {
      FlattenOps.flattenStrict(staged, "xml", SignalFlattener, Nil)
        .select(element_at(col("fields"), "vehicleIdentifier").as("vid"))
        .filter(col("vid").isNotNull).count()
    }
    time("built-in from_xml (fixed schema)") {
      staged
        .select(from_xml(col("xml"), msgT).as("m"))
        .select(col("m.`NS1:messagePayload`.`NS1:vehicleIdentifier`").as("vid"))
        .filter(col("vid").isNotNull).count()
    }
    spark.stop()
  }
}
