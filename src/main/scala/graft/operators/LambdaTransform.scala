package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.xml.{XmlShapeException, XmlTree}

/** P3/E3/T5 — the Firehose-lambda-equivalent stateless transform: a
  * base64 XML record → fixed-schema flat record with the declared
  * 7-attribute + 31-reading column list, null-seeded then selectively
  * filled (reference: acoustic_parser_lambda.py:6-49,73-91).
  *
  * The required/optional contract is faithful to the reference:
  *   - messagePayload and all 7 attrs are REQUIRED (missing → error,
  *     like the reference's AttributeError on a None find());
  *   - readingCollection is optional; a reading without attributeName
  *     is skipped; attributeValue is required once a name is present;
  *   - attributeUoM is required only for the UoM-allowlisted readings;
  *   - readings NOT in the declared list still land in the record (the
  *     reference's dict gains the key) — they're visible through the
  *     map form, and dropped by the fixed projection.
  */
object LambdaTransform {
  val Ns = "{http://uptake.com/bhp/1/sensors}"

  val Attrs: Seq[String] = Seq(
    "vehicleIdentifier", "componentIdentifier", "positionInTrain",
    "typeOfReading", "readingTimestampUTC", "readingLocation", "sourceSystem")

  val Readings: Seq[String] = Seq(
    "SensorDataQualityDescription", "SiteTimeZoneId", "SiteName",
    "TrainDirection", "VehicleTag", "VehicleEndLeading", "TrackSide",
    "TrainAxleNumber", "VehicleAxleNumber", "VehicleSide",
    "RailBAMBearingFaultCode", "RailBAMWheelFaultCode", "RMSTotalDB",
    "RMSBandDB", "LooseFrettingDB", "RollerDB", "CupDB", "ConeDB",
    "NoisyDB", "RMSBandWheelflatDB", "WheelflatDB", "TrainVehicleNumber",
    "WHEEL_TEMPERATURE", "BEARING_TEMPERATURE", "weight", "weight_UoM",
    "vertical_peak_UoM", "vertical_peak", "speed", "speed_UoM",
    "BrokenSpringDefect")

  val ReadingsWithUom: Set[String] = Set("weight", "vertical_peak", "speed")

  /** Declared output columns, in declaration order. */
  val Columns: Seq[String] = Attrs ++ Readings

  /** Pure per-record transform: XML → string-keyed record. */
  def parseXml(xml: String): Map[String, String] = {
    val root = XmlTree.parse(xml)
    val payload = root.find(s"${Ns}messagePayload").getOrElse(
      throw new XmlShapeException("missing messagePayload"))
    val record = mutable.LinkedHashMap.empty[String, String]
    for (a <- Attrs)
      record(a) = payload.find(s"$Ns$a").getOrElse(
        throw new XmlShapeException(s"missing required attribute $a")).text
    for (r <- Readings) record(r) = null
    payload.find(s"${Ns}readingCollection").foreach { rc =>
      for (r <- rc.children) {
        r.find(s"${Ns}attributeName").foreach { nameEl =>
          val name = if (nameEl.text == null) "" else nameEl.text
          record(name) = r.find(s"${Ns}attributeValue").getOrElse(
            throw new XmlShapeException(s"reading $name missing attributeValue")).text
          if (ReadingsWithUom.contains(name))
            record(name + "_UoM") = r.find(s"${Ns}attributeUoM").getOrElse(
              throw new XmlShapeException(s"reading $name missing attributeUoM")).text
        }
      }
    }
    record.toMap
  }

  /** Spark operator: `dataCol` holds base64-encoded XML (the Firehose
    * record body). Output = pass-through `keep` columns + the fixed
    * 38-column projection. 1:1 record mapping, stateless (T5/K4). */
  def transform(df: DataFrame, dataCol: Column, keep: Seq[Column] = Nil): DataFrame = {
    val decoded = df.withColumn("_xml", unbase64(dataCol).cast("string"))
    val spark = df.sparkSession
    import spark.implicits._
    val keepNames = keep.map(c => decoded.select(c).columns.head)
    val withMap = {
      val keyIdx = keepNames.map(decoded.schema.fieldIndex)
      val xmlIdx = decoded.schema.fieldIndex("_xml")
      val ds = decoded.mapPartitions { rows =>
        rows.map { row =>
          (keyIdx.map(i => Option(row.get(i)).map(String.valueOf).orNull), parseXml(row.getString(xmlIdx)))
        }
      }
      val out = ds.toDF("_keys", "fields")
      keepNames.zipWithIndex.foldLeft(out) { case (d, (name, i)) =>
        d.withColumn(name, col("_keys").getItem(i))
      }.drop("_keys")
    }
    WideColumns.project(withMap, "fields", Columns, keepNames.map(col))
  }
}
