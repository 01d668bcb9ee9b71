package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Typed view of the lambda projection (SURVEY §1.4: "typed
  * Dataset[SignalReading] for the frozen projection") — the 7 required
  * message attributes plus the UoM-carrying readings, as a case class
  * so downstream code gets compile-time field checks. The long tail of
  * 31 nullable readings stays in the DataFrame form (all-string,
  * dynamic); this is the stable typed core.
  */
final case class SignalReading(
    vehicleIdentifier: String,
    componentIdentifier: String,
    positionInTrain: String,
    typeOfReading: String,
    readingTimestampUTC: String,
    readingLocation: String,
    sourceSystem: String,
    weight: Option[String],
    weight_UoM: Option[String],
    speed: Option[String],
    speed_UoM: Option[String],
    vertical_peak: Option[String],
    vertical_peak_UoM: Option[String])

object SignalReading {

  /** Typed projection over [[LambdaTransform.transform]] output. */
  def from(df: DataFrame): Dataset[SignalReading] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col("vehicleIdentifier"), col("componentIdentifier"), col("positionInTrain"),
      col("typeOfReading"), col("readingTimestampUTC"), col("readingLocation"),
      col("sourceSystem"), col("weight"), col("weight_UoM"), col("speed"),
      col("speed_UoM"), col("vertical_peak"), col("vertical_peak_UoM"))
      .as[SignalReading]
  }

  /** End-to-end typed path: base64 Firehose records → typed Dataset. */
  def fromRecords(df: DataFrame, dataCol: Column): Dataset[SignalReading] =
    from(LambdaTransform.transform(df, dataCol))
}
