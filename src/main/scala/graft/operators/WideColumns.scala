package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1/U6/P5 — wide-column synthesis from the canonical MapType long
  * form, plus name hygiene helpers.
  *
  * The reference materializes `pd.DataFrame(rows)` whose column set is
  * the union of dict keys (implicit schema-union). At scale that is a
  * two-pass operation: pass 1 discovers the key set (a metadata-sized
  * aggregate — distinct map keys, NOT distinct rows), pass 2 projects.
  * The key set is bounded by the schema width of the input grammar, so
  * the driver-side collect is O(columns), never O(data).
  */
object WideColumns {

  /** Discover the distinct key set of a map column (sorted for
    * deterministic column order). One cheap shuffle of key strings. */
  def keysOf(df: DataFrame, mapCol: String): Seq[String] = {
    import df.sparkSession.implicits._
    df.select(explode(map_keys(col(mapCol))).as("k"))
      .distinct().as[String].collect().sorted.toSeq
  }

  /** Dynamic wide projection (flattener semantics): columns = observed
    * key union; missing keys → null (pandas NaN-fill analogue). */
  def widen(df: DataFrame, mapCol: String, keep: Seq[Column] = Nil): DataFrame =
    project(df, mapCol, keysOf(df, mapCol), keep)

  /** Fixed-list projection (lambda semantics, P3): declared columns,
    * null-seeded, filled from the map where present. */
  def project(df: DataFrame, mapCol: String, columns: Seq[String],
      keep: Seq[Column] = Nil): DataFrame =
    df.select(keep ++ columns.map(k => col(mapCol).getItem(k).as(k)): _*)

  /** P5/E5 — inflection.underscore-style CamelCase → snake_case
    * (RMSTotalDB → rms_total_db), applied to column names at select
    * time. Pure name-level transform; no data movement. */
  def underscore(name: String): String =
    name
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .replaceAll("([a-z\\d])([A-Z])", "$1_$2")
      .replace('-', '_')
      .toLowerCase

  def snakeCase(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(underscore).toIndexedSeq: _*)
}
