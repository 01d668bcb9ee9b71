package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset}
import graft.xml.{XmlShapeException, XmlTree}
import graft.xml.XmlTree.Elem

/** XML document flatteners — the reference's core "relational" work
  * (SURVEY §2.4/§2.5). Pure Scala functions (unit-testable without
  * Spark) wrapped by Spark operators in [[FlattenOps]].
  *
  * Output rows are string-keyed maps with nullable values: the
  * reference's row model is "everything is a nullable string"
  * (SURVEY §1.2). A missing `attributeName` maps to the empty-string
  * column — the closest CSV-visible analogue of the reference's
  * `record[None]` dict key.
  */
trait Flattener extends Serializable {
  def ns: String
  def endTag: String

  /** 1 document → N rows (U2: N=1 for signals; U3/U4: one per component
    * node for vehicle components). Throws [[XmlShapeException]] on the
    * grammar violations the reference rejects (E6). */
  def flatten(xml: String): Seq[Map[String, String]]

  protected def stripNs(tag: String): String = XmlTree.stripNs(tag, ns)
  protected def keyOf(text: String): String = if (text == null) "" else text
}

/** Sensor signal messages: one row per document; scalar payload children
  * become columns; the readingCollection's (name, value[, UoM]) triples
  * pivot into wide columns with last-writer-wins duplicate semantics
  * (V1/V3/P4; reference: file_flattener.py:119-145). */
object SignalFlattener extends Flattener {
  val ns = "{http://uptake.com/bhp/1/sensors}"
  val endTag = "</NS1:message>"

  def flatten(xml: String): Seq[Map[String, String]] = {
    val record = mutable.LinkedHashMap.empty[String, String]
    val root = XmlTree.parse(xml)
    for (parent <- root.children; e <- parent.children) {
      if (e.tag == s"${ns}readingCollection") {
        for (r <- e.children) {
          var colName: String = null
          var colVal: String = null
          var colUom: String = null
          var sawUom = false
          for (at <- r.children) {
            if (at.tag == s"${ns}attributeName") colName = at.text
            else if (at.tag == s"${ns}attributeValue") colVal = at.text
            else if (at.tag == s"${ns}attributeUoM") { colUom = at.text; sawUom = true }
            else throw new XmlShapeException(s"Unknown reading attribute: ${at.tag}: ${at.text}")
          }
          record(keyOf(colName)) = colVal // last writer wins on duplicates (V3)
          if (sawUom && colUom != null) record(keyOf(colName) + "_UoM") = colUom
        }
      } else {
        if (e.children.nonEmpty)
          throw new XmlShapeException(s"Unknown collection of elements: ${e.tag}.")
        record(stripNs(e.tag)) = e.text
      }
    }
    Seq(record.toMap)
  }
}

/** Vehicle component trees: one row per component node at any depth
  * (post-order — children are emitted during the parent's element scan,
  * the parent's own row last). Each row carries `parent_code` = the
  * enclosing component's componentCode (adjacency-list tree encoding;
  * roots get null), and root-level scalar attributes are merged into
  * every row with component keys shadowing root keys on collision
  * (U3/U4/U5/V2; reference: file_flattener.py:67-107). */
object VehicleComponentFlattener extends Flattener {
  val ns = "{http://www.uptake.com/bhp/1/vehicleComponent}"
  val endTag = "</NS1:vehicleComponent>"

  def flatten(xml: String): Seq[Map[String, String]] = {
    val vcAttrs = mutable.LinkedHashMap.empty[String, String]
    val records = mutable.ArrayBuffer.empty[mutable.LinkedHashMap[String, String]]
    val root = XmlTree.parse(xml)
    for (e <- root.children) {
      if (e.children.nonEmpty) {
        if (e.tag == s"${ns}componentCollection")
          e.children.foreach(c => parseComponent(c, null, records))
        else throw new XmlShapeException(s"Unknown collection of elements: ${e.tag}.")
      } else vcAttrs(stripNs(e.tag)) = e.text
    }
    records.map(r => (vcAttrs ++ r).toMap).toSeq
  }

  private def parseComponent(
      component: Elem,
      parentCode: String,
      records: mutable.ArrayBuffer[mutable.LinkedHashMap[String, String]]): Unit = {
    val record = mutable.LinkedHashMap.empty[String, String]
    val componentCode = component.find(s"${ns}componentCode").map(_.text).orNull

    for (element <- component.children) {
      if (element.tag == s"${ns}subcomponentCollection") {
        element.children.foreach(sc => parseComponent(sc, componentCode, records))
      } else if (element.tag == s"${ns}componentAttributeCollection") {
        for (at <- element.children) {
          if (at.children.length == 2) {
            val name = at.find(s"${ns}attributeName").getOrElse(
              throw new XmlShapeException(s"Unknown attribute structure: ${at.children.map(_.tag)}"))
            val value = at.find(s"${ns}attributeValue").getOrElse(
              throw new XmlShapeException(s"Unknown attribute structure: ${at.children.map(_.tag)}"))
            record(keyOf(name.text)) = value.text
          } else if (at.children.length == 1) {
            val name = at.find(s"${ns}attributeName").getOrElse(
              throw new XmlShapeException(s"Unknown attribute structure: ${at.children.map(_.tag)}"))
            record(keyOf(name.text)) = null // 1-child attribute → null value (V2)
          } else {
            throw new XmlShapeException(s"Unknown attribute structure: ${at.children.map(_.tag)}")
          }
        }
      } else {
        if (element.children.nonEmpty)
          throw new XmlShapeException(s"Unknown collection: ${element.tag}")
        record(stripNs(element.tag)) = element.text
      }
    }
    record("parent_code") = parentCode // overwrites any data column of that name
    records += record
  }
}

object Flattener {
  /** Reading-type dispatch (reference: file_flattener.py:156 —
    * SignalFlattener for the four signal types, component flattener
    * otherwise). */
  def forReadingType(readingType: String): Flattener =
    if (graft.sources.Partitions.Signals.contains(readingType)) SignalFlattener
    else VehicleComponentFlattener
}

/** Spark-side wrappers: flatMap a Dataset of XML document strings into
  * the canonical long form — one MapType column per row. The map stays
  * the canonical representation until a sink-time wide projection
  * ([[WideColumns]]); at 100 TB this avoids a per-batch dynamic schema
  * and keeps the flatten a single narrow (no-shuffle) stage. */
object FlattenOps {

  /** Strict mode: any grammar violation fails the task (the reference's
    * FAILFAST semantics). `keyCols` are passed through. */
  def flattenStrict(df: DataFrame, xmlCol: String, flattener: Flattener,
      keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyIdx = keyCols.map(c => df.schema.fieldIndex(c))
    val xmlIdx = df.schema.fieldIndex(xmlCol)
    val keySchema = keyCols.map(df.schema.apply)
    val ds = df.mapPartitions { rows =>
      rows.flatMap { row =>
        val xml = row.getString(xmlIdx)
        flattener.flatten(xml).map(m => (keyIdx.map(i => Option(row.get(i)).map(String.valueOf).orNull), m))
      }
    }
    // re-expand pass-through keys as string columns
    import org.apache.spark.sql.functions._
    val out = ds.toDF("_keys", "fields")
    keyCols.zipWithIndex.foldLeft(out) { case (d, (name, i)) =>
      d.withColumn(name, col("_keys").getItem(i))
    }.drop("_keys")
  }

  /** Permissive mode: parse errors land in an `error` column instead of
    * failing the task (side-output pattern — SURVEY §7.5), so a 100 TB
    * run quarantines bad documents instead of dying. */
  def flattenSafe(df: DataFrame, xmlCol: String, flattener: Flattener,
      keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyIdx = keyCols.map(c => df.schema.fieldIndex(c))
    val xmlIdx = df.schema.fieldIndex(xmlCol)
    val ds = df.mapPartitions { rows =>
      rows.flatMap { row =>
        val xml = row.getString(xmlIdx)
        val keys = keyIdx.map(i => Option(row.get(i)).map(String.valueOf).orNull)
        try flattener.flatten(xml).map(m => (keys, m, null: String))
        catch {
          case e: Exception => Seq((keys, null: Map[String, String], s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
    }
    import org.apache.spark.sql.functions._
    val out = ds.toDF("_keys", "fields", "error")
    keyCols.zipWithIndex.foldLeft(out) { case (d, (name, i)) =>
      d.withColumn(name, col("_keys").getItem(i))
    }.drop("_keys")
  }
}
