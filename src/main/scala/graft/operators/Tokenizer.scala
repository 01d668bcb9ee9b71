package graft.operators

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** U1/P1 — document tokenizer: split a concatenated multi-document
  * string on the document end tag, drop whitespace-only fragments,
  * re-terminate each fragment so it parses standalone
  * (reference: file_flattener.py:47-55).
  *
  * Entirely built-in expressions (split/explode/regexp), so the whole
  * stage stays inside whole-stage codegen and never shuffles.
  */
object Tokenizer {

  // (?U) = UNICODE_CHARACTER_CLASS so \s covers U+00A0/U+2028-style
  // whitespace like the reference's str.strip (file_flattener.py:53);
  // Java \s alone is ASCII-only and would keep such fragments alive
  private val edgeWs = "(?U)^\\s+|\\s+$"
  private val edgeWsPattern = Pattern.compile(edgeWs)

  /** Pure core (one compacted multi-doc string → standalone fragments)
    * shared by the DataFrame operator below and the SQL-registered
    * [[graft.expressions.GraftTokenize]]. */
  def tokenizeString(content: String, endTag: String): Seq[String] =
    content.split(Pattern.quote(endTag), -1).toSeq
      .map(f => edgeWsPattern.matcher(f).replaceAll(""))
      .filter(_.nonEmpty)
      .map(_ + "\n" + endTag)

  /** `contentCol` holds the compacted multi-doc string; result has the
    * pass-through `keep` columns plus one `xml` column per document. */
  def tokenize(df: DataFrame, contentCol: Column, endTag: String,
      keep: Seq[Column] = Nil): DataFrame = {
    val frag = explode(split(contentCol, Pattern.quote(endTag), -1)).as("_frag")
    df.select(keep :+ frag: _*)
      .withColumn("_stripped", regexp_replace(col("_frag"), edgeWs, ""))
      .filter(length(col("_stripped")) > 0)
      .withColumn("xml", concat(col("_stripped"), lit("\n" + endTag)))
      .drop("_frag", "_stripped")
  }
}
