package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The SQL surface: native expressions registered via
  * SparkSessionExtensions are callable from spark.sql. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate would reuse another suite's session and skip the
    // extensions — force a fresh session (same SparkContext)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.tune(
      SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new GraftExtensions))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("graft_poly_hash usable from SQL, matches the Column API") {
    import spark.implicits._
    val viaSql = spark.sql("SELECT graft_poly_hash('hello world')").as[Long].head()
    val want = "hello world".foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    assert(viaSql == want)
  }

  test("XML path reachable from SQL: graft_tokenize + dispatching graft_flatten") {
    import spark.implicits._
    val tag = "</NS1:message>"
    def doc(v: String) =
      s"""<NS1:message xmlns:NS1="http://uptake.com/bhp/1/sensors"><NS1:messagePayload>""" +
        s"<NS1:vehicleIdentifier>$v</NS1:vehicleIdentifier>" +
        s"<NS1:readingCollection><NS1:reading><NS1:attributeName>speed</NS1:attributeName>" +
        s"<NS1:attributeValue>55</NS1:attributeValue></NS1:reading></NS1:readingCollection>" +
        s"</NS1:messagePayload>$tag"
    // compacted multi-doc content with a whitespace-only fragment between
    Seq(doc("V1") + "\n   \n" + doc("V2")).toDF("content")
      .createOrReplaceTempView("raw_xml")
    val got = spark.sql(
      s"""SELECT m['vehicleIdentifier'] AS vid, m['speed'] AS speed
         |FROM raw_xml
         |LATERAL VIEW explode(graft_tokenize(content, '$tag')) t AS xml_doc
         |LATERAL VIEW explode(graft_flatten(xml_doc, 'ACOUSTIC')) f AS m
         |ORDER BY vid""".stripMargin)
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("V1", "55"), ("V2", "55")))
    // SQL tokenize ≡ the DataFrame operator's built-in pipeline
    val viaOp = graft.operators.Tokenizer.tokenize(
      spark.table("raw_xml"), org.apache.spark.sql.functions.col("content"), tag)
      .as[String].collect().sorted.toSeq
    val viaSql = spark.sql(
      s"SELECT xml_doc FROM raw_xml LATERAL VIEW explode(graft_tokenize(content, '$tag')) t AS xml_doc")
      .as[String].collect().sorted.toSeq
    assert(viaOp == viaSql)
  }

  test("vector primitives usable from SQL, match the Column API") {
    import spark.implicits._
    val (d, b) = spark.sql(
      """SELECT graft_float_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
        |                       array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))),
        |       graft_hyperplane_bits(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)), 8)
        |""".stripMargin).as[(Double, Long)].head()
    assert(d == 1.5 * 4.0 + (-2.0) * 0.5)
    val viaApi = Seq(Tuple1(Seq(1.0f, 1.0f))).toDF("v")
      .select(graft.functions.Vectors.lshBucket(org.apache.spark.sql.functions.col("v"), 8))
      .as[Long].head()
    assert(b == viaApi)
  }

  test("graft_sort_key + graft_top_k compose in SQL for double scores") {
    import spark.implicits._
    val got = Seq((1L, 0.5), (2L, 0.9), (3L, -0.2), (4L, 0.9))
      .toDF("id", "score").createOrReplaceTempView("sk_demo")
    val rows = spark.sql(
      """SELECT t.pair.id AS id FROM (
        |  SELECT explode(graft_top_k(graft_sort_key(score), id, 2)) AS pair
        |  FROM sk_demo) t""".stripMargin)
      .as[Long].collect().toSeq
    // 0.9 ties break by lower id (2 before 4); -0.2 and 0.5 excluded
    assert(rows == Seq(2L, 4L), s"got $rows")
  }

  test("type misuse fails at analysis, not with runtime cast errors") {
    // array<double> into the float-array LSH primitive would misread
    // 8-byte doubles as 4-byte floats on unsafe layouts — must be
    // rejected before execution, like the other vector primitives
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_bits(array(1.0, 2.0), 8)").collect()
    }
    assert(e1.getMessage.contains("array<float>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_bits(array(CAST(1.0 AS FLOAT)), 63)").collect()
    }
    assert(e2.getMessage.contains("nPlanes"))
    // XML front door: non-string arguments get an analysis-time type
    // error instead of a raw ClassCastException mid-query
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_tokenize(42, '</a>')").collect()
    }
    assert(e3.getMessage.contains("string"))
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_flatten('<a/>', 7)").collect()
    }
    assert(e4.getMessage.contains("string"))
  }

  test("graft_bloom_agg/graft_bloom_contains: no false negatives, bounded false positives") {
    import org.apache.spark.sql.functions._
    spark.range(0, 1000, 1, 4).toDF("k").createOrReplaceTempView("bloom_keys")
    // 4 input partitions force partial-buffer merges through serialize/
    // deserialize — the cross-task OR is what this exercises
    val f = spark.sql("SELECT graft_bloom_agg(k, 65536, 5) AS f FROM bloom_keys")
      .head.getAs[Array[Byte]]("f")
    assert(f.length == 4 + 65536 / 8)
    val filt = lit(f)
    val missedMembers = spark.range(0, 1000)
      .filter(!expressions.BloomContains(filt, col("id"))).count()
    assert(missedMembers == 0, "Bloom filter dropped an inserted key (false negative)")
    // 10k absent keys at 65536 bits / 1000 keys / 5 hashes: theoretical
    // fpp ≈ 0.06% — assert an order of magnitude of headroom, not the exact rate
    val falsePositives = spark.range(1000000, 1010000)
      .filter(expressions.BloomContains(filt, col("id"))).count()
    assert(falsePositives < 100, s"false-positive rate out of bounds: $falsePositives/10000")
    // type misuse is an analysis-time error, not a runtime cast failure
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bloom_agg(CAST(1 AS INT), 65536, 5) FROM bloom_keys").collect()
    }
    assert(e1.getMessage.contains("bigint"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_bloom_contains('notbinary', 1)").collect()
    }
    assert(e2.getMessage.contains("binary"))
  }

  test("whole-stage codegen covers the SQL XML front door") {
    // graft_tokenize/graft_flatten were the last eval-mode dispatch in
    // the native surface; they must plan INSIDE a codegen'd stage (the
    // `*(n)` operator prefix), not fall the stage back to interpreted
    import org.apache.spark.sql.functions._
    val df = spark.range(3).toDF("id")
      .selectExpr("graft_tokenize(concat('<m>a', id, '</m>'), '</m>') AS frags")
      .selectExpr("explode(frags) AS doc")
    val p = df.queryExecution.executedPlan.toString
    val projLine = p.linesIterator.find(_.contains("graft_tokenize"))
    assert(projLine.exists(_.contains("*(")),
      s"graft_tokenize planned outside whole-stage codegen:\n$p")
    // and the expressions no longer carry the CodegenFallback marker
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(!expressions.GraftTokenize(Literal("a"), Literal("b")).isInstanceOf[CodegenFallback])
    assert(!expressions.GraftFlatten(Literal("a"), Literal("b")).isInstanceOf[CodegenFallback])
    // the generated static-call path computes the same thing as eval
    val got = df.collect().map(_.getString(0)).toSet
    assert(got == Set("<m>a0\n</m>", "<m>a1\n</m>", "<m>a2\n</m>"))
  }

  test("graft_bloom_contains rejects malformed blobs with a descriptive error") {
    import org.apache.spark.sql.functions._
    // public SQL surface: a truncated/garbage binary must fail loudly,
    // never index out of bounds or answer vacuously
    def probe(bytes: Array[Byte]) =
      spark.range(1).select(expressions.BloomContains(lit(bytes), lit(42L))).collect()
    val tooShort = intercept[Exception] { probe(Array[Byte](0, 0, 0, 5)) }
    assert(tooShort.getMessage.contains("malformed filter"))
    val raggedWords = intercept[Exception] { probe(new Array[Byte](4 + 11)) }
    assert(raggedWords.getMessage.contains("malformed filter"))
    val zeroHashes = intercept[Exception] { probe(new Array[Byte](12)) }
    assert(zeroHashes.getMessage.contains("outside [1, 16]"))
    // and mismatched-geometry merges are refused, not silently OR'd
    val a = new expressions.BloomBuffer(2, 5)
    val b = new expressions.BloomBuffer(3, 5)
    val mm = intercept[IllegalArgumentException] { a.mergeFrom(b) }
    assert(mm.getMessage.contains("mismatched"))
  }

  test("graft_shingle_rep_stats usable from SQL") {
    import spark.implicits._
    // "a b a b a b" 2-shingles (positions 1..len-n): "a b","b a","a b","b a" →
    // max multiplicity 2, 2 distinct, 4 total
    val got = spark.sql("SELECT graft_shingle_rep_stats('a b a b a b', 2)")
      .as[Seq[Long]].head()
    assert(got == Seq(2L, 2L, 4L))
  }

  test("graft_shingle_hashes + graft_minhash_sig compose in SQL") {
    import spark.implicits._
    val sig = spark.sql(
      "SELECT graft_minhash_sig(graft_shingle_hashes('a b c d e f', 4), 8)")
      .as[Seq[Long]].head()
    assert(sig.length == 8)
    assert(sig.forall(v => v >= 0 && v < 1000000007L))
    // empty shingle set → sentinel signature
    val empty = spark.sql(
      "SELECT graft_minhash_sig(graft_shingle_hashes('one two', 4), 4)")
      .as[Seq[Long]].head()
    assert(empty == Seq.fill(4)(1000000007L))
  }

  test("graft_top_k usable from SQL as an aggregate") {
    import spark.implicits._
    Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L), ("b", 4L, 1L))
      .toDF("g", "id", "score").createOrReplaceTempView("tk")
    val got = spark.sql(
      """SELECT g, t.id, t.score
        |FROM (SELECT g, graft_top_k(score, id, 2) AS top FROM tk GROUP BY g)
        |LATERAL VIEW explode(top) AS t
        |ORDER BY g, t.score DESC""".stripMargin)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 30L), ("a", 3L, 20L), ("b", 4L, 1L)))
  }
}
