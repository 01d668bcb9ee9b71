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
}
