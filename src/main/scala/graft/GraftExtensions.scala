package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{MinHashSig, PolyHash, WordShingleHashes}

/** SQL surface for the engine's native expressions: registered through
  * `SparkSessionExtensions` so `spark.sql("SELECT graft_poly_hash(s)")`
  * works cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)` in code.
  *
  * No custom optimizer rules or strategies are injected — SURVEY §4's
  * conclusion stands: stock Catalyst covers the reference's plan space;
  * the engine extends Spark only at the expression level.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[PolyHash].getName, null, name, usage, "")

  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    require(exprs.length == n,
      s"$name expects $n argument(s), got ${exprs.length}")

  /** A literal integer parameter (accepts INT/BIGINT literals; rejects
    * non-foldable expressions with a named error, not an internal one). */
  private def intParam(name: String, e: Expression): Int = {
    require(e.foldable, s"$name expects a literal integer parameter")
    e.eval() match {
      case i: Int => i
      case l: Long =>
        require(l == l.toInt, s"$name parameter $l out of Int range")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$name expects a literal integer parameter, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "graft_poly_hash(str) - polynomial code-point hash mod 1e9+7"),
      (exprs: Seq[Expression]) => {
        arity("graft_poly_hash", 1, exprs)
        PolyHash(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(str, n) - distinct n-word shingle hashes"),
      (exprs: Seq[Expression]) => {
        arity("graft_shingle_hashes", 2, exprs)
        WordShingleHashes(exprs.head, intParam("graft_shingle_hashes", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(array<long>, k) - k-permutation MinHash signature"),
      (exprs: Seq[Expression]) => {
        arity("graft_minhash_sig", 2, exprs)
        MinHashSig(exprs.head, intParam("graft_minhash_sig", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_strings"),
      info("graft_shingle_strings", "graft_shingle_strings(str, n) - distinct n-word shingle strings"),
      (exprs: Seq[Expression]) => {
        arity("graft_shingle_strings", 2, exprs)
        graft.expressions.WordShingleStrings(exprs.head,
          intParam("graft_shingle_strings", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_rep_stats"),
      info("graft_shingle_rep_stats",
        "graft_shingle_rep_stats(str, n) - [max multiplicity, distinct, total] over the n-word shingle multiset"),
      (exprs: Seq[Expression]) => {
        arity("graft_shingle_rep_stats", 2, exprs)
        graft.expressions.ShingleRepStats(exprs.head,
          intParam("graft_shingle_rep_stats", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(array<long>, bits) - bits-wide SimHash fingerprint"),
      (exprs: Seq[Expression]) => {
        arity("graft_simhash", 2, exprs)
        graft.expressions.SimHashBits(exprs.head, intParam("graft_simhash", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_bits"),
      info("graft_hyperplane_bits", "graft_hyperplane_bits(array<float>, nPlanes) - LSH sign bits"),
      (exprs: Seq[Expression]) => {
        arity("graft_hyperplane_bits", 2, exprs)
        graft.expressions.HyperplaneBits(exprs.head, intParam("graft_hyperplane_bits", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_float_dot"),
      info("graft_float_dot", "graft_float_dot(array<float>, array<float>) - IEEE-ordered dot product"),
      (exprs: Seq[Expression]) => {
        arity("graft_float_dot", 2, exprs)
        graft.expressions.FloatDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_quantize_i8"),
      info("graft_quantize_i8", "graft_quantize_i8(array<float>) - symmetric int8-style scalar quantization"),
      (exprs: Seq[Expression]) => {
        arity("graft_quantize_i8", 1, exprs)
        graft.expressions.QuantizeI8(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_int_dot"),
      info("graft_int_dot", "graft_int_dot(array<int>, array<int>) - exact 64-bit integer dot product"),
      (exprs: Seq[Expression]) => {
        arity("graft_int_dot", 2, exprs)
        graft.expressions.IntDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sort_key"),
      info("graft_sort_key", "graft_sort_key(double) - order-preserving double->long sort key for graft_top_k"),
      (exprs: Seq[Expression]) => {
        arity("graft_sort_key", 1, exprs)
        graft.expressions.DoubleSortKey(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_top_k"),
      info("graft_top_k", "graft_top_k(score, id, k) - single-pass bounded top-k aggregate, best-first array<struct<score,id>>"),
      (exprs: Seq[Expression]) => {
        arity("graft_top_k", 3, exprs)
        // the analyzer wraps a bare AggregateFunction into an
        // AggregateExpression during UnresolvedFunction resolution
        graft.expressions.TopKByScore(exprs.head, exprs(1),
          intParam("graft_top_k", exprs(2)))
      }))
    // the XML path (reference dispatch: file_flattener.py:156) — SQL
    // users compose tokenize + flatten with explode, same operators the
    // Scala API wraps
    ext.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      info("graft_tokenize", "graft_tokenize(content, endTag) - standalone re-terminated XML fragments"),
      (exprs: Seq[Expression]) => {
        arity("graft_tokenize", 2, exprs)
        graft.expressions.GraftTokenize(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_flatten"),
      info("graft_flatten", "graft_flatten(xml, readingType) - flattened rows as array<map<string,string>>"),
      (exprs: Seq[Expression]) => {
        arity("graft_flatten", 2, exprs)
        graft.expressions.GraftFlatten(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "graft_bloom_agg(key, numBits, numHashes) - Bloom filter over a bigint key column as one binary value"),
      (exprs: Seq[Expression]) => {
        arity("graft_bloom_agg", 3, exprs)
        graft.expressions.BloomAgg(exprs.head,
          intParam("graft_bloom_agg", exprs(1)),
          intParam("graft_bloom_agg", exprs(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters", "graft_heavy_hitters(term, k) - mergeable Misra-Gries frequent-item candidates, array<struct<term:string,cnt:bigint>>"),
      (exprs: Seq[Expression]) => {
        arity("graft_heavy_hitters", 2, exprs)
        graft.expressions.MisraGries(exprs.head,
          intParam("graft_heavy_hitters", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_maxsim"),
      info("graft_maxsim", "graft_maxsim(queryTokenHashes, docTokenHashes) - late-interaction MaxSim score over dim-16 integer hash-embeddings, bigint; inputs are reduced mod 1e9+7 into the polyHash domain first, so arbitrary bigint hashes are well-defined"),
      (exprs: Seq[Expression]) => {
        arity("graft_maxsim", 2, exprs)
        graft.expressions.MaxSim(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "graft_bloom_contains(filter, key) - membership probe against a graft_bloom_agg filter"),
      (exprs: Seq[Expression]) => {
        arity("graft_bloom_contains", 2, exprs)
        graft.expressions.BloomContains(exprs.head, exprs(1))
      }))
  }
}
