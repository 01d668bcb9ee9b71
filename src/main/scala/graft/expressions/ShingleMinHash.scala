package graft.expressions

import java.util.{LinkedHashSet => JLinkedHashSet}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle hashing for MinHash dedup (SURVEY §7.6): the distinct
  * polynomial hashes of all n-word shingles of a text, WITHOUT
  * materializing the shingle strings.
  *
  * Equivalent by construction to
  * `array_distinct(transform(wordShingles(text, n), polyHash))` — the
  * hash of "w1 w2 … wn" is folded directly over the word bytes with a
  * single space (code 32) between words, so multi-space source text
  * still hashes like the normalized join. Windows run over positions
  * 1..len−n (kept in lockstep with the SQL oracle's range(1, len−n+1)).
  *
  * At 100 TB this is the difference between a narrow scan-speed stage
  * and an allocation-bound one: the HOF formulation builds ~50 shingle
  * strings per doc and re-evaluates them per lambda element; this
  * expression is one pass over the bytes.
  */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  private val P = PolyHash.P

  private[expressions] def isWhitespace(c: Char): Boolean = // java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Word [start, end) offsets with the EXACT semantics shared by
    * Spark's `split(trim(text), "\\s+")` and DuckDB's
    * `string_split_regex(trim(text), '\\s+')` (verified empirically):
    * trim strips SPACES only, and the regex split keeps an empty token
    * at either end when the space-trimmed string starts/ends with
    * non-space whitespace. An empty input yields one empty token. */
  private[expressions] def tokenize(str: String): (java.util.ArrayList[Integer], java.util.ArrayList[Integer]) = {
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    if (b == e) { // empty after trim -> single empty token
      starts.add(b); ends.add(b)
      return (starts, ends)
    }
    if (isWhitespace(str.charAt(b))) { starts.add(b); ends.add(b) }
    var i = b
    while (i < e) {
      while (i < e && isWhitespace(str.charAt(i))) i += 1
      if (i < e) {
        starts.add(i)
        while (i < e && !isWhitespace(str.charAt(i))) i += 1
        ends.add(i)
      }
    }
    if (isWhitespace(str.charAt(e - 1))) { starts.add(e); ends.add(e) }
    (starts, ends)
  }

  def hashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val (starts, ends) = tokenize(str)
    val wc = starts.size()
    // positions 1..wc-n ⇒ zero-based windows 0..wc-n-1 (matches oracle)
    val nWindows = wc - n
    if (nWindows <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new JLinkedHashSet[java.lang.Long]()
    var w = 0
    while (w < nWindows) {
      var h = 0L
      var k = 0
      while (k < n) {
        var p = starts.get(w + k).intValue()
        val e = ends.get(w + k).intValue()
        while (p < e) {
          val cp = str.codePointAt(p)
          h = (h * 31 + cp) % P
          p += Character.charCount(cp)
        }
        if (k < n - 1) h = (h * 31 + 32) % P // joining space
        k += 1
      }
      seen.add(h)
      w += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(c), n))
}

/** Native MinHash signature: k permutations h_j(x) = ((2j+1)x + 7919j +
  * 13) mod p folded to their minima over a long-array of element hashes
  * — one tight loop instead of k interpreted array_min lambdas. Empty
  * input → p sentinel per slot. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashSig.signature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val P = PolyHash.P

  def signature(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = 2L * j + 1
      val b = 7919L * j + 13
      var best = P
      var i = 0
      while (i < m) {
        val v = (a * hashes.getLong(i) + b) % P
        if (v < best) best = v
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  def apply(c: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), k))
}

/** Native SimHash: `bits`-bit fingerprint from element-hash votes.
  * Bit b of the output is set iff Σ over input hashes of
  * (±1 by bit ((x·(2b+1)) mod p) & 1) ≥ 0. Derives per-bit pseudo-
  * random projections from one hash array — one tight loop instead of
  * bits × interpreted lambda folds. `bits` must stay < 63 (sign bit).
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits < 63, "bits must be in [1, 62]")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashBits.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashBits.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  private val P = PolyHash.P

  def simhash(hashes: ArrayData, bits: Int): Long = {
    val m = hashes.numElements()
    var out = 0L
    var b = 0
    while (b < bits) {
      val mult = 2L * b + 1
      var vote = 0L
      var i = 0
      while (i < m) {
        val projected = (hashes.getLong(i) * mult) % P
        vote += (if ((projected & 1L) != 0L) 1L else -1L)
        i += 1
      }
      if (vote >= 0L) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(c: Column, bits: Int): Column =
    Bridge.column(SimHashBits(Bridge.expression(c), bits))
}

/** Native shingle STRING builder — the exact string semantics of
  * `array_distinct(transform(...))` over n-word windows (positions
  * 1..len−n, single-space join, first-occurrence order) in one pass,
  * for operators that must verify on the true shingle sets (d02's
  * exact Jaccard) without paying interpreted HOF lambda costs.
  */
case class WordShingleStrings(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_strings"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleStrings.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordShingleStrings.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleStrings =
    copy(child = newChild)
}

object WordShingleStrings {

  /** Tokenization is byte-for-byte the scanner used by
    * [[WordShingleHashes]], so the string set is exactly the hash set's
    * preimage (hash(shingles(s)) == hashes(s) for every input). */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val (starts, ends) = WordShingleHashes.tokenize(str)
    val words = new java.util.ArrayList[String]()
    var wi = 0
    while (wi < starts.size()) {
      words.add(str.substring(starts.get(wi).intValue(), ends.get(wi).intValue()))
      wi += 1
    }
    val nWindows = words.size() - n
    if (nWindows <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val seen = new JLinkedHashSet[String]()
    var w = 0
    while (w < nWindows) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(w + k))
        k += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(WordShingleStrings(Bridge.expression(c), n))
}

/** Native repetition statistics over the n-word shingle MULTISET:
  * `[max multiplicity, distinct count, total count]` in one pass —
  * the t08 quality signal. Counting is by true STRING equality (a
  * hash map keyed on the shingle string), so the result is identical
  * to grouping the materialized shingles — no collision caveat — but
  * nothing is exploded, shuffled, or lambda-evaluated: one codegen'd
  * static call per document. (The HOF sort+fold formulation measured
  * ~2× SLOWER than even the explode + double-groupBy it meant to
  * replace — higher-order lambdas are interpreted per element.)
  */
case class ShingleRepStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    ShingleRepStats.stats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleRepStats.stats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleRepStats =
    copy(child = newChild)
}

object ShingleRepStats {

  /** Same tokenizer as [[WordShingleHashes]]/[[WordShingleStrings]],
    * so the multiset counted here is exactly the multiset the SQL
    * oracle enumerates. */
  def stats(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val (starts, ends) = WordShingleHashes.tokenize(str)
    val words = new java.util.ArrayList[String]()
    var wi = 0
    while (wi < starts.size()) {
      words.add(str.substring(starts.get(wi).intValue(), ends.get(wi).intValue()))
      wi += 1
    }
    val nWindows = words.size() - n
    if (nWindows <= 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Long]()
    var maxRep = 0L
    var w = 0
    while (w < nWindows) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.get(w + k))
        k += 1
      }
      val key = sb.toString
      val c = counts.getOrDefault(key, 0L) + 1L
      counts.put(key, c)
      if (c > maxRep) maxRep = c
      w += 1
    }
    new GenericArrayData(Array(maxRep, counts.size().toLong, nWindows.toLong))
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(ShingleRepStats(Bridge.expression(c), n))
}
