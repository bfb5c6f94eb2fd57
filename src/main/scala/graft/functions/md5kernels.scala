package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MD5-based twins of the xxhash64 text kernels.
  *
  * xxhash64 (seeded) exists only on the JVM side, so the default
  * kernels ([[NgramHashes]], [[SimHashText]], [[WinnowFingerprint]],
  * [[MinHashSig]]) can't be reproduced by a SQL oracle. MD5 is
  * bit-identical everywhere (RFC 1321): Spark computes it with
  * `MessageDigest`, DuckDB with `md5(...)` — so every kernel here has
  * an exact DuckDB twin of the form
  * `('0x' || substr(md5(s), 1, 16))::UBIGINT & 9223372036854775807`
  * (first 8 digest bytes big-endian, top bit cleared → the value is
  * non-negative in both engines and signed/unsigned orderings agree).
  *
  * The MinHash family is (a·h + b) mod p with p = 2⁶¹−1 (a Mersenne
  * prime, so the 128-bit product reduces with shifts — [[ModPrime]]),
  * seeded coefficients regenerable by the oracle-SQL builder.
  *
  * Use these in oracle-checked queries; keep the xxhash64 kernels as
  * the default at scale (MD5 costs ~5× more per token — fine for
  * verification corpora, wasteful at 100 TB).
  */
object Md5Hash {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 MD5 digest bytes, big-endian, top bit cleared (63-bit
    * non-negative). DuckDB twin:
    * `('0x'||substr(md5(s),1,16))::UBIGINT & 9223372036854775807`.
    */
  def lower63(s: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) & Long.MaxValue
  }

  /** [[lower63]] as a pure-builtin Column (codegen'd, no custom
    * Expression): top hex digit mod 8 (= clear the sign bit)
    * recombined with the next 15 hex digits — 7·2⁶⁰ + (2⁶⁰−1) < 2⁶³,
    * so every intermediate fits a signed long. Bit-identical to
    * [[lower63]] and to the DuckDB twin.
    */
  def lower63Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val h = md5(c.cast("binary"))
    (conv(substring(h, 1, 1), 16, 10).cast("long") % 8) *
      lit(1152921504606846976L) + // 2^60
      conv(substring(h, 2, 15), 16, 10).cast("long")
  }
}

/** Modular hash family over the Mersenne prime p = 2⁶¹−1, with exact
  * 128-bit → mod-p reduction (2⁶⁴ ≡ 8, 2⁶¹ ≡ 1 mod p). All inputs and
  * outputs are in [0, p) — safely positive signed longs, so Spark
  * longs and DuckDB HUGEINT arithmetic (`(a::HUGEINT*h + b) % p`)
  * agree bit-for-bit.
  */
object ModPrime {
  val P: Long = (1L << 61) - 1

  /** (a·b) mod p for 0 ≤ a, b < p. */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 → hi < 2^58
    val lo = a * b                   // low 64 bits (unsigned)
    // x = hi·2^64 + lo ≡ 8·hi + (lo >>> 61) + (lo & p)  (mod p)
    var t = 8 * hi + (lo >>> 61) + (lo & P)
    while (t >= P) t -= P
    t
  }

  /** (a·h + b) mod p for coefficients in [0,p) and any long h ≥ 0. */
  def applyHash(a: Long, b: Long, h: Long): Long = {
    var t = mulMod(a, h % P) + b
    while (t >= P) t -= P
    t
  }

  /** Deterministic coefficient family: a_i ∈ [1, p), b_i ∈ [0, p).
    * Drawn with `scala.util.Random(seed)` — the oracle-SQL builder
    * calls this same function and inlines the values as literals.
    */
  def coeffs(seed: Long, n: Int): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val as = Array.fill(n)(java.lang.Long.remainderUnsigned(rng.nextLong(), P - 1) + 1)
    val bs = Array.fill(n)(java.lang.Long.remainderUnsigned(rng.nextLong(), P))
    (as, bs)
  }
}

/** MD5 twin of [[NgramHashes]]: lowercase → whitespace-tokenize →
  * space-join each word n-gram → md5-lower63 → distinct, sorted.
  * Hashing the *joined shingle string* (not a token-hash chain) is what
  * makes the DuckDB twin possible:
  * `md5(array_to_string(toks[i:i+n-1], ' '))`.
  */
case class Md5NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_ngram_hashes requires string, got $other")
  }

  import NgramHashes.isWs

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks += s.substring(start, i)
    }
    val t = toks.length
    if (t < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.TreeSet[java.lang.Long]()
    var g = 0
    while (g <= t - n) {
      val sb = new java.lang.StringBuilder(toks(g))
      var j = g + 1
      while (j < g + n) { sb.append(' ').append(toks(j)); j += 1 }
      seen.add(Md5Hash.lower63(sb.toString))
      g += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5NgramHashes =
    copy(child = newChild)
}

/** Positional variant of [[Md5NgramHashes]]: hash of the n-gram STARTING
  * at each token index, in order, duplicates kept — element k (0-based)
  * covers tokens k..k+n−1, so `posexplode` recovers span start offsets.
  * The span-excision operator ([[graft.operators.SpanDedup]]) needs the
  * position to map a duplicated span back onto the tokens it covers;
  * the distinct/sorted form can't say WHERE a span occurred. DuckDB
  * twin: `md5(array_to_string(toks[i:i+n-1], ' '))` per i, no
  * list_distinct.
  */
case class Md5NgramHashesPos(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_ngram_hashes_pos"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_ngram_hashes_pos requires string, got $other")
  }

  import NgramHashes.isWs

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks += s.substring(start, i)
    }
    val t = toks.length
    if (t < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](t - n + 1)
    var g = 0
    while (g <= t - n) {
      val sb = new java.lang.StringBuilder(toks(g))
      var j = g + 1
      while (j < g + n) { sb.append(' ').append(toks(j)); j += 1 }
      out(g) = Md5Hash.lower63(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5NgramHashesPos =
    copy(child = newChild)
}

/** MD5/mod-prime twin of [[MinHashSig]]: member i of the signature is
  * min over shingle hashes h of (a_i·(h mod p) + b_i) mod p, with the
  * coefficient family drawn from [[ModPrime.coeffs]](seed). Exact
  * DuckDB twin: `min((a::HUGEINT * (h % p) + b) % p)` per (doc, i).
  * Null/empty input → null (doc too short to shingle).
  */
case class MinHashSigMod(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0, "numHashes must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig_mod"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_mod requires array<long>, got $other")
  }

  @transient private lazy val (as, bs) = ModPrime.coeffs(seed, numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s < n) {
      if (!arr.isNullAt(s)) {
        val h = arr.getLong(s) % ModPrime.P
        var i = 0
        while (i < numHashes) {
          val hi = {
            var t = ModPrime.mulMod(as(i), h) + bs(i)
            while (t >= ModPrime.P) t -= ModPrime.P
            t
          }
          if (hi < mins(i)) mins(i) = hi
          i += 1
        }
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMod =
    copy(child = newChild)
}

/** MD5 twin of [[SimHashText]]: 63-bit fingerprint voted from
  * md5-lower63 token hashes (token multiset — repeats vote again).
  * DuckDB twin votes with SUM over unnested (token, bit) pairs.
  */
case class SimHashTextMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_text_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_text_md5 requires string, got $other")
  }

  import NgramHashes.isWs

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val votes = new Array[Int](63)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val h = Md5Hash.lower63(s.substring(start, i))
        var j = 0
        while (j < 63) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var fp = 0L
    var j = 0
    while (j < 63) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashTextMd5 =
    copy(child = newChild)
}

/** MD5 twin of [[WinnowFingerprint]]: md5-lower63 over character
  * k-grams, rightmost-minimum per window of w, distinct sorted.
  * All hashes are non-negative, so the signed comparisons here and
  * DuckDB's UBIGINT ordering agree.
  */
case class WinnowFingerprintMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint_md5 requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = s.length - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = Md5Hash.lower63(s.substring(i, i + k))
      i += 1
    }
    val picked = scala.collection.mutable.SortedSet.empty[Long]
    if (nGrams <= w) {
      picked += hashes.min
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var mi = start
        var j = start + 1
        while (j < start + w) {
          if (hashes(j) <= hashes(mi)) mi = j
          j += 1
        }
        picked += hashes(mi)
        start += 1
      }
    }
    new GenericArrayData(picked.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintMd5 =
    copy(child = newChild)
}

object md5exprs {
  import org.apache.spark.sql.GraftShim

  /** Distinct md5-lower63 hashes of word n-grams (space-joined). */
  def md5NgramHashes(text: Column, n: Int): Column =
    GraftShim.column(Md5NgramHashes(GraftShim.expression(text), n))

  /** Positional md5-lower63 word n-gram hashes (in order, with dups). */
  def md5NgramHashesPos(text: Column, n: Int): Column =
    GraftShim.column(Md5NgramHashesPos(GraftShim.expression(text), n))

  /** Mod-prime MinHash signature of an md5 shingle-hash array. */
  def minhashSigMod(shingleHashes: Column, numHashes: Int, seed: Long): Column =
    GraftShim.column(MinHashSigMod(GraftShim.expression(shingleHashes), numHashes, seed))

  /** 63-bit md5-based SimHash fingerprint of a text column. */
  def simhashTextMd5(text: Column): Column =
    GraftShim.column(SimHashTextMd5(GraftShim.expression(text)))

  /** MD5 winnowing fingerprint set of a text column. */
  def winnowFingerprintMd5(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftShim.column(WinnowFingerprintMd5(GraftShim.expression(text), k, w))
}
