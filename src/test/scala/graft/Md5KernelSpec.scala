package graft

import org.apache.spark.sql.functions._

import graft.functions.{Md5Hash, ModPrime}
import graft.functions.md5exprs._

/** The md5 kernel family exists so near-dup queries can be DuckDB-
  * oracle-checked bit-exactly: these tests pin the JVM side to values
  * computed by DuckDB (`('0x'||substr(md5(s),1,16))::UBIGINT &
  * 9223372036854775807`) and the modular family to exact BigInt
  * arithmetic.
  */
class Md5KernelSpec extends SparkSuite {
  import spark.implicits._

  test("Md5Hash.lower63 matches DuckDB md5-prefix values") {
    // reference values from duckdb 1.x:
    //   SELECT ('0x'||substr(md5(s),1,16))::UBIGINT & 9223372036854775807
    assert(Md5Hash.lower63("hello world") === 6824707963431612112L)
    assert(Md5Hash.lower63("abc") === 1153291594369224624L)
    assert(Md5Hash.lower63("the quick brown fox") === 3527384202465209835L)
    assert(Md5Hash.lower63("") === 6061155539545534980L)
  }

  test("ModPrime.applyHash matches exact BigInt arithmetic (incl. DuckDB probe)") {
    // DuckDB: (1234567890123456789::HUGEINT * (4611686018427387123 % p)
    //          + 987654321098765432) % p  →  795802757036304368
    assert(ModPrime.applyHash(
      1234567890123456789L, 987654321098765432L, 4611686018427387123L)
      === 795802757036304368L)
    val p = BigInt(ModPrime.P)
    val rng = new scala.util.Random(99)
    (1 to 2000).foreach { _ =>
      val a = (BigInt(rng.nextLong()) mod (p - 1)).toLong + 1
      val b = (BigInt(rng.nextLong()) mod p).toLong
      val h = rng.nextLong() & Long.MaxValue
      val expected = ((BigInt(a) * (BigInt(h) mod p) + BigInt(b)) mod p).toLong
      assert(ModPrime.applyHash(a, b, h) === expected, s"a=$a b=$b h=$h")
    }
  }

  test("ModPrime.coeffs is deterministic and in range") {
    val (a1, b1) = ModPrime.coeffs(7L, 64)
    val (a2, b2) = ModPrime.coeffs(7L, 64)
    assert(a1.toSeq == a2.toSeq && b1.toSeq == b2.toSeq)
    assert(a1.forall(a => a >= 1 && a < ModPrime.P))
    assert(b1.forall(b => b >= 0 && b < ModPrime.P))
  }

  test("md5NgramHashes: distinct sorted space-joined shingle hashes") {
    val out = Seq("The  quick\tbrown fox", "ab", (null: String))
      .toDF("text")
      .select(md5NgramHashes(col("text"), 2).as("h"))
      .collect()
    val h0 = out(0).getSeq[Long](0)
    val expected = Seq("the quick", "quick brown", "brown fox")
      .map(Md5Hash.lower63).sorted
    assert(h0 == expected)
    assert(out(1).getSeq[Long](0).isEmpty) // 1 token < n
    assert(out(2).isNullAt(0))
  }

  test("minhashSigMod: per-member min over the modular family") {
    val shingles = Seq("a b", "b c", "c d").map(Md5Hash.lower63)
    val sig = Seq(Tuple1(shingles))
      .toDF("hs")
      .select(minhashSigMod(col("hs"), 8, 7L).as("sig"))
      .collect()(0).getSeq[Long](0)
    val (as, bs) = ModPrime.coeffs(7L, 8)
    val expected = (0 until 8).map(i =>
      shingles.map(h => ModPrime.applyHash(as(i), bs(i), h)).min)
    assert(sig == expected)
    // empty → null (too short to shingle)
    val n = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(minhashSigMod(col("hs"), 8, 7L).as("sig")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("simhashTextMd5: voted 63-bit fingerprint, repeats vote again") {
    val fp = Seq("x y x").toDF("text")
      .select(simhashTextMd5(col("text")).as("fp")).collect()(0).getLong(0)
    val hx = Md5Hash.lower63("x")
    val hy = Md5Hash.lower63("y")
    var expected = 0L
    (0 until 63).foreach { j =>
      val v = 2 * (((hx >>> j) & 1L) * 2 - 1) + (((hy >>> j) & 1L) * 2 - 1)
      if (v > 0) expected |= (1L << j)
    }
    assert(fp === expected)
    assert(fp >= 0L)
    // empty text → all votes 0 → fingerprint 0
    val z = Seq("").toDF("text")
      .select(simhashTextMd5(col("text")).as("fp")).collect()(0).getLong(0)
    assert(z === 0L)
  }

  test("winnowFingerprintMd5: rightmost window minimum, distinct sorted") {
    // k=2, w=2 over "abcde": grams ab bc cd de
    val gs = Seq("ab", "bc", "cd", "de").map(Md5Hash.lower63)
    val wins = gs.sliding(2).map { win =>
      if (win(1) <= win(0)) win(1) else win(0) // rightmost tie rule
    }.toSeq.distinct.sorted
    val out = Seq("abcde").toDF("text")
      .select(winnowFingerprintMd5(col("text"), 2, 2).as("fp"))
      .collect()(0).getSeq[Long](0)
    assert(out == wins)
    // shorter than k → empty
    val e = Seq("a").toDF("text")
      .select(winnowFingerprintMd5(col("text"), 2, 2).as("fp"))
      .collect()(0).getSeq[Long](0)
    assert(e.isEmpty)
    // nGrams <= w → single global min
    val g = Seq("abc").toDF("text") // grams ab, bc; w=4
      .select(winnowFingerprintMd5(col("text"), 2, 4).as("fp"))
      .collect()(0).getSeq[Long](0)
    assert(g == Seq(Seq(Md5Hash.lower63("ab"), Md5Hash.lower63("bc")).min))
  }

  test("md5 minhash family: planted near-dups found with exact est_jaccard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different content with nothing shared at all here now")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.MinHashLsh.nearDupPairs(
      docs, "doc_id", "text", threshold = 0.5,
      family = graft.operators.MinHashLsh.Family.Md5Mod(7L))
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getDouble(2) >= 0.5 && pairs.head.getDouble(2) <= 1.0)
  }
}
