package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.exprs

/** Generator-driven invariants for the round-3 kernels (the CleanSpec
  * pattern: evaluate THROUGH the engine, assert properties the kernel
  * must hold on arbitrary input — including a host-side recomputation
  * for TokenRepetition, the strongest check short of a second engine).
  */
class KernelPropertySpec extends SparkSuite {
  import spark.implicits._

  private def genTexts: Seq[String] = {
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const("a"), Gen.const("b"))
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \r ")
    val doc = for {
      n <- Gen.choose(0, 40)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n + 1, ws)
    } yield seps.zipAll(toks, " ", "").map { case (s, t) => s + t }.mkString
    Gen.listOfN(150, doc).apply(Gen.Parameters.default, Seed(7L)).getOrElse(Nil)
  }

  private def hostTokens(s: String): List[String] =
    s.toLowerCase.split("[\\t\\n\\f\\r ]+").filter(_.nonEmpty).toList

  test("TokenRepetition == host recomputation on generated text") {
    val texts = genTexts :+ "" :+ "  " :+ "x"
    val rows = texts.toDF("text")
      .select(col("text"), exprs.tokenRepetition(coalesce(col("text"), lit(""))).as("r"))
      .select(col("text"), col("r.n_tokens"), col("r.n_distinct"),
        col("r.n_bigrams"), col("r.top_bigram_count"))
      .collect()
    rows.foreach { r =>
      val toks = hostTokens(r.getString(0))
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toList
      val top = if (bigrams.isEmpty) 0 else bigrams.groupBy(identity).map(_._2.size).max
      assert(r.getInt(1) == toks.size, s"n_tokens for '${r.getString(0)}'")
      assert(r.getInt(2) == toks.distinct.size, "n_distinct")
      assert(r.getInt(3) == math.max(toks.size - 1, 0), "n_bigrams")
      assert(r.getInt(4) == top, s"top_bigram_count for '${r.getString(0)}'")
    }
  }

  test("WordNgrams: composition, count bound, distinctness on generated text") {
    for (n <- Seq(2, 3, 5)) {
      val rows = genTexts.toDF("text")
        .select(col("text"), exprs.wordNgrams(col("text"), n).as("g"))
        .collect()
      rows.foreach { r =>
        val toks = hostTokens(r.getString(0))
        val grams = r.getSeq[String](1)
        val expected = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList.distinct
        assert(grams.toList == expected, s"n=$n text='${r.getString(0)}'")
      }
    }
  }

  test("WordNgrams dedup=false: every window in order, multiplicity kept") {
    for (n <- Seq(1, 2, 3)) {
      val rows = genTexts.toDF("text")
        .select(col("text"), exprs.wordNgramsAll(col("text"), n).as("g"))
        .collect()
      rows.foreach { r =>
        val toks = hostTokens(r.getString(0))
        val grams = r.getSeq[String](1)
        val expected = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
        assert(grams.toList == expected, s"n=$n text='${r.getString(0)}'")
      }
    }
  }

  test("QuantizeStats: code bounds, sum envelope, monotone scale") {
    val gen = for {
      n <- Gen.choose(1, 32)
      vs <- Gen.listOfN(n, Gen.choose(-1000, 1000).map(_ / 7.0f))
    } yield vs
    val vecs = Gen.listOfN(120, gen)
      .apply(Gen.Parameters.default, Seed(11L)).getOrElse(Nil) :+
      List(5f, 5f, 5f) // constant vector edge
    val rows = vecs.map(Tuple1(_)).toDF("vec")
      .select(col("vec"), exprs.quantizeStats(col("vec")).as("q"))
      .select(col("vec"), col("q.q_min"), col("q.q_max"), col("q.q_sum"), col("q.scale"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val (qmin, qmax, qsum, scale) = (r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4))
      assert(qmin >= 0 && qmax <= 255 && qmin <= qmax, s"code range for $v")
      assert(qsum >= v.size.toLong * qmin && qsum <= v.size.toLong * qmax, "sum envelope")
      assert(scale >= 0.0, "scale sign")
      if (v.distinct.size == 1) assert(qmin == 0 && qmax == 0 && scale == 0.0, "constant vector")
      else {
        // min element codes exactly 0 ((mn−mn)/denom is exact); the max
        // element computes (denom·255)/denom — one rounding step, so
        // floor lands on 255 or one ulp short at 254
        assert(qmin == 0 && qmax >= 254, s"endpoint codes for $v")
      }
    }
  }

  test("SpaceEncode == composed regexp chain on generated text") {
    // generated docs include tabs/newlines/\r separators and mixed-case
    // alphanumerics; add literal-pipe and unicode adversaries by hand
    val texts = genTexts ++ Seq(
      "", " ", "|", "a|b", "| a |", "É Über straße", "ab", "x||||y")
    val bad = texts.toDF("text")
      .select(
        exprs.spaceEncode(coalesce(col("text"), lit(""))).as("k"),
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(coalesce(col("text"), lit(""))), "[\\t\\n\\f\\r ]+", "|"),
            "^\\|+|\\|+$", ""),
          "(.)", " $1 ").as("r"))
      .filter(col("k") =!= col("r"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}
