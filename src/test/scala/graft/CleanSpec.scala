package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Clean

/** F1-F4/F7-F10 semantics (SURVEY.md §2.8) including the property-style
  * checks called for in §5: idempotence and null-safety of the cleaning
  * kernel. All evaluated through the engine (one DataFrame pass), not
  * host-side reimplementations.
  */
class CleanSpec extends SparkSuite {
  import spark.implicits._

  private val handPicked: Seq[String] = Seq(
    null, "", " ", "  a  b   c ", "\tx\t\ty\t", "SALUD", " SIN  DATO ",
    "3.5", "003", "-1.25e2", "abc", "12abc", "ú ñ  é", "a\n b", "0", "13")

  private def genStrings: Seq[String] = {
    val g = Gen.listOfN(200, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.someOf(Seq(" ", "\t", "a", "9", ".", "-")).map(_.mkString)))
    g.apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
  }

  test("limpiarTexto: idempotent, null→empty, collapses runs") {
    val in = (handPicked ++ genStrings).toDF("s")
    val out = in.select(
      Clean.limpiarTexto($"s").as("once"),
      Clean.limpiarTexto(Clean.limpiarTexto($"s")).as("twice")).collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1), "idempotence")
      val once = r.getString(0)
      assert(once != null && once == once.trim && !once.contains("  "))
    }
  }

  test("aNumero: coerce-to-null, never throws under ANSI") {
    val rows = (handPicked ++ genStrings).toDF("s")
      .select($"s", Clean.aNumero($"s").as("n")).collect()
    rows.foreach { r =>
      val s = Option(r.getString(0))
      if (!r.isNullAt(1)) {
        // parsed values must round-trip through Scala's parser
        assert(s.exists(_.trim.nonEmpty))
      }
    }
    val known = Seq("3.5" -> Some(3.5), "003" -> Some(3.0), "-1.25e2" -> Some(-125.0),
      "abc" -> None, "" -> None, "12abc" -> None)
    val got = known.map(_._1).toDF("s").select(Clean.aNumero($"s")).collect()
    known.zip(got).foreach { case ((in, exp), row) =>
      assert((if (row.isNullAt(0)) None else Some(row.getDouble(0))) == exp, s"input '$in'")
    }
  }

  test("construirFecha: YYYY-MM-01, null-propagating") {
    val df = Seq((Some(2024), Some(2)), (None, Some(2)), (Some(2024), None))
      .toDF("a", "m")
      .select(Clean.construirFecha($"a", $"m").as("f")).collect()
    assert(df(0).getDate(0).toString == "2024-02-01")
    assert(df(1).isNullAt(0) && df(2).isNullAt(0))
  }

  test("conPlaceholder: blank/whitespace/null → placeholder; content kept") {
    val df = Seq("SALUD", "", "   ", null).toDF("s")
      .select(Clean.conPlaceholder($"s", "SIN SECTOR").as("p")).collect()
    assert(df.map(_.getString(0)).toSeq == Seq("SALUD", "SIN SECTOR", "SIN SECTOR", "SIN SECTOR"))
  }

  test("divisionSegura: zero/negative denominator → 0") {
    val df = Seq((10.0, 4.0), (10.0, 0.0), (10.0, -1.0)).toDF("n", "d")
      .select(Clean.divisionSegura($"n", $"d").as("q")).collect()
    assert(df.map(_.getDouble(0)).toSeq == Seq(2.5, 0.0, 0.0))
  }

  test("conformar: injects missing as null string, drops extras, orders") {
    val df = Seq(("1", "x")).toDF("B", "Z")
    val out = Clean.conformar(df, Seq("A", "B", "C"))
    assert(out.columns.toSeq == Seq("A", "B", "C"))
    val r = out.collect()(0)
    assert(r.isNullAt(0) && r.getString(1) == "1" && r.isNullAt(2))
  }
}
