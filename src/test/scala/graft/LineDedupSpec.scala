package graft

import org.apache.spark.sql.functions._

import graft.operators.LineDedup

/** [[LineDedup.dropCommonLines]] against planted boilerplate: docs
  * share nav/footer lines while their body lines are unique, so a
  * correct line-grain dedup strips exactly the shared lines and keeps
  * body text byte-identical in original order.
  */
class LineDedupSpec extends SparkSuite {
  import spark.implicits._

  private val nav = "home products about contact"
  private val foot = "copyright example corp"

  // 10 docs: shared nav + unique body + shared footer; doc 9 is all
  // boilerplate (nav + footer only) to exercise the everything-dropped
  // path; doc 8 repeats its own body line twice (within-doc repeats
  // must NOT trip the cross-doc threshold).
  private lazy val docs = (0L until 10L).map { i =>
    val body =
      if (i == 9L) ""
      else if (i == 8L) s"body line $i\nbody line $i"
      else s"body line $i"
    val text =
      if (body.isEmpty) s"$nav\n$foot" else s"$nav\n$body\n$foot"
    (i, text)
  }.toDF("doc_id", "text")

  private lazy val out =
    LineDedup.dropCommonLines(docs, "doc_id", "text", maxDocs = 2L)
      .orderBy($"doc_id")
      .collect()

  test("shared boilerplate lines are dropped, unique bodies kept verbatim") {
    val d0 = out(0)
    assert(d0.getAs[String]("clean_text") == "body line 0")
    assert(d0.getAs[Long]("n_lines") == 3L)
    assert(d0.getAs[Long]("n_dropped") == 2L)
  }

  test("doc of pure boilerplate collapses to empty string, counts intact") {
    val d9 = out(9)
    assert(d9.getAs[String]("clean_text") == "")
    assert(d9.getAs[Long]("n_lines") == 2L)
    assert(d9.getAs[Long]("n_dropped") == 2L)
  }

  test("within-doc repeats don't count toward the cross-doc threshold") {
    val d8 = out(8)
    assert(d8.getAs[String]("clean_text") == "body line 8\nbody line 8")
    assert(d8.getAs[Long]("n_dropped") == 2L)
  }

  test("line order is preserved when an interior line is dropped") {
    // plant: three docs share a MIDDLE line; outer lines unique
    val mid = (0L until 3L).map(i => (i, s"head $i\nshared middle\ntail $i"))
      .toDF("doc_id", "text")
    val r = LineDedup.dropCommonLines(mid, "doc_id", "text", maxDocs = 2L)
      .orderBy($"doc_id").collect()
    assert(r(1).getAs[String]("clean_text") == "head 1\ntail 1")
  }

  test("threshold is strict: lines in exactly maxDocs docs survive") {
    val two = Seq(
      (1L, "shared pair line\nsolo a"),
      (2L, "shared pair line\nsolo b"),
      (3L, "solo c")).toDF("doc_id", "text")
    val r = LineDedup.dropCommonLines(two, "doc_id", "text", maxDocs = 2L)
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[String]("clean_text") == "shared pair line\nsolo a")
    assert(r(0).getAs[Long]("n_dropped") == 0L)
  }
}
