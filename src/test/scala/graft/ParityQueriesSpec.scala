package graft

/** Smoke every SparkEntry query at sf0.001: runs, returns rows, and every
  * oracle entry points at an existing query. Deep value verification is
  * the driver's DuckDB gate (locally: tools/check_oracle.py).
  */
class ParityQueriesSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys ⊆ queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("entry: flagship rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
