package graft

import graft.sources.JdbcUpsertSink

/** SQL-surface registration of custom expressions + upsert SQL shape. */
class ExtensionsSpec extends SparkSuite {

  test("custom expressions callable from spark.sql") {
    // extensions apply at session build normally; for an existing
    // session, register through the function registry:
    GraftExtensions.register(spark)
    assert(spark.sql(
      "SELECT simhash_text('hello world') AS fp").collect()(0).getLong(0) != 0L)
    assert(spark.sql(
      "SELECT size(ngram_hashes('a b c d', 2)) AS n").collect()(0).getInt(0) == 3)
    assert(spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0).getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT size(winnow_fingerprint('abcdefghijklmnop', 8, 4)) AS n").collect()(0).getInt(0) > 0)
    assert(spark.sql(
      "SELECT simhash64(array('a','b')) AS fp").collect()(0).getLong(0) != 0L)
  }

  test("upsert statement: reference ON CONFLICT DO NOTHING shape") {
    val sql = JdbcUpsertSink.upsertStatement(
      "mef.fact_gasto_mensual",
      Seq("tiempo_id", "ejecutora_id", "monto_devengado"),
      Seq("tiempo_id", "ejecutora_id"))
    assert(sql ==
      "INSERT INTO mef.fact_gasto_mensual (tiempo_id, ejecutora_id, monto_devengado) " +
        "VALUES (?, ?, ?) ON CONFLICT (tiempo_id, ejecutora_id) DO NOTHING")
    assert(!JdbcUpsertSink.upsertStatement("t", Seq("a"), Nil).contains("CONFLICT"))
  }
}
