package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.mef._

/** The SQL surface: a reference user's analytic SQL
  * (`sql/ConsultasAlDataWarehouse.sql`) runs through `spark.sql` over
  * the registered star tables with only mechanical edits (schema
  * prefix dropped, params inlined — the reference binds them via a
  * 1-row CTE cross join, kept verbatim here), and agrees with the
  * DataFrame formulations.
  */
class SqlSurfaceSpec extends SparkSuite {

  private lazy val star: Star.StarSchema = {
    val header = Seq("ANO_EJE", "MES_EJE", "NIVEL_GOBIERNO", "NIVEL_GOBIERNO_NOMBRE",
      "SEC_EJEC", "EJECUTORA", "EJECUTORA_NOMBRE", "SECTOR", "SECTOR_NOMBRE",
      "ESPECIFICA", "ESPECIFICA_NOMBRE", "MONTO_COMPROMETIDO", "MONTO_DEVENGADO")
    val rows = Seq(
      Seq("2025", "1", "E", "GN", "001", "E1", "Hospital", "01", "SALUD", "ES1", "Personal", "80", "50"),
      Seq("2025", "2", "E", "GN", "001", "E1", "Hospital", "01", "SALUD", "ES1", "Personal", "20", "30"),
      Seq("2025", "1", "R", "GR", "002", "E2", "Colegio", "02", "EDUCACION", "ES2", "Bienes", "40", "10"))
    val csv = (header.mkString(",") +: rows.map(_.mkString(","))).mkString("\n")
    val dir = Files.createTempDirectory("sqlsurface")
    val p = dir.resolve("2025-Gasto-Mensual.csv")
    Files.write(p, csv.getBytes(StandardCharsets.UTF_8))
    val s = MefPipeline.buildFromCsv(spark, Seq(p.toString))
    // register the star + views under the reference's table names
    s.fact.createOrReplaceTempView("fact_gasto_mensual")
    s.dimTiempo.createOrReplaceTempView("dim_tiempo")
    s.dims.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    Views.registerAll(s)
    s
  }

  test("A4 SQL text ≡ Analytics.ytdDevengadoPorSector") {
    star // force registration
    val sql = spark.sql(
      """WITH params AS (SELECT 2025 AS anio, 8 AS mes_corte)
        |SELECT ej.sector_nombre, SUM(f.monto_devengado) AS devengado_ytd
        |FROM fact_gasto_mensual f
        |JOIN dim_tiempo dt ON dt.tiempo_id = f.tiempo_id
        |JOIN dim_ejecutora ej ON ej.ejecutora_id = f.ejecutora_id
        |CROSS JOIN params p
        |WHERE dt.anio = p.anio AND dt.mes BETWEEN 1 AND p.mes_corte
        |GROUP BY ej.sector_nombre
        |ORDER BY devengado_ytd DESC""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    val df = Analytics.ytdDevengadoPorSector(star, 2025, 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    assert(sql == df && sql == Seq("SALUD" -> 80.0, "EDUCACION" -> 10.0))
  }

  test("A7 SQL text (backlog with HAVING) ≡ Analytics.pendientePorEjecutar") {
    star
    val sql = spark.sql(
      """WITH params AS (SELECT 2025 AS anio, 8 AS mes_corte)
        |SELECT cg.especifica, cg.especifica_nombre,
        |  SUM(f.monto_comprometido) AS comprometido_ytd,
        |  SUM(f.monto_devengado)    AS devengado_ytd,
        |  SUM(f.monto_comprometido) - SUM(f.monto_devengado) AS backlog
        |FROM fact_gasto_mensual f
        |JOIN dim_tiempo dt ON dt.tiempo_id = f.tiempo_id
        |JOIN dim_clasificador_gasto cg ON cg.clasif_gasto_id = f.clasif_gasto_id
        |CROSS JOIN params p
        |WHERE dt.anio = p.anio AND dt.mes BETWEEN 1 AND p.mes_corte
        |GROUP BY cg.especifica, cg.especifica_nombre
        |HAVING (SUM(f.monto_comprometido) - SUM(f.monto_devengado)) > 0
        |ORDER BY backlog DESC
        |LIMIT 20""".stripMargin)
      .collect().map(r => (r.getString(0), r.getAs[Double]("backlog"))).toSeq
    val df = Analytics.pendientePorEjecutar(star, 2025, 8)
      .collect().map(r => (r.getString(0), r.getAs[Double]("backlog"))).toSeq
    assert(sql == df && sql == Seq("ES2" -> 30.0, "ES1" -> 20.0))
  }

  test("A5 SQL text (top-k ejecutoras) ≡ Analytics.topEjecutorasPorDevengado") {
    star
    val sql = spark.sql(
      """WITH params AS (SELECT 2025 AS anio)
        |SELECT ej.ejecutora_nombre, SUM(f.monto_devengado) AS devengado_anual
        |FROM fact_gasto_mensual f
        |JOIN dim_tiempo dt ON dt.tiempo_id = f.tiempo_id
        |JOIN dim_ejecutora ej ON ej.ejecutora_id = f.ejecutora_id
        |CROSS JOIN params p
        |WHERE dt.anio = p.anio
        |GROUP BY ej.ejecutora_nombre
        |ORDER BY devengado_anual DESC
        |LIMIT 5""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    val df = Analytics.topEjecutorasPorDevengado(star, 2025, 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    assert(sql == df && sql == Seq("Hospital" -> 80.0, "Colegio" -> 10.0))
  }

  test("A6 SQL text (share via 1-row cross join) ≡ Analytics.participacionPorEjecutora") {
    star
    val sql = spark.sql(
      """WITH params AS (SELECT 2025 AS anio, 8 AS mes_corte, 'SALUD' AS sector),
        |ytd AS (
        |  SELECT ej.ejecutora_nombre, SUM(f.monto_devengado) AS dev_ytd
        |  FROM fact_gasto_mensual f
        |  JOIN dim_tiempo dt ON dt.tiempo_id = f.tiempo_id
        |  JOIN dim_ejecutora ej ON ej.ejecutora_id = f.ejecutora_id
        |  CROSS JOIN params p
        |  WHERE dt.anio = p.anio AND dt.mes BETWEEN 1 AND p.mes_corte
        |    AND ej.sector_nombre = p.sector
        |  GROUP BY ej.ejecutora_nombre),
        |tot AS (SELECT SUM(dev_ytd) AS dev_sector FROM ytd)
        |SELECT y.ejecutora_nombre, y.dev_ytd,
        |  CASE WHEN t.dev_sector > 0 THEN y.dev_ytd / t.dev_sector ELSE 0 END AS share
        |FROM ytd y CROSS JOIN tot t
        |ORDER BY y.dev_ytd DESC""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val df = Analytics.participacionPorEjecutora(star, 2025, 8, "SALUD")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(sql == df && sql == Seq(("Hospital", 80.0, 1.0)))
  }

  test("A8 SQL text (quarterly by gov level) ≡ Analytics.evolucionTrimestral") {
    star
    val sql = spark.sql(
      """WITH params AS (SELECT 2025 AS anio_ini, 2025 AS anio_fin)
        |SELECT dt.anio, dt.trimestre, ng.nivel_gobierno_nombre,
        |  SUM(f.monto_devengado) AS dev_trimestral
        |FROM fact_gasto_mensual f
        |JOIN dim_tiempo dt ON dt.tiempo_id = f.tiempo_id
        |JOIN dim_nivel_gobierno ng ON ng.nivel_gobierno_id = f.nivel_gobierno_id
        |CROSS JOIN params p
        |WHERE dt.anio BETWEEN p.anio_ini AND p.anio_fin
        |GROUP BY dt.anio, dt.trimestre, ng.nivel_gobierno_nombre
        |ORDER BY dt.anio, dt.trimestre, ng.nivel_gobierno_nombre""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
    val df = Analytics.evolucionTrimestral(star, 2025, 2025)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
    assert(sql == df && sql == Seq((2025, 1, "GN", 80.0), (2025, 1, "GR", 10.0)))
  }

  test("view SQL: vw_gasto_agregado_mensual queryable via spark.sql") {
    star
    val out = spark.sql(
      """SELECT sector_nombre, SUM(devengado) AS dev
        |FROM vw_gasto_agregado_mensual
        |GROUP BY sector_nombre ORDER BY dev DESC""".stripMargin).collect()
    assert(out.map(r => r.getString(0) -> r.getDouble(1)).toSeq ==
      Seq("SALUD" -> 80.0, "EDUCACION" -> 10.0))
  }
}
