package graft.mef

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Clean
import graft.mef.Star.StarSchema

/** The five canonical analytic queries
  * (`sql/ConsultasAlDataWarehouse.sql`), parameterized as functions —
  * the idiomatic port of the reference's `WITH params AS (...) CROSS
  * JOIN` binding (SURVEY.md J8). Each declares a plan Catalyst executes
  * as broadcast-star join → partial+final hash aggregate →
  * TakeOrderedAndProject where limited.
  */
object Analytics {

  private def factTiempo(star: StarSchema): DataFrame =
    star.fact.join(broadcast(star.dimTiempo), "tiempo_id")

  private def withEjecutora(df: DataFrame, star: StarSchema): DataFrame =
    df.join(broadcast(star.dims("dim_ejecutora")), "ejecutora_id")

  /** A4 — YTD accrual by sector (`sql/ConsultasAlDataWarehouse.sql:2-16`). */
  def ytdDevengadoPorSector(star: StarSchema, anio: Int, mesCorte: Int): DataFrame =
    withEjecutora(
      factTiempo(star).filter(col("anio") === anio && col("mes").between(1, mesCorte)), star)
      .groupBy(col("sector_nombre"))
      .agg(sum(col("monto_devengado")).as("devengado_ytd"))
      .orderBy(desc("devengado_ytd"))

  /** A5 — top-k executing units by annual accrual
    * (`sql/ConsultasAlDataWarehouse.sql:19-33`; k=5 in the reference).
    */
  def topEjecutorasPorDevengado(star: StarSchema, anio: Int, k: Int = 5): DataFrame =
    withEjecutora(factTiempo(star).filter(col("anio") === anio), star)
      .groupBy(col("ejecutora_nombre"))
      .agg(sum(col("monto_devengado")).as("devengado_anual"))
      .orderBy(desc("devengado_anual"))
      .limit(k)

  /** A6 — share of each executing unit within one sector's YTD accrual
    * (`sql/ConsultasAlDataWarehouse.sql:36-60`): two-level aggregate,
    * 1-row total cross-joined back, guarded division.
    */
  def participacionPorEjecutora(
      star: StarSchema, anio: Int, mesCorte: Int, sector: String): DataFrame = {
    val ytd = withEjecutora(
      factTiempo(star).filter(col("anio") === anio && col("mes").between(1, mesCorte)), star)
      .filter(col("sector_nombre") === sector)
      .groupBy(col("ejecutora_nombre"))
      .agg(sum(col("monto_devengado")).as("dev_ytd"))
    val tot = ytd.agg(sum(col("dev_ytd")).as("dev_sector"))
    ytd.crossJoin(broadcast(tot))
      .select(
        col("ejecutora_nombre"),
        col("dev_ytd"),
        Clean.divisionSegura(col("dev_ytd"), col("dev_sector")).as("share"))
      .orderBy(desc("dev_ytd"))
  }

  /** A7 — backlog (committed − accrued) by expense classifier, positive
    * only, top-20 (`sql/ConsultasAlDataWarehouse.sql:64-83`).
    */
  def pendientePorEjecutar(star: StarSchema, anio: Int, mesCorte: Int, k: Int = 20): DataFrame =
    factTiempo(star)
      .filter(col("anio") === anio && col("mes").between(1, mesCorte))
      .join(broadcast(star.dims("dim_clasificador_gasto")), "clasif_gasto_id")
      .groupBy(col("especifica"), col("especifica_nombre"))
      .agg(
        sum(col("monto_comprometido")).as("comprometido_ytd"),
        sum(col("monto_devengado")).as("devengado_ytd"))
      .withColumn("backlog", col("comprometido_ytd") - col("devengado_ytd"))
      .filter(col("backlog") > 0)
      .orderBy(desc("backlog"))
      .limit(k)

  /** A4, running-window formulation (SURVEY.md §2.5's optional variant):
    * per-(sector, month) accrual with a cumulative YTD column — one
    * pass over the year instead of re-aggregating per cutoff. The
    * non-window [[ytdDevengadoPorSector]] remains the parity form.
    */
  def ytdAcumuladoMensual(star: StarSchema, anio: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sector_nombre"))
      .orderBy(col("mes"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    withEjecutora(factTiempo(star).filter(col("anio") === anio), star)
      .groupBy(col("sector_nombre"), col("mes"))
      .agg(sum(col("monto_devengado")).as("devengado_mes"))
      .withColumn("devengado_ytd", sum(col("devengado_mes")).over(w))
      .orderBy(col("sector_nombre"), col("mes"))
  }

  /** A8 — quarterly evolution by government level
    * (`sql/ConsultasAlDataWarehouse.sql:86-101`).
    */
  def evolucionTrimestral(star: StarSchema, anioIni: Int, anioFin: Int): DataFrame =
    factTiempo(star)
      .filter(col("anio").between(anioIni, anioFin))
      .join(broadcast(star.dims("dim_nivel_gobierno")), "nivel_gobierno_id")
      .groupBy(col("anio"), col("trimestre"), col("nivel_gobierno_nombre"))
      .agg(sum(col("monto_devengado")).as("dev_trimestral"))
      .orderBy(col("anio"), col("trimestre"), col("nivel_gobierno_nombre"))
}
