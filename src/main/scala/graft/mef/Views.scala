package graft.mef

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Clean
import graft.mef.Star.StarSchema

/** The denormalizing view layer (`sql/CreacionDeUsuariosyVistas.sql`):
  * three DataFrame-returning functions, registrable as temp views for
  * `spark.sql` access. Inner joins throughout — safe because the fact
  * builder already enforced FK completeness (SURVEY.md §7.4.5).
  */
object Views {

  private def joinStar(star: StarSchema, dimNames: Seq[String]): DataFrame = {
    val withTiempo = star.fact.join(broadcast(star.dimTiempo), "tiempo_id")
    MefSchema.dims.filter(d => dimNames.contains(d.name)).foldLeft(withTiempo) {
      (df, spec) => df.join(broadcast(star.dims(spec.name)), spec.id)
    }
  }

  /** vw_gasto_mensual (`sql/CreacionDeUsuariosyVistas.sql:21-114`):
    * fact ⋈ all 8 dims, every descriptive attribute + COALESCE'd measures.
    */
  def vwGastoMensual(star: StarSchema): DataFrame = {
    val all = joinStar(star, MefSchema.dims.map(_.name))
    val idAndTime = Seq(
      col("tiempo_id"), col("fecha").cast("date").as("fecha"),
      col("anio"), col("mes"), col("trimestre"))
    val dimAttrs = MefSchema.dims.flatMap(d => (d.id +: d.allCols).map(col))
    val measures = MefSchema.measures.map(m => Clean.medida(col(m)).as(m))
    all.select(idAndTime ++ dimAttrs ++ measures: _*)
  }

  /** vw_gasto_agregado_mensual (`sql/CreacionDeUsuariosyVistas.sql:119-179`):
    * month-grain rollup over ejecutora/financiera/clasificador with
    * blank→placeholder keys and the map-friendly region label.
    */
  def vwGastoAgregadoMensual(star: StarSchema): DataFrame = {
    val base = joinStar(star,
      Seq("dim_ejecutora", "dim_financiera", "dim_clasificador_gasto"))
    val depNorm = Clean.conPlaceholder(col("dep_ejecutora_nombre"), "SIN DEPARTAMENTO")
    base.groupBy(
      col("anio"), col("mes"), col("trimestre"),
      col("ejecutora_nombre"),
      Clean.conPlaceholder(col("sector_nombre"), "SIN SECTOR").as("sector_nombre"),
      Clean.conPlaceholder(col("pliego_nombre"), "SIN PLIEGO").as("pliego_nombre"),
      depNorm.as("dep_ejecutora_nombre"),
      Clean.conPlaceholder(col("prov_ejecutora_nombre"), "SIN PROVINCIA").as("prov_ejecutora_nombre"),
      Clean.conPlaceholder(col("dist_ejecutora_nombre"), "SIN DISTRITO").as("dist_ejecutora_nombre"),
      concat(lit("Departamento de "), depNorm, lit(", Perú")).as("region_mapa"),
      col("fuente_financiamiento_nombre"),
      col("categoria_gasto_nombre"),
      col("generica_nombre"),
      col("especifica_nombre"))
      .agg(
        sum(Clean.medida(col("monto_pia"))).as("pia"),
        sum(Clean.medida(col("monto_pim"))).as("pim"),
        sum(Clean.medida(col("monto_certificado"))).as("certificado"),
        sum(Clean.medida(col("monto_comprometido_anual"))).as("comprometido_anual"),
        sum(Clean.medida(col("monto_comprometido"))).as("comprometido"),
        sum(Clean.medida(col("monto_devengado"))).as("devengado"),
        sum(Clean.medida(col("monto_girado"))).as("girado"))
  }

  /** vw_gasto_agregado_anual (`sql/CreacionDeUsuariosyVistas.sql:185-196`). */
  def vwGastoAgregadoAnual(star: StarSchema): DataFrame =
    joinStar(star, Seq("dim_ejecutora"))
      .groupBy(col("anio"), col("sector_nombre"), col("pliego_nombre"))
      .agg(
        sum(Clean.medida(col("monto_pim"))).as("pim"),
        sum(Clean.medida(col("monto_devengado"))).as("devengado"),
        sum(Clean.medida(col("monto_girado"))).as("girado"))

  /** Register all three as temp views for `spark.sql` access
    * (`CREATE OR REPLACE VIEW` analog).
    */
  def registerAll(star: StarSchema): Unit = {
    vwGastoMensual(star).createOrReplaceTempView("vw_gasto_mensual")
    vwGastoAgregadoMensual(star).createOrReplaceTempView("vw_gasto_agregado_mensual")
    vwGastoAgregadoAnual(star).createOrReplaceTempView("vw_gasto_agregado_anual")
  }
}
