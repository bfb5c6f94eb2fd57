package graft.mef

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** The Transform stage (`etl/transformar_mensual.py:110-197`) as one lazy
  * declarative plan: header canon (P1) → schema conformance (P2) → numeric
  * coercion (F2) → text cleaning (F1) → FECHA derivation (F3) → validity
  * filter (P3).
  *
  * Where the reference loops over 300k-row chunks to bound memory, Spark's
  * partitioned scan pipelines the same work with no manual chunking; the
  * whole stage is scan→project→filter, shuffle-free, and survives any
  * input scale (each executor sees only its split).
  */
object Transform {

  /** Raw all-string CSV frame → normalized typed frame. Column set out:
    * the 69 canonical columns (numerics as double, text cleaned) + FECHA.
    */
  def apply(raw: DataFrame): DataFrame = {
    val conformed = Clean.conformar(Clean.normalizarCabeceras(raw), MefSchema.colsClave)
    val numSet = MefSchema.colsNum.toSet
    val typed = conformed.select(MefSchema.colsClave.map { c =>
      if (numSet.contains(c)) Clean.aNumero(col(c)).as(c)
      else Clean.limpiarTexto(col(c)).as(c)
    }: _*)
    typed
      .withColumn("FECHA",
        Clean.construirFecha(col("ANO_EJE").cast("int"), col("MES_EJE").cast("int")))
      // P3: keep plausible year/month only (`etl/transformar_mensual.py:149`)
      .filter(col("ANO_EJE") > 0 && col("MES_EJE").between(1, 12))
  }
}
