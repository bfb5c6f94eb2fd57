package graft.mef

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** The loader's rename/restructure projection `construir_df_normalizado`
  * (`etl/cargar_postgres.py:159-233`): 69 raw columns → snake_case
  * normalized frame; codes/names as trimmed strings (NA-preserving),
  * time/measure columns as coerce-to-null doubles. One `select`, no
  * shuffle.
  */
object Normalize {
  def apply(transformed: DataFrame): DataFrame =
    transformed.select(MefSchema.normalized.map { case (target, source) =>
      val c = col(source)
      val e =
        if (MefSchema.numericNormalized.contains(target)) Clean.aNumero(c)
        else Clean.aCadena(c)
      // §2.11: COMMENT ON COLUMN analog — docs ride StructField metadata
      MefSchema.columnComments.get(target) match {
        case Some(doc) => e.as(target, new org.apache.spark.sql.types.MetadataBuilder()
          .putString("comment", doc).build())
        case None => e.as(target)
      }
    }: _*)
}
