package graft.mef

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.mef.Star.StarSchema

/** Warehouse constraint validation — the engine-side stand-in for the
  * DDL's PK/UNIQUE/FK enforcement
  * (`sql/CreacionDeDataWareHouse.sql:114-145`, dim uniques
  * `etl/cargar_postgres.py:101-113`), which Spark does not enforce
  * declaratively: every constraint becomes a counted check, one row
  * per constraint, `violations = 0` ⇔ the constraint holds.
  *
  * Scale shape: each check is a single aggregate or anti-join keyed on
  * the constraint's columns — the same shuffles a constraint-building
  * index would need, run on demand instead of per-write. Dim checks
  * run over bounded tables; the two fact checks (grain uniqueness, FK
  * integrity) shuffle the fact once each on its 8-FK grain / FK ids.
  */
object Validate {

  /** All constraint checks as one result frame:
    * (table, constraint, violations).
    */
  def validate(spark: SparkSession, star: StarSchema): DataFrame = {
    import spark.implicits._

    def dup(df: DataFrame, cols: Seq[String]): Long =
      df.groupBy(cols.map(col): _*).count().filter(col("count") > 1).count()

    val factChecks = Seq(
      ("fact_gasto_mensual", "unique_8fk_grain",
        dup(star.fact, MefSchema.factFks)),
      ("fact_gasto_mensual", "fk_not_null",
        star.fact.filter(MefSchema.factFks.map(col(_).isNull).reduce(_ || _)).count()))

    val fkIntegrity = MefSchema.dims.map { spec =>
      ("fact_gasto_mensual", s"fk_${spec.id}_references_${spec.name}",
        star.fact.select(col(spec.id))
          .join(star.dims(spec.name).select(col(spec.id)), Seq(spec.id), "left_anti")
          .count())
    }

    val tiempoIntegrity = Seq(
      ("fact_gasto_mensual", "fk_tiempo_id_references_dim_tiempo",
        star.fact.select(col("tiempo_id"))
          .join(star.dimTiempo.select(col("tiempo_id")), Seq("tiempo_id"), "left_anti")
          .count()))

    val dimChecks = MefSchema.dims.flatMap { spec =>
      val d = star.dims(spec.name)
      Seq(
        (spec.name, s"pk_${spec.id}_unique", dup(d, Seq(spec.id))),
        (spec.name, "natural_key_unique", dup(d, spec.keys)))
    }

    (factChecks ++ fkIntegrity ++ tiempoIntegrity ++ dimChecks)
      .toDF("table", "constraint", "violations")
  }

  /** True iff every constraint holds. */
  def holds(spark: SparkSession, star: StarSchema): Boolean =
    validate(spark, star).filter(col("violations") > 0).isEmpty
}
