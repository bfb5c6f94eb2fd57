package graft.mef

/** The reference's data model, declared once.
  *
  * - `colsClave`: the 69 retained raw columns
  *   (`etl/transformar_mensual.py:32-69`).
  * - `colsNum`: raw columns parsed to numeric (`etl/transformar_mensual.py:71-75`).
  * - `normalized`: raw → snake_case target mapping of the loader's
  *   `construir_df_normalizado` (`etl/cargar_postgres.py:159-233`).
  * - `dims`: the 7 attribute dimensions with natural keys + full column
  *   sets (`etl/cargar_postgres.py:287-316`); `dim_tiempo` is generated,
  *   not extracted (`sql/CreacionDeDataWareHouse.sql:9-24`).
  * - `measures`: the 7 money measures (`sql/CreacionDeDataWareHouse.sql:127-133`).
  */
object MefSchema {

  val colsClave: Seq[String] = Seq(
    "ANO_EJE", "MES_EJE",
    "NIVEL_GOBIERNO", "NIVEL_GOBIERNO_NOMBRE",
    "SEC_EJEC", "EJECUTORA", "EJECUTORA_NOMBRE",
    "SECTOR", "SECTOR_NOMBRE", "PLIEGO", "PLIEGO_NOMBRE",
    "DEPARTAMENTO_EJECUTORA", "DEPARTAMENTO_EJECUTORA_NOMBRE",
    "PROVINCIA_EJECUTORA", "PROVINCIA_EJECUTORA_NOMBRE",
    "DISTRITO_EJECUTORA", "DISTRITO_EJECUTORA_NOMBRE",
    "PROGRAMA_PPTO", "PROGRAMA_PPTO_NOMBRE",
    "TIPO_ACT_PROY", "TIPO_ACT_PROY_NOMBRE",
    "PRODUCTO_PROYECTO", "PRODUCTO_PROYECTO_NOMBRE",
    "ACTIVIDAD_ACCION_OBRA", "ACTIVIDAD_ACCION_OBRA_NOMBRE",
    "SEC_FUNC",
    "FUNCION", "FUNCION_NOMBRE",
    "DIVISION_FUNCIONAL", "DIVISION_FUNCIONAL_NOMBRE",
    "GRUPO_FUNCIONAL", "GRUPO_FUNCIONAL_NOMBRE",
    "META", "FINALIDAD", "META_NOMBRE",
    "DEPARTAMENTO_META", "DEPARTAMENTO_META_NOMBRE", "FINALIDAD_NOMBRE",
    "FUENTE_FINANCIAMIENTO", "FUENTE_FINANCIAMIENTO_NOMBRE",
    "RUBRO", "RUBRO_NOMBRE", "TIPO_RECURSO", "TIPO_RECURSO_NOMBRE",
    "CATEGORIA_GASTO", "CATEGORIA_GASTO_NOMBRE",
    "TIPO_TRANSACCION",
    "GENERICA", "GENERICA_NOMBRE",
    "SUBGENERICA", "SUBGENERICA_NOMBRE",
    "SUBGENERICA_DET", "SUBGENERICA_DET_NOMBRE",
    "ESPECIFICA", "ESPECIFICA_NOMBRE",
    "ESPECIFICA_DET", "ESPECIFICA_DET_NOMBRE",
    "MONTO_PIA", "MONTO_PIM", "MONTO_CERTIFICADO", "MONTO_COMPROMETIDO_ANUAL",
    "MONTO_COMPROMETIDO", "MONTO_DEVENGADO", "MONTO_GIRADO")

  val colsNum: Seq[String] = Seq(
    "ANO_EJE", "MES_EJE", "SEC_FUNC", "TIPO_TRANSACCION",
    "MONTO_PIA", "MONTO_PIM", "MONTO_CERTIFICADO", "MONTO_COMPROMETIDO_ANUAL",
    "MONTO_COMPROMETIDO", "MONTO_DEVENGADO", "MONTO_GIRADO")

  /** snake_case target → raw source. Numeric targets are the intersection
    * with [[numericNormalized]]; everything else is trimmed string.
    */
  val normalized: Seq[(String, String)] = Seq(
    "ano_eje" -> "ANO_EJE",
    "mes_eje" -> "MES_EJE",
    "nivel_gobierno_codigo" -> "NIVEL_GOBIERNO",
    "nivel_gobierno_nombre" -> "NIVEL_GOBIERNO_NOMBRE",
    "sec_ejec" -> "SEC_EJEC",
    "ejecutora_codigo" -> "EJECUTORA",
    "ejecutora_nombre" -> "EJECUTORA_NOMBRE",
    "sector" -> "SECTOR",
    "sector_nombre" -> "SECTOR_NOMBRE",
    "pliego" -> "PLIEGO",
    "pliego_nombre" -> "PLIEGO_NOMBRE",
    "dep_ejecutora_codigo" -> "DEPARTAMENTO_EJECUTORA",
    "dep_ejecutora_nombre" -> "DEPARTAMENTO_EJECUTORA_NOMBRE",
    "prov_ejecutora_codigo" -> "PROVINCIA_EJECUTORA",
    "prov_ejecutora_nombre" -> "PROVINCIA_EJECUTORA_NOMBRE",
    "dist_ejecutora_codigo" -> "DISTRITO_EJECUTORA",
    "dist_ejecutora_nombre" -> "DISTRITO_EJECUTORA_NOMBRE",
    "programa_ppto" -> "PROGRAMA_PPTO",
    "programa_ppto_nombre" -> "PROGRAMA_PPTO_NOMBRE",
    "tipo_act_proy" -> "TIPO_ACT_PROY",
    "tipo_act_proy_nombre" -> "TIPO_ACT_PROY_NOMBRE",
    "producto_proyecto" -> "PRODUCTO_PROYECTO",
    "producto_proyecto_nombre" -> "PRODUCTO_PROYECTO_NOMBRE",
    "actividad_accion_obra" -> "ACTIVIDAD_ACCION_OBRA",
    "actividad_accion_obra_nombre" -> "ACTIVIDAD_ACCION_OBRA_NOMBRE",
    "sec_func" -> "SEC_FUNC",
    "funcion" -> "FUNCION",
    "funcion_nombre" -> "FUNCION_NOMBRE",
    "division_funcional" -> "DIVISION_FUNCIONAL",
    "division_funcional_nombre" -> "DIVISION_FUNCIONAL_NOMBRE",
    "grupo_funcional" -> "GRUPO_FUNCIONAL",
    "grupo_funcional_nombre" -> "GRUPO_FUNCIONAL_NOMBRE",
    "meta" -> "META",
    "finalidad" -> "FINALIDAD",
    "finalidad_nombre" -> "FINALIDAD_NOMBRE",
    "meta_nombre" -> "META_NOMBRE",
    "dep_meta_codigo" -> "DEPARTAMENTO_META",
    "dep_meta_nombre" -> "DEPARTAMENTO_META_NOMBRE",
    "fuente_financiamiento" -> "FUENTE_FINANCIAMIENTO",
    "fuente_financiamiento_nombre" -> "FUENTE_FINANCIAMIENTO_NOMBRE",
    "rubro" -> "RUBRO",
    "rubro_nombre" -> "RUBRO_NOMBRE",
    "tipo_recurso" -> "TIPO_RECURSO",
    "tipo_recurso_nombre" -> "TIPO_RECURSO_NOMBRE",
    "categoria_gasto" -> "CATEGORIA_GASTO",
    "categoria_gasto_nombre" -> "CATEGORIA_GASTO_NOMBRE",
    "tipo_transaccion" -> "TIPO_TRANSACCION",
    "generica" -> "GENERICA",
    "generica_nombre" -> "GENERICA_NOMBRE",
    "subgenerica" -> "SUBGENERICA",
    "subgenerica_nombre" -> "SUBGENERICA_NOMBRE",
    "subgenerica_det" -> "SUBGENERICA_DET",
    "subgenerica_det_nombre" -> "SUBGENERICA_DET_NOMBRE",
    "especifica" -> "ESPECIFICA",
    "especifica_nombre" -> "ESPECIFICA_NOMBRE",
    "especifica_det" -> "ESPECIFICA_DET",
    "especifica_det_nombre" -> "ESPECIFICA_DET_NOMBRE",
    "monto_pia" -> "MONTO_PIA",
    "monto_pim" -> "MONTO_PIM",
    "monto_certificado" -> "MONTO_CERTIFICADO",
    "monto_comprometido_anual" -> "MONTO_COMPROMETIDO_ANUAL",
    "monto_comprometido" -> "MONTO_COMPROMETIDO",
    "monto_devengado" -> "MONTO_DEVENGADO",
    "monto_girado" -> "MONTO_GIRADO")

  /** Normalized columns carried as double (`pd.to_numeric`). */
  val numericNormalized: Set[String] = Set(
    "ano_eje", "mes_eje", "tipo_transaccion",
    "monto_pia", "monto_pim", "monto_certificado", "monto_comprometido_anual",
    "monto_comprometido", "monto_devengado", "monto_girado")

  val measures: Seq[String] = Seq(
    "monto_pia", "monto_pim", "monto_certificado", "monto_comprometido_anual",
    "monto_comprometido", "monto_devengado", "monto_girado")

  /** One attribute dimension: surrogate id name, natural keys, all cols. */
  final case class DimSpec(name: String, id: String, keys: Seq[String], allCols: Seq[String])

  val dims: Seq[DimSpec] = Seq(
    DimSpec("dim_nivel_gobierno", "nivel_gobierno_id",
      Seq("nivel_gobierno_codigo"),
      Seq("nivel_gobierno_codigo", "nivel_gobierno_nombre")),
    DimSpec("dim_ejecutora", "ejecutora_id",
      Seq("sec_ejec", "ejecutora_codigo"),
      Seq("sec_ejec", "ejecutora_codigo", "ejecutora_nombre", "sector", "sector_nombre",
        "pliego", "pliego_nombre", "dep_ejecutora_codigo", "dep_ejecutora_nombre",
        "prov_ejecutora_codigo", "prov_ejecutora_nombre", "dist_ejecutora_codigo",
        "dist_ejecutora_nombre")),
    DimSpec("dim_programatica", "programatica_id",
      Seq("programa_ppto", "tipo_act_proy", "producto_proyecto", "actividad_accion_obra", "sec_func"),
      Seq("programa_ppto", "programa_ppto_nombre", "tipo_act_proy", "tipo_act_proy_nombre",
        "producto_proyecto", "producto_proyecto_nombre", "actividad_accion_obra",
        "actividad_accion_obra_nombre", "sec_func")),
    DimSpec("dim_funcional", "funcional_id",
      Seq("funcion", "division_funcional", "grupo_funcional"),
      Seq("funcion", "funcion_nombre", "division_funcional", "division_funcional_nombre",
        "grupo_funcional", "grupo_funcional_nombre")),
    DimSpec("dim_meta", "meta_id",
      Seq("meta", "finalidad", "dep_meta_codigo"),
      Seq("meta", "finalidad", "finalidad_nombre", "meta_nombre", "dep_meta_codigo",
        "dep_meta_nombre")),
    DimSpec("dim_financiera", "financiera_id",
      Seq("fuente_financiamiento", "rubro", "tipo_recurso", "categoria_gasto"),
      Seq("fuente_financiamiento", "fuente_financiamiento_nombre", "rubro", "rubro_nombre",
        "tipo_recurso", "tipo_recurso_nombre", "categoria_gasto", "categoria_gasto_nombre")),
    DimSpec("dim_clasificador_gasto", "clasif_gasto_id",
      Seq("tipo_transaccion", "generica", "subgenerica", "subgenerica_det", "especifica", "especifica_det"),
      Seq("tipo_transaccion", "generica", "generica_nombre", "subgenerica", "subgenerica_nombre",
        "subgenerica_det", "subgenerica_det_nombre", "especifica", "especifica_nombre",
        "especifica_det", "especifica_det_nombre")))

  /** Fact FK columns, in DDL order (`sql/CreacionDeDataWareHouse.sql:117-124`). */
  val factFks: Seq[String] = "tiempo_id" +: dims.map(_.id)

  /** Column documentation (SURVEY.md §2.11): the reference annotates its
    * raw table with `COMMENT ON COLUMN` ×63
    * (`sql/CreacionDBOrigen.sql:75-137`); the same domain knowledge —
    * re-stated, not copied — rides `StructField` metadata here so any
    * catalog or BI layer reading the normalized schema sees it.
    * [[Normalize]] attaches these on its output.
    */
  val columnComments: Map[String, String] = Map(
    "ano_eje" -> "Budget execution year",
    "mes_eje" -> "Budget execution month (1-12)",
    "nivel_gobierno_codigo" -> "Government level code: E=national, R=regional, M=local (sql/CreacionDBOrigen.sql:77)",
    "nivel_gobierno_nombre" -> "Government level name",
    "sec_ejec" -> "Executing unit budget code",
    "ejecutora_nombre" -> "Executing unit (unidad ejecutora) name",
    "sector_nombre" -> "Sector (ministry grouping) name",
    "pliego_nombre" -> "Budget entity (pliego) name",
    "fuente_financiamiento_nombre" -> "Financing source name",
    "especifica_nombre" -> "Expense classifier (específica) name",
    "monto_pia" -> "PIA: initial approved budget amount",
    "monto_pim" -> "PIM: modified budget amount after amendments",
    "monto_certificado" -> "Certified budget amount",
    "monto_comprometido_anual" -> "Annual committed amount",
    "monto_comprometido" -> "Committed amount",
    "monto_devengado" -> "Accrued (devengado) amount - the execution measure",
    "monto_girado" -> "Disbursed (girado) amount")
}
