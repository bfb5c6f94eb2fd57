package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Scalable dense surrogate-id assignment — the 100 TB path for the
  * reference's SERIAL dimension keys (`sql/CreacionDeDataWareHouse.sql:
  * 9-138`).
  *
  * [[graft.mef.Star.buildDim]] assigns ids with `row_number()` over a
  * global window, which Spark executes on ONE partition — correct and
  * cheap for the reference's bounded dims (thousands of rows), but a
  * single-executor bottleneck the moment a dimension is not bounded
  * (documents, users, URLs). This operator assigns the same
  * sort-ordered dense ids 1..N with no global window:
  *
  *  1. range-repartition + sort within partitions on the key — the one
  *     shuffle, and every partition holds a contiguous key range;
  *  2. `zipWithIndex` — a count job over the sorted partitions
  *     computes per-partition offsets on the driver (numPartitions
  *     longs, not rows), then ids are emitted map-side as
  *     offset + local position.
  *
  * Two jobs over the data, O(partitions) driver state, no partition
  * carries more than its slice — survives any N. Ids equal
  * `row_number() OVER (ORDER BY sortCols)` exactly when the sort key
  * is a total order (enforce uniqueness upstream or pass tiebreakers;
  * with duplicate keys the ids are still dense and sort-consistent,
  * but the order WITHIN a duplicate group is partition-layout-defined).
  */
object DenseId {

  /** Append `idCol` = 1-based dense id in `sortCols` order. */
  def withDenseId(df: DataFrame, sortCols: Seq[Column], idCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    val zipped = sorted.rdd
      .zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(zipped, outSchema)
  }
}
