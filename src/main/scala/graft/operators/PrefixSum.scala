package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Scalable running totals — a distributed exclusive prefix sum over a
  * total order, with no single-partition window.
  *
  * `SUM(v) OVER (ORDER BY k)` is the natural formulation and Spark
  * executes it on ONE partition (same bottleneck [[DenseId]] exists
  * for): at training-corpus scale the cumsum that drives sequence
  * packing cannot funnel every row through one task. Same remedy as
  * DenseId, generalized from counts to sums:
  *
  *  1. range-repartition + sort within partitions on the key — one
  *     shuffle; every partition holds a contiguous key range;
  *  2. per-partition TOTALS to the driver (numPartitions longs, not
  *     rows), exclusive-scanned into per-partition starting offsets;
  *  3. map-side second pass emits offset + running local sum per row.
  *
  * Two jobs over the data, O(partitions) driver state. The result is
  * a pure function of (key order, values): partition boundaries come
  * from range sampling, but each row's prefix depends only on the
  * rows before it in key order, wherever the boundaries land —
  * PrefixSumSpec asserts partition-layout invariance.
  *
  * `keyCols` must be a total order (unique, non-null) and `valCol`
  * non-null; with duplicate keys the intra-group order would be
  * partition-layout-defined, breaking determinism (same contract as
  * [[StratifiedSample]]'s key).
  */
object PrefixSum {

  /** Append `outCol` = exclusive prefix sum of `valCol` (cast to long)
    * in `keyCols` order: the sum of all STRICTLY-PRECEDING rows'
    * values (0 for the first row).
    */
  def withExclusivePrefix(
      df: DataFrame, keyCols: Seq[Column], valCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val valIdx = sorted.schema.fieldIndex(valCol)
    require(sorted.schema(valIdx).dataType == LongType,
      s"$valCol must be LongType (cast upstream), got ${sorted.schema(valIdx).dataType}")
    val outSchema = sorted.schema.add(StructField(outCol, LongType, nullable = false))

    // The sorted frame feeds two jobs (partition totals, then the
    // emit pass); localCheckpoint materializes the sort once instead
    // of executing it twice (blocks are ContextCleaner-released, no
    // CacheManager pin — the round-2 persist-leak lesson).
    val rdd = sorted.localCheckpoint().rdd
    val partTotals: Array[Long] = rdd
      .mapPartitions(it => Iterator.single(it.foldLeft(0L)(_ + _.getLong(valIdx))))
      .collect()
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(valIdx)
        row
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
