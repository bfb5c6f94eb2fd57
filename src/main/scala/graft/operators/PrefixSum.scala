package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, lit, sum}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  *  2. per-partition summaries `(first key, partition total)` — keyed
  *     by the partition's first KEY VALUE, never its index — are
  *     exclusive-scanned into starting offsets by a window over the
  *     O(partitions)-row summary frame (Spark's own SQL ordering, so
  *     the scan order is definitionally the shuffle's range order);
  *  3. a second map-side pass looks its partition's offset up by
  *     EXACT MATCH on its first row's key and emits offset + running
  *     local sum per row.
  *
  * Two jobs over the data, O(partitions) driver state. No partition
  * index is load-bearing anywhere: renumbering, AQE coalescing, or a
  * re-materialized layout either produces the identical value-keyed
  * answer or misses the offset lookup and THROWS — it cannot emit a
  * silently wrong prefix. (Round-3 hardening: the previous
  * formulation indexed offsets by `mapPartitionsWithIndex` pid across
  * two jobs, which the driver gate flagged once, unreproduced;
  * PrefixSumStressSpec now hammers randomized layouts.)
  *
  * `keyCols` must be a total order (unique, non-null) and `valCol`
  * non-null; duplicates would make the intra-group order partition-
  * layout-defined, so job 1 detects adjacent duplicate keys and
  * throws (range partitioning co-locates equal keys, so the adjacency
  * check is complete).
  */
object PrefixSum {

  /** Append `outCol` = exclusive prefix sum of `valCol` (cast to long)
    * in `keyCols` order: the sum of all STRICTLY-PRECEDING rows'
    * values (0 for the first row).
    */
  def withExclusivePrefix(
      df: DataFrame, keyCols: Seq[Column], valCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    // Materialize key expressions as appended temp columns so job 1/2
    // can read key VALUES positionally (keyCols may be expressions,
    // e.g. abc_classification's negated-cents sort key).
    val kNames = keyCols.indices.map(i => s"__psk_$i")
    val keyed = df.select(
      df.columns.map(col) ++ keyCols.zip(kNames).map { case (c, n) => c.as(n) }: _*)
    val sorted = keyed
      .repartitionByRange(kNames.map(col): _*)
      .sortWithinPartitions(kNames.map(col): _*)
    val valIdx = sorted.schema.fieldIndex(valCol)
    require(sorted.schema(valIdx).dataType == LongType,
      s"$valCol must be LongType (cast upstream), got ${sorted.schema(valIdx).dataType}")
    val kIdxs = kNames.map(sorted.schema.fieldIndex)
    val keySchema = StructType(kIdxs.map(sorted.schema.apply))
    val nOut = df.columns.length

    // The sorted frame feeds two jobs (partition summaries, then the
    // emit pass); localCheckpoint materializes the sort once instead
    // of executing it twice (blocks are ContextCleaner-released, no
    // CacheManager pin — the round-2 persist-leak lesson).
    val rdd = sorted.localCheckpoint().rdd

    // Job 1: (first key, total) per non-empty partition. The adjacent-
    // duplicate check enforces the unique-key contract loudly.
    val summaries: Array[Row] = rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val firstKey = kIdxs.map(first.get)
        var prev = first
        var total = first.getLong(valIdx)
        while (it.hasNext) {
          val r = it.next()
          var i = 0
          var same = true
          while (same && i < kIdxs.length) {
            same = r.get(kIdxs(i)) == prev.get(kIdxs(i)); i += 1
          }
          if (same) throw new IllegalStateException(
            s"PrefixSum requires a unique key; duplicate: ${kIdxs.map(r.get)}")
          prev = r
          total += r.getLong(valIdx)
        }
        Iterator.single(Row.fromSeq(firstKey :+ total))
      }
    }.collect()

    // Exclusive scan over the O(partitions)-row summary frame, ordered
    // by the key through Spark's OWN ordering (same semantics the
    // range shuffle used — no hand-rolled driver-side comparator).
    val summarySchema = keySchema.add(StructField("__ps_total", LongType, nullable = false))
    val offsetRows = spark
      .createDataFrame(spark.sparkContext.parallelize(summaries.toSeq, 1), summarySchema)
      .withColumn("__ps_offset",
        coalesce(
          sum(col("__ps_total")).over(
            Window.orderBy(kNames.map(col): _*)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .collect()
    val offsetByFirstKey: Map[Seq[Any], Long] =
      offsetRows.map(r => (kIdxs.indices.map(r.get): Seq[Any]) -> r.getLong(r.length - 1)).toMap
    val bc = spark.sparkContext.broadcast(offsetByFirstKey)

    // Job 2: look up this partition's offset by its first row's key
    // value (exact match — a miss means the materialized layout moved
    // under us, which must fail, not misnumber).
    val outSchema = StructType(sorted.schema.take(nOut)).add(
      StructField(outCol, LongType, nullable = false))
    val out = rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val buffered = it.buffered
        val firstKey: Seq[Any] = kIdxs.map(buffered.head.get)
        var acc = bc.value.getOrElse(firstKey, throw new IllegalStateException(
          s"PrefixSum offset lookup missed key $firstKey: partition layout changed between jobs"))
        buffered.map { r =>
          val row = Row.fromSeq(r.toSeq.take(nOut) :+ acc)
          acc += r.getLong(valIdx)
          row
        }
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
