package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable running totals — a distributed exclusive prefix sum over a
  * total order, with no global single-partition window over the data.
  *
  * `SUM(v) OVER (ORDER BY k)` is the natural formulation and Spark
  * executes it on ONE partition (same bottleneck [[DenseId]] exists
  * for): at training-corpus scale the cumsum that drives sequence
  * packing cannot funnel every row through one task.
  *
  * This implementation is PURE deterministic Catalyst ops — no RDD, no
  * localCheckpoint, no driver-collected offsets. (Rounds 3 and 4 each
  * produced one unreproducible driver-gate hash mismatch from the
  * previous two-job `localCheckpoint().rdd` formulation; every step
  * here is a value-function of the data, so physical layout cannot
  * enter the answer.) The trick: ANY bucketing that is monotone in the
  * key order decomposes the global prefix into
  *
  *   prefix(r) = (sum of all rows in earlier buckets)
  *             + (sum of earlier rows in r's bucket)
  *
  * and the RESULT is independent of which monotone bucketing is used —
  * only the plan shape changes. So:
  *
  *  1. pick `numBuckets-1` pivot keys as the rows with the smallest
  *     `(xxhash64(key), key)` — a deterministic spread sample of the
  *     key space (TakeOrderedAndProject; the same value-ordered
  *     selection trick IvfIndex uses for training samples), packed
  *     into one sorted array row and broadcast;
  *  2. each row's bucket = #pivots ≤ its key (monotone by
  *     construction; expected-uniform occupancy because the pivots
  *     are a uniform sample of the keys, exactly like sample-based
  *     range partitioning — but frozen from values, not from a
  *     physical sample of partitions);
  *  3. per-bucket totals via a map-side-combining `groupBy` —
  *     O(numBuckets) rows — exclusive-scanned by a window over that
  *     tiny frame into base offsets, broadcast-joined back;
  *  4. the intra-bucket running sum is a `PARTITION BY bucket ORDER BY
  *     key` window — each partition holds ~N/numBuckets rows, never
  *     the whole frame.
  *
  * Everything is exact long arithmetic; sums are order-independent, so
  * the answer is bit-identical to the single-window cumsum the oracle
  * states (PrefixSumSpec asserts the ≡, PrefixSumStressSpec hammers
  * randomized layouts/shuffle-partition counts).
  *
  * `keyCols` must be a total order (unique, non-null) and `valCol`
  * non-null: duplicate keys would make the running order tie-defined,
  * so the intra-bucket window lag-checks adjacency (equal keys land in
  * the same bucket — bucket is a function of the key value — and sort
  * adjacent there, so the check is complete) and THROWS via
  * `raise_error` rather than emit a layout-defined prefix.
  */
object PrefixSum {

  /** Append `outCol` = exclusive prefix sum of `valCol` (must be
    * LongType — cast upstream) in `keyCols` order: the sum of all
    * STRICTLY-PRECEDING rows' values (0 for the first row).
    *
    * `numBuckets` tunes plan shape only — the answer is provably
    * independent of it. Default 0 = auto: max(256, 8× default
    * parallelism), so intra-bucket window partitions stay ~N/buckets
    * on any cluster size.
    */
  def withExclusivePrefix(
      df: DataFrame, keyCols: Seq[Column], valCol: String, outCol: String,
      numBuckets: Int = 0): DataFrame = {
    require(df.schema(valCol).dataType == LongType,
      s"$valCol must be LongType (cast upstream), got ${df.schema(valCol).dataType}")
    val buckets =
      if (numBuckets > 0) numBuckets
      else math.max(256, df.sparkSession.sparkContext.defaultParallelism * 8)

    // Materialize key expressions as appended temp columns (keyCols
    // may be expressions, e.g. abc_classification's negated-cents
    // sort key) so the pivot array, bucket id, and windows all read
    // the same once-computed values. The frame is referenced three
    // times (pivot sample, bucket totals, final join) but all three
    // live in ONE action, so ReuseExchange dedups any shuffle in the
    // upstream; a localCheckpoint here measured equal-or-slower at
    // sf0.1 (iso A/B, r5) — don't add one.
    val kNames = keyCols.indices.map(i => s"__psk_$i")
    val keyed = df.select(
      df.columns.map(col) ++ keyCols.zip(kNames).map { case (c, n) => c.as(n) }: _*)
    val kStruct = struct(kNames.map(col): _*)

    // 1. Deterministic spread sample of pivot keys: smallest
    // (xxhash64(key), key) rows — pure value order, unique because
    // keys are — sorted into one broadcastable array row. An empty
    // input yields one row with an empty array (global agg), which
    // degrades every step below to a no-op.
    val pivots = keyed
      .select(kStruct.as("__ps_k"))
      .orderBy(xxhash64(col("__ps_k")), col("__ps_k"))
      .limit(buckets - 1)
      .agg(sort_array(collect_list(col("__ps_k"))).as("__ps_pivots"))

    // 2. bucket = #pivots <= key — binary search over the sorted pivot
    // array (SearchSortedCount, O(log B)/row; a filter-HOF lambda is
    // O(B) interpreted tree walks). Struct comparison is lexicographic
    // on the key columns — the same order the windows sort by.
    val withSeg = keyed
      .crossJoin(broadcast(pivots))
      .withColumn("__ps_seg",
        graft.functions.exprs.searchSortedCount(col("__ps_pivots"), kStruct))
      .drop("__ps_pivots")

    // 3. Exclusive scan of per-bucket totals: the only unpartitioned
    // window runs over the O(numBuckets)-row summary frame.
    val bases = withSeg
      .groupBy(col("__ps_seg"))
      .agg(sum(col(valCol)).as("__ps_total"))
      .withColumn("__ps_base",
        coalesce(
          sum(col("__ps_total")).over(
            Window.orderBy(col("__ps_seg"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__ps_seg"), col("__ps_base"))

    // 4. Intra-bucket exclusive running sum + duplicate-key guard in
    // one WindowExec (shared partitioning/ordering).
    val w = Window.partitionBy(col("__ps_seg")).orderBy(kNames.map(col): _*)
    val intra = coalesce(
      sum(col(valCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val guarded = when(
      lag(kStruct, 1).over(w) === kStruct,
      raise_error(concat(
        lit("PrefixSum requires a unique key; duplicate: "), kStruct.cast("string"))))
      .otherwise(col("__ps_base") + intra)

    withSeg
      .join(broadcast(bases), Seq("__ps_seg"))
      .withColumn(outCol, guarded)
      .select(df.columns.map(col) :+ col(outCol): _*)
  }
}
