package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of SUM/COUNT/MIN/MAX rollup partials — the
  * data side of the MV story whose READ side is
  * [[graft.plans.MvRewrite]]: a pre-aggregate over inserts is
  * self-maintainable (Gupta & Mumick 1995), because every stored
  * partial is a commutative monoid — so folding the DELTA batch's
  * partials into the stored table reproduces the full rebuild exactly
  * (mv(F ∪ B) ≡ fold(mv(F), mv(B)); spec- and oracle-asserted).
  * Deletes/updates need per-group counts and retraction logic and are
  * deliberately out of scope — the warehouse contract here is
  * append-only batches (the reference's monthly-file cadence).
  *
  * 100 TB shape: the fold never touches base fact rows — one keyed
  * aggregation at MV grain over (stored ∪ batch-partial), both MV-sized.
  */
object MvMaintain {

  /** Fold `delta` (same schema: `keys` + the partial columns) into
    * `stored`. `sums` and `counts` re-aggregate by SUM, `mins` by MIN,
    * `maxs` by MAX. Groups new to the batch appear; untouched groups
    * pass through (a union-aggregate, not a join — no null-handling
    * edge cases).
    */
  def fold(
      stored: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[String] = Nil, counts: Seq[String] = Nil,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    require(sums.nonEmpty || counts.nonEmpty || mins.nonEmpty || maxs.nonEmpty,
      "nothing to fold")
    val aggs =
      (sums ++ counts).map(c => sum(col(c)).as(c)) ++
        mins.map(c => min(col(c)).as(c)) ++
        maxs.map(c => max(col(c)).as(c))
    stored.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental maintenance of a JOIN view V = A ⋈ B under
    * insert-only deltas (the other self-maintainable case of Gupta &
    * Mumick 1995): ΔV = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB — the three delta
    * terms (ΔA⋈B, ΔA⋈ΔB, A⋈ΔB) with the first two folded into one
    * join. Returns V_old ∪ ΔV ≡ (A ∪ ΔA) ⋈ (B ∪ ΔB) exactly
    * (spec- and oracle-asserted).
    *
    * 100 TB shape: the stored view is NEVER re-joined — both delta
    * joins are driven by batch-sized probes against the base tables,
    * so a monthly load costs O(Δ ⋈ base), not O(base ⋈ base).
    */
  def joinDelta(
      stored: DataFrame, aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      aKey: String, bKey: String): DataFrame =
    stored
      .unionByName(aDelta.join(bOld.unionByName(bDelta), col(aKey) === col(bKey)))
      .unionByName(aOld.join(bDelta, col(aKey) === col(bKey)))
}
