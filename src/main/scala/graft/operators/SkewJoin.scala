package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins — the explicit fallback
  * when AQE's runtime skew splitting isn't available (e.g. the skew
  * hides behind a non-shuffle boundary) or when a hot key is known in
  * advance.
  *
  * Left (big, skewed) rows get a salt in [0, salt); right (smaller)
  * rows are replicated `salt` times. The join key becomes (key, salt),
  * spreading one hot key over `salt` reducers. The salt value never
  * affects join semantics for left-preserving joins (the right side
  * carries every salt), so inner/left/left_semi/left_anti results are
  * identical to the unsalted join under any retry/replan. Right- and
  * full-outer joins are rejected: an unmatched right row would be
  * emitted once per salt replica.
  */
object SkewJoin {

  private val supportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")) ||
      supportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports left-preserving join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched small-side rows per salt replica)")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedBig
      .join(saltedSmall, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
