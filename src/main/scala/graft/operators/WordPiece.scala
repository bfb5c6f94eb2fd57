package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece-style vocabulary induction (Schuster & Nakajima, ICASSP
  * 2012; the BERT tokenizer's training rule): identical round
  * structure to [[Bpe.train]], but each round merges the adjacent
  * pair maximizing the LIKELIHOOD score
  * count(l,r) / (count(l)·count(r)) instead of the raw pair count —
  * preferring pairs whose parts rarely occur apart. Symbol counts are
  * corpus-wide occurrence totals under the CURRENT encoding (frequency-
  * weighted), recomputed each round from the same vocab frame.
  *
  * 100 TB shape: as with BPE, the corpus is scanned once into the
  * word-frequency vocabulary (distinct words, distributed); each round
  * is two skinny aggregations over the vocab frame (symbol counts +
  * pair counts), one broadcast-sized join of pairs to their part
  * counts, and a 1-row argmax collect; the winning merge applies as a
  * map-only literal replace.
  *
  * Determinism: the score is evaluated as the fixed IEEE chain
  * double(pair_count) / (double(left_count) · double(right_count)) —
  * ×,÷ on exact integers in identical textual order on both engines —
  * and ties break on (left_sym, right_sym), a total order. No SUM over
  * doubles anywhere; the counts themselves are exact BIGINTs.
  */
object WordPiece {

  /** Learn `numMerges` merges from whitespace-tokenized `textCol`.
    * Returns (step INT, left_sym, right_sym, pair_count LONG,
    * left_count LONG, right_count LONG), ordered by step.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn(
        "enc",
        concat(
          lit(" "),
          array_join(
            transform(
              sequence(lit(1), length(col("word"))),
              i => col("word").substr(i, lit(1))),
            "  "),
          lit(" ")))
      .localCheckpoint()

    val merges = Seq.newBuilder[Row]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val syms = vocab
        .select(col("freq"), split(trim(col("enc")), "  ").as("syms"))
      val symCounts = syms
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy(col("sym"))
        .agg(sum(col("freq")).as("sym_count"))
      val pairCounts = syms
        .filter(size(col("syms")) >= 2)
        .select(
          col("freq"),
          explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "j -> struct(syms[j-1] AS left_sym, syms[j] AS right_sym))")).as("p"))
        .groupBy(col("p.left_sym").as("left_sym"), col("p.right_sym").as("right_sym"))
        .agg(sum(col("freq")).as("pair_count"))
      val top = pairCounts
        .join(symCounts.withColumnRenamed("sym", "left_sym")
          .withColumnRenamed("sym_count", "left_count"), Seq("left_sym"))
        .join(symCounts.withColumnRenamed("sym", "right_sym")
          .withColumnRenamed("sym_count", "right_count"), Seq("right_sym"))
        .withColumn(
          "score",
          col("pair_count").cast("double") /
            (col("left_count").cast("double") * col("right_count").cast("double")))
        .orderBy(col("score").desc, col("left_sym").asc, col("right_sym").asc)
        .limit(1)
        .collect() // exactly one row per round — the argmax merge
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getAs[String]("left_sym")
        val r = top(0).getAs[String]("right_sym")
        merges += Row(step, l, r,
          top(0).getAs[Long]("pair_count"),
          top(0).getAs[Long]("left_count"),
          top(0).getAs[Long]("right_count"))
        vocab = vocab.withColumn(
          "enc",
          replace(col("enc"), lit(s" $l  $r "), lit(s" $l$r ")))
        step += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false),
        StructField("left_count", LongType, nullable = false),
        StructField("right_count", LongType, nullable = false))))
  }
}
