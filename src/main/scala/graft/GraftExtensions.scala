package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{CleanText, HtmlExtract, LongArrayMatchCount, LongVecDistSq, MaxSimScore, MinHashSig, NgramHashes, QuantizeVec, SimHash64, SimHashText, UrlCanon, VecDot, WinnowFingerprint}

/** SparkSessionExtensions registering graft's custom expressions as SQL
  * functions, so `spark.sql("SELECT simhash_text(text) ...")` works —
  * enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
object GraftExtensions {
  /** Register on an already-built session (temp functions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("simhash64",
      args => SimHash64(args.head), "built-in")
    r.createOrReplaceTempFunction("simhash_text",
      args => SimHashText(args.head), "built-in")
    r.createOrReplaceTempFunction("ngram_hashes",
      args => NgramHashes(args.head, GraftExtensions.litInt(args(1))), "built-in")
    r.createOrReplaceTempFunction("winnow_fingerprint",
      args => WinnowFingerprint(args.head, litInt(args(1)), litInt(args(2))), "built-in")
    r.createOrReplaceTempFunction("vec_dot",
      args => VecDot(args.head, args(1)), "built-in")
    r.createOrReplaceTempFunction("minhash_sig",
      args => MinHashSig(args.head, litInt(args(1))), "built-in")
    r.createOrReplaceTempFunction("long_array_match_count",
      args => LongArrayMatchCount(args.head, args(1)), "built-in")
    r.createOrReplaceTempFunction("clean_text",
      args => CleanText(args.head), "built-in")
    r.createOrReplaceTempFunction("maxsim_score",
      args => MaxSimScore(args.head, args(1), litInt(args(2))), "built-in")
    r.createOrReplaceTempFunction("quantize_vec",
      args => QuantizeVec(args.head, litInt(args(1))), "built-in")
    r.createOrReplaceTempFunction("longvec_dist_sq",
      args => LongVecDistSq(args.head, args(1)), "built-in")
  }

  private[graft] def litInt(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // year(d)-predicate sargability — see SargableTimeRewrite scaladoc
    ext.injectOptimizerRule(_ => graft.plans.SargableTimeRewrite)
    // levenshtein(a,b)<=k gains a short-circuiting length prefilter
    ext.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
    // aggregate navigator: fact rollups retarget onto registered
    // materialized pre-aggregates (see MvRewrite scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_text"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "simhash_text"),
      (args: Seq[Expression]) => SimHashText(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "ngram_hashes"),
      (args: Seq[Expression]) => NgramHashes(args.head, lit(args(1)))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprint"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "winnow_fingerprint"),
      (args: Seq[Expression]) => WinnowFingerprint(args.head, lit(args(1)), lit(args(2)))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "vec_dot"),
      (args: Seq[Expression]) => VecDot(args.head, args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head, lit(args(1)))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("long_array_match_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "long_array_match_count"),
      (args: Seq[Expression]) => LongArrayMatchCount(args.head, args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("clean_text"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "clean_text"),
      (args: Seq[Expression]) => CleanText(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("maxsim_score"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "maxsim_score"),
      (args: Seq[Expression]) => MaxSimScore(args.head, args(1), lit(args(2)))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("quantize_vec"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "quantize_vec"),
      (args: Seq[Expression]) => QuantizeVec(args.head, lit(args(1)))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("longvec_dist_sq"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "longvec_dist_sq"),
      (args: Seq[Expression]) => LongVecDistSq(args.head, args(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("html_extract"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "html_extract"),
      (args: Seq[Expression]) => HtmlExtract(args.head)))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("url_canon"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "url_canon"),
      (args: Seq[Expression]) => UrlCanon(args.head)))
  }
}
