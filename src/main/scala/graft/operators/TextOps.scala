package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID. All pure
  * `Column` expressions built from codegen'd builtins — no UDFs — so they
  * pipeline inside whole-stage codegen over any corpus size.
  */
object TextOps {

  /** Whitespace tokenization of lowercased text; empty input → empty array.
    * Whitespace is spelled as the explicit class `[\t\n\f\r ]` (RE2's
    * `\s`), never Java's `\s` — Java additionally matches vertical tab
    * and would silently diverge from the DuckDB oracle dialect on a
    * document containing one (see [[graft.functions.NgramHashes.isWs]]).
    */
  def tokens(text: Column): Column =
    filter(split(lower(coalesce(text, lit(""))), "[\\t\\n\\f\\r ]+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word pieces + digits + punctuation as
    * separate tokens (a cheap, deterministic proxy for a real BPE
    * vocab — the regex mirrors the GPT-2 pre-tokenizer's shape).
    */
  def bpeIshTokenCount(text: Column): Column =
    coalesce(
      regexp_count(coalesce(text, lit("")), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\t\\n\\f\\r ]")),
      lit(0))

  /** Characters per token — a classic gibberish signal. */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0, length(regexp_replace(coalesce(text, lit("")), "[\\t\\n\\f\\r ]+", "")).cast("double") / n)
      .otherwise(lit(0.0))
  }

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column = {
    val t = coalesce(text, lit(""))
    when(length(t) > 0,
      regexp_count(t, lit("[^A-Za-z0-9\\t\\n\\f\\r ]")).cast("double") / length(t))
      .otherwise(lit(0.0))
  }

  /** Ratio of tokens that are in `stopwords` (multiset semantics). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Composite quality score in [0,1]: rewards stopword presence and
    * sane token lengths, penalizes punctuation soup. Deterministic,
    * engine-side, tunable weights.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = englishStopwords): Column =
    // one-pass kernel (graft.functions.QualityScoreExpr): the Column
    // formulation's interpreted HOF sub-trees re-evaluate wherever the
    // optimizer re-states them; the kernel is a single tree node with
    // the identical formula (HALF_UP round to 6, same guards).
    graft.functions.exprs.qualityScore(coalesce(text, lit("")), stopwords)

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Order matters: ties resolve to the earlier
    * entry, deterministically.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "une", "du"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "他", "这", "不"))

  /** Stopword-vote language ID: score = hit count per profile, argmax
    * with deterministic tie-break (profile order). "und" (undetermined)
    * when no profile hits.
    */
  def langId(text: Column): Column =
    // one-pass kernel (graft.functions.LangIdExpr); see qualityScore.
    graft.functions.exprs.langId(coalesce(text, lit("")), langProfiles)

  /** PII redaction — the scrubbing pass every shipped training corpus
    * runs: emails, IPv4 addresses, and phone-shaped digit runs become
    * typed placeholders. Plain `regexp_replace` chain (replace-all,
    * map-only, whole-stage codegen; at 100 TB this is scan-speed).
    *
    * Pattern order is load-bearing: emails first (their local parts
    * contain digits a later pass could chew on), then IPs, then
    * phones — by which point every dotted quad is already `<IP>` so
    * the phone pattern cannot eat one. Patterns are restricted to
    * syntax with identical semantics in Java regex and RE2 (character
    * classes, bounded repeats, `\b`) so results are bit-reproducible
    * against DuckDB — the `text_redact_pii` oracle holds byte-exact.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(coalesce(text, lit("")),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d\\- ]{7,}\\d", "<PHONE>")
  }

  /** Corpus vocabulary: per token, document frequency + total
    * occurrence count, `minDf`-filtered, top-`topK` by
    * (doc_freq desc, n_occurrences desc, token asc) — a total order,
    * so the cut is deterministic.
    *
    * Two sequential shuffles — (token, doc) partial counts, then
    * per-token stats — NEVER a mixed distinct+plain aggregate
    * (`countDistinct(doc) + count(*)` in one agg plans an Expand that
    * doubles the exploded token stream; measured on the Profiler).
    * The top-k is `TakeOrderedAndProject`: per-partition heads, k-row
    * driver merge — no global sort of the vocabulary.
    */
  def vocabulary(
      df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 2, topK: Int = 1000,
      tokenPattern: Option[String] = None): DataFrame = {
    val tokAll = df.select(
      col(idCol).as("_doc"), explode(tokens(col(textCol))).as("token"))
    // optional token whitelist BEFORE any aggregation — e.g.
    // "^[a-z0-9]+$" keeps the deterministic top-k tie-break
    // collation-safe when results cross engines
    val tok = tokenPattern.fold(tokAll)(p => tokAll.filter(col("token").rlike(p)))
    val perDoc = tok.groupBy(col("token"), col("_doc"))
      .agg(count(lit(1)).as("_n"))
    perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("_n")).as("n_occurrences"))
      .filter(col("doc_freq") >= minDf)
      .orderBy(desc("doc_freq"), desc("n_occurrences"), col("token"))
      .limit(topK)
  }

  /** Per-doc vocabulary coverage against a fixed token vocabulary —
    * the tokenizer-fit diagnostic of a training pipeline (how much of
    * each document a bounded vocab can encode; the complement is the
    * OOV rate).
    *
    * `vocab` must expose a `token` column and is bounded by
    * construction (a [[vocabulary]] top-k cut), so it rides a
    * BROADCAST join — the corpus token stream never shuffles on the
    * token; the only exchange is the per-doc final aggregate keyed by
    * doc id. Docs with zero tokens survive via `explode_outer` with
    * coverage 0.
    */
  def vocabCoverage(
      df: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame =
    df.select(col(idCol), explode_outer(tokens(col(textCol))).as("token"))
      .join(
        broadcast(vocab.select(col("token")).withColumn("in_vocab", lit(1))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("token")).as("n_tokens"),
        count(col("in_vocab")).as("n_in_vocab"))
      .withColumn(
        "vocab_coverage",
        when(col("n_tokens") > 0,
          col("n_in_vocab").cast("double") / col("n_tokens")).otherwise(0.0))

  /** TF-IDF per (doc, token) with a RATIONAL idf:
    *
    *   tfidf = (tf / doc_len) * (n_docs / doc_freq)
    *
    * — term frequency damped by a linear inverse document frequency.
    * The deliberate departure from `ln`-based idf keeps every
    * arithmetic step a correctly-rounded IEEE-754 op (integer-valued
    * inputs, two divisions, one multiply), so scores are
    * bit-reproducible across engines and platforms — `ln()` is NOT
    * correctly rounded in common libms, which would poison exact
    * oracle comparison and cross-run reproducibility hashes alike.
    *
    * Shuffles: (doc, token) tf counts, doc lengths, token doc-freqs —
    * all standard partial+final hash aggs; n_docs joins as a
    * broadcast 1-row relation (J9 shape), never a driver collect.
    */
  /** Okapi BM25 score per (doc, token) (Robertson & Walker, SIGIR 1994;
    * the k1/b formulation of Robertson et al., TREC-3) — the lexical
    * ranking function hybrid retrieval stacks run next to dense ANN:
    *
    *   bm25 = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with the RATIONAL idf n_docs/doc_freq (same deliberate departure
    * from `ln` as [[tfidf]]: every step stays a correctly-rounded
    * IEEE-754 +,−,×,÷ on integer-valued inputs, evaluated in the fixed
    * textual order `idf · ((tf·(k1+1)) / (tf + k1·(1−b + (b·dl)/avgdl)))`
    * with avgdl = total_len/n_docs — so scores replay bit-exactly in
    * any engine that spells the same expression; `ln` is not correctly
    * rounded in common libms and would poison the oracle).
    *
    * Same shuffle shape as [[tfidf]]: (doc, token) tf counts, doc
    * lengths derived from tf (never a second tokenize pass), token
    * doc-freqs; n_docs and total_len join as broadcast 1-row relations
    * (J9 shape). A downstream filter on `token` prunes the tf and
    * doc_freq aggregates through their group keys, so probing a fixed
    * term set never pays the full-vocabulary aggregation.
    */
  def bm25(
      df: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75, minDf: Int = 1): DataFrame = {
    val tok = df.select(
      col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("doc_len"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
    val n = df.agg(count(lit(1)).as("n_docs"))
    val totalLen = dl.agg(sum(col("doc_len")).as("total_len"))
    val tfd = col("tf").cast("double")
    val avgdl = col("total_len").cast("double") / col("n_docs")
    val idf = col("n_docs").cast("double") / col("doc_freq")
    tf.join(dl, "doc_id")
      .join(dfreq, "token")
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(totalLen))
      .withColumn("bm25",
        idf * ((tfd * (lit(k1) + lit(1.0))) /
          (tfd + lit(k1) * (lit(1.0) - lit(b) +
            (lit(b) * col("doc_len").cast("double")) / avgdl))))
      .select(col("doc_id"), col("token"), col("tf"), col("bm25"))
  }

  def tfidf(
      df: DataFrame, idCol: String, textCol: String, minDf: Int = 1): DataFrame = {
    val tok = df.select(
      col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // doc_len = sum(tf): derived from the aggregate, not a second
    // tokenize+explode+shuffle of the full token stream
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("doc_len"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dl, "doc_id")
      .join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        (col("tf").cast("double") / col("doc_len")) *
          (col("n_docs").cast("double") / col("doc_freq")))
      .select(col("doc_id"), col("token"), col("tf"), col("tfidf"))
  }
}
