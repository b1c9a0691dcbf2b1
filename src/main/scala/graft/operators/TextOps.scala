package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (codegen'd, no UDFs) — each scales as a single
  * narrow map over the documents table, no shuffle at all until an
  * aggregation is asked for.
  */
object TextOps {

  /** English function words for the stopword heuristics. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  private def toks(text: Column): Column = Parity.tokens(text)

  private def stopCount(text: Column): Column =
    size(filter(toks(text), t => t.isin(Stopwords: _*))).cast("long")

  /** n-gram/stopword-heuristic language identification.
    *
    * Rule (deterministic, mirrored in the oracle): ≥2 English stopwords →
    * 'en'; else vowel-final token ratio > 0.5 → 'es'; else 'other'. A toy
    * profile, but the plumbing — per-token predicate counts folded into a
    * classification — is the real n-gram-LID shape.
    */
  def langId(docs: DataFrame): DataFrame = {
    val text = col("text")
    val n = greatest(size(toks(text)).cast("long"), lit(1L))
    val vowelRatio =
      size(filter(toks(text), t => t.rlike("[aeiou]$"))).cast("double") / n.cast("double")
    docs.select(
      col("doc_id"),
      when(stopCount(text) >= 2, "en")
        .when(vowelRatio > 0.5, "es")
        .otherwise("other")
        .as("pred_lang"),
      round(vowelRatio + RoundEps, 6).as("vowel_ratio"),
      stopCount(text).as("n_stop"))
  }

  /** Boundary-stabilized rounding nudge for per-row RATIONAL ratios:
    * small-integer quotients land EXACTLY on round-half boundaries
    * (e.g. 0.6615625), and there Spark (rounds the shortest decimal
    * string, half-up) and DuckDB (rounds the scaled binary) disagree by
    * one ulp of the last kept digit. A 1e-9 nudge — mirrored in the
    * oracle SQL — puts both engines on the same side; it is two orders
    * of magnitude below the 5e-7 gap between representable outputs, so
    * no non-boundary value changes.
    */
  private val RoundEps = 1e-9

  /** Quality scoring: token count, mean token length, stopword ratio,
    * alphanumeric character ratio, folded into a single [0,1]-ish score.
    */
  def quality(docs: DataFrame): DataFrame = {
    val text = col("text")
    val t = toks(text)
    val nTok = size(t).cast("long")
    val nTokSafe = greatest(nTok, lit(1L)).cast("double")
    val meanLen =
      aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long")).cast("double") / nTokSafe
    val stopRatio = stopCount(text).cast("double") / nTokSafe
    val alnumRatio =
      length(regexp_replace(text, "[^a-z0-9]", "")).cast("double") /
        greatest(length(text), lit(1)).cast("double")
    val score =
      least(nTok.cast("double") / 20.0, lit(1.0)) * 0.4 + stopRatio * 0.3 + alnumRatio * 0.3
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      round(meanLen + RoundEps, 6).as("mean_tok_len"),
      round(stopRatio + RoundEps, 6).as("stop_ratio"),
      round(alnumRatio + RoundEps, 6).as("alnum_ratio"),
      round(score + RoundEps, 6).as("quality"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * segmentation (letter runs / digit runs / single other symbols).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"))

  /** TF-IDF over the document corpus: term frequency per (doc, term),
    * document frequency per term, idf = ln(N/df). Two hash aggregations,
    * both map-side-partial; the corpus size N enters as a cross-joined
    * single-row aggregate INSIDE the plan (a broadcast nested loop of one
    * row) — not a driver-side `count()`, which would cost a full extra
    * corpus pass per call at 100 TB. Mirrors the oracle's `CROSS JOIN nn`.
    */
  def tfidf(docs: DataFrame): DataFrame = {
    val nn = docs.agg(count(lit(1)).as("n"))
    val terms = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .crossJoin(nn)
      .select(
        col("doc_id"),
        col("term"),
        col("tf"),
        col("df"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("tfidf"))
  }

  /** Corpus vocabulary: top-k terms by document frequency (ties broken
    * by term), with total term frequency — the vocab-building step of a
    * tokenizer/LM pipeline. One explode + one hash aggregate; the
    * distinct-doc count rides the same shuffle on the term key.
    */
  def vocab(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)

  /** Document-length histogram: token-count deciles (bucket = n_tokens/10,
    * capped at 20) with document counts and mean char length — the
    * length-distribution snapshot a corpus-curation pipeline reports.
    */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs
      .select(
        // `/` on longs is DOUBLE division in Column algebra — cast back
        // after to get the integer decile (floor for non-negatives)
        least((size(toks(col("text"))).cast("long") / 10L).cast("long"), lit(20L)).as("bucket"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 6).as("avg_chars"))

  /** Deterministic content-hash train/val/test split: bucket =
    * fp40 mod 100, train < 80 ≤ val < 90 ≤ test. Hash-based (not
    * random) so the assignment is REPRODUCIBLE across runs, engines and
    * cluster sizes, and duplicate documents land in the same split —
    * the leakage-safety property row-level random sampling lacks. A pure
    * narrow map.
    */
  def splitAssign(docs: DataFrame): DataFrame = {
    val bucket = pmod(Parity.fp40(col("text")), lit(100L))
    docs.select(
      col("doc_id"),
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
  }

  /** Split sizes per language — the stratification report for
    * [[splitAssign]]. */
  def splitStats(docs: DataFrame): DataFrame =
    splitAssign(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Document fingerprinting: two independent rolling polynomial hashes of
    * the full text plus their 40-bit concatenation — the content-addressed
    * identity used by exact dedup at scale.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val f1 = Parity.charFold(col("text"), 31L, Parity.TokP)
    val f2 = Parity.charFold(col("text"), 131L, Parity.TokP2)
    docs.select(
      col("doc_id"),
      f1.as("fp_a"),
      f2.as("fp_b"),
      (f1 * Parity.TokP2 + f2).as("fp40"))
  }
}
