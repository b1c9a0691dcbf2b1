package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Tokenizer training and application: byte-pair-encoding merge
  * induction over the corpus, then encoding the corpus with the learned
  * merge table — the train→encode pair that turns "count tokens" into
  * "own the tokenizer".
  *
  * Scale design: BPE never trains on the corpus — it trains on the WORD
  * HISTOGRAM ([[wordHistogram]]: one hash aggregate, map-side partial,
  * output = distinct tokens, orders of magnitude smaller than the
  * corpus), optionally frequency-floored ([[initialStates]]' `minFreq`,
  * standard BPE practice — at web scale the freq-1 tail of the
  * histogram is mostly noise and dominates its row count). Every merge
  * ROUND is then one small TakeOrdered over the histogram plus a narrow
  * map applying the round's merges; at 100 TB the corpus is read
  * exactly once.
  *
  * Driver-round-trip bound: a naive loop does one argmax round-trip per
  * merge — 30k merges = 30k sequential Spark jobs, driver-latency-bound
  * on any cluster. [[trainMerges]] instead collects the TOP
  * [[BatchCandidates]] pairs per round and applies every merge in the
  * maximal SAFE batch (see [[selectBatch]] for the exact-equivalence
  * argument) in one narrow map, so merges-per-job rises from 1 toward
  * the batch width and the job count is O(merges / batch), not
  * O(merges). The result is PROVABLY identical to the sequential loop —
  * the DuckDB oracle ([[bpeMergesSql]]) remains the sequential
  * unrolling and must hash-match.
  *
  * State encoding: a word's current symbol sequence is its symbols each
  * individually WRAPPED in control delimiters — `␁sym␂` ([[SepL]],
  * [[SepR]]) — and concatenated. A merge of pair (l, r) is then
  * `replace(state, ␁l␂␁r␂, ␁lr␂)`, and string `replace` is
  * leftmost-first non-overlapping in both Spark and ANSI SQL, which is
  * exactly greedy BPE because under this encoding:
  *   - a pattern can only match WHOLE symbols (`␁a␂` never matches
  *     inside `␁aa␂` — the delimiter terminates the symbol), and
  *   - adjacent matches share no characters (each symbol's wrapper is
  *     wholly inside one match), so "aaaa" under (a,a) → [aa, aa] and
  *     "aaa" → [aa, a], the greedy results.
  * A single-separator encoding (`a␁a␁a`) fails BOTH properties: the
  * match consumes the shared boundary separator and can bind a proper
  * prefix/suffix of a multi-char neighbor.
  *
  * That makes the whole iterative train SQL-expressible, so the DuckDB
  * oracle verifies the real loop, unrolled ([[bpeMergesSql]]), not a
  * proxy — and likewise the encoder ([[bpeEncodeSql]]).
  *
  * No reference counterpart (north-star extension per BASELINE.json).
  */
object Tokenization {

  /** Symbol delimiters. U+0001/U+0002 never appear in the corpus (and
    * [[wordHistogram]] drops any word containing them, mirrored in the
    * oracle, so a hostile input degrades coverage, not correctness).
    * U+0003 separates word states inside a document state
    * ([[bpeEncode]]): merge patterns are `…␂␁…`, and at a word boundary
    * the junction is `␂␃␁`, so no merge ever crosses words — the same
    * per-word semantics the training histogram assumes.
    */
  val SepL = "\u0001"
  val SepR = "\u0002"
  val WordSep = "\u0003"

  /** Whitespace-token histogram: (word, freq), one shuffle on the word.
    * The BPE training set.
    */
  def wordHistogram(docs: DataFrame): DataFrame =
    docs
      .select(explode(Parity.tokens(col("text"))).as("w"))
      .filter(!col("w").contains(SepL) && !col("w").contains(SepR) && !col("w").contains(WordSep))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))

  /** Initial BPE state: each distinct word with corpus frequency ≥
    * `minFreq` as its wrapped character sequence (`␁c␂` per char), with
    * its corpus frequency.
    */
  def initialStates(docs: DataFrame, minFreq: Long = 1L): DataFrame =
    wordHistogram(docs)
      .filter(col("freq") >= minFreq)
      .select(
        array_join(
          transform(
            sequence(lit(1), length(col("w"))),
            i => concat(lit(SepL), col("w").substr(i, lit(1)), lit(SepR))),
          "").as("state"),
        col("freq"))

  /** The symbol array of a state: strip the outermost delimiters, split
    * on the `␂␁` junctions.
    */
  private def symbols(state: Column): Column =
    split(state.substr(lit(2), length(state) - 2), SepR + SepL)

  /** Adjacent-symbol pair histogram of a state table: (left, right,
    * pair_count), weighted by word frequency. One explode + one hash
    * aggregate over the (small) histogram.
    */
  def pairCounts(states: DataFrame): DataFrame =
    states
      .select(col("freq"), symbols(col("state")).as("syms"))
      .filter(size(col("syms")) >= 2) // sequence(1, 0) would run DESCENDING
      .select(
        col("freq"),
        col("syms"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
      .select(
        element_at(col("syms"), col("i")).as("left"),
        element_at(col("syms"), col("i") + 1).as("right"),
        col("freq"))
      .groupBy(col("left"), col("right"))
      .agg(sum(col("freq")).as("pair_count"))

  /** One trained merge rule. */
  final case class Merge(round: Long, left: String, right: String, count: Long)

  /** Pairs collected to the driver per training round — the batch
    * selection window. A scalar-sized TakeOrdered (≤ ~100 KB), same
    * driver-control category as a convergence counter.
    */
  val BatchCandidates = 1024

  /** Greedy batch selection over the (pair_count desc, left, right)-
    * sorted candidate list: the maximal prefix of pairwise NON-
    * INTERACTING pairs, trimmed to counts strictly above the first
    * non-selected pair's. Applying the batch in order is then EXACTLY
    * the sequential greedy loop, because for each selected pᵢ:
    *
    *   - pᵢ's own count is invariant under the earlier batch merges:
    *     interaction includes a selected pair's components AND its
    *     merged string l+r, so no earlier merge consumes or creates
    *     pᵢ's symbols;
    *   - every pair sorting before pᵢ is an earlier batch member
    *     (prefix rule), already merged to count 0;
    *   - every NEW pair created by an earlier merge (x, l) → (x, ll+r)
    *     etc. has count ≤ its enabling old pair's, which interacts with
    *     a selected pair, hence was not selected, hence sorts after the
    *     prefix — and the strict-count trim makes that bound STRICT, so
    *     no new pair can tie pᵢ and win on the lexicographic
    *     tie-break (a tie CAN re-order: the new pair's key (x, l+r)
    *     differs from its enabling pair's (x, l)).
    *
    * If the trim would empty the batch (the argmax itself ties the
    * boundary), the argmax alone is kept — merging just the true argmax
    * is trivially sequential. `boundary` when no interacting pair was
    * seen: −1 if the candidate list is COMPLETE (fewer than
    * [[BatchCandidates]] pairs exist — nothing unseen can tie), else
    * the last collected count (conservative: unseen pairs may tie it).
    */
  private[graft] def selectBatch(
      sorted: Seq[(String, String, Long)],
      maxN: Int): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var boundary = if (sorted.length < BatchCandidates) -1L else sorted.last._3
    var i = 0
    var stop = false
    while (!stop && i < sorted.length && picked.length < maxN) {
      val (l, r, n) = sorted(i)
      if (used.contains(l) || used.contains(r)) {
        boundary = n
        stop = true
      } else {
        picked += ((l, r, n))
        used += l
        used += r
        used += (l + r)
        i += 1
      }
    }
    // stopped at maxN with pairs still unexamined: the next pair is the
    // first non-selected one
    if (!stop && picked.length == maxN && i < sorted.length) boundary = sorted(i)._3
    val trimmed = picked.filter(_._3 > boundary)
    if (trimmed.nonEmpty) trimmed.toSeq else picked.take(1).toSeq
  }

  /** Train up to `nMerges` merge rules, batched ([[selectBatch]]);
    * returns the merges (driver-local — the merge table IS the model,
    * scalar-sized like a centroid table) and the number of driver
    * rounds taken (jobs ∝ rounds, pinned < merges by the batching test).
    */
  def trainMerges(
      spark: SparkSession,
      docs: DataFrame,
      nMerges: Int,
      minFreq: Long = 1L): (Seq[Merge], Int) = {
    var states = Phys.materialized(initialStates(docs, minFreq))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val top = pairCounts(states)
        .orderBy(desc("pair_count"), col("left"), col("right"))
        .limit(BatchCandidates)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq
      if (top.isEmpty) {
        // every word is one symbol — mirror the oracle, whose round-k
        // argmax CTE is empty and contributes no row
        exhausted = true
      } else {
        rounds += 1
        val batch = selectBatch(top, nMerges - merges.length)
        states = Phys.materialized(
          states.select(
            batch
              .foldLeft(col("state")) { case (st, (l, r, _)) => mergeReplace(st, l, r) }
              .as("state"),
            col("freq")))
        batch.foreach { case (l, r, n) => merges += Merge(merges.length + 1L, l, r, n) }
      }
    }
    (merges.toSeq, rounds)
  }

  private def mergeReplace(state: Column, l: String, r: String): Column =
    replace(state, lit(SepL + l + SepR + SepL + r + SepR), lit(SepL + l + r + SepR))

  /** The merge table (merge_round, left, right, pair_count) — identical
    * to the one-merge-per-round sequential loop (see [[selectBatch]]),
    * which is exactly what the unrolled oracle replays.
    */
  def bpeTrain(spark: SparkSession, docs: DataFrame, nMerges: Int, minFreq: Long = 1L): DataFrame = {
    import spark.implicits._
    trainMerges(spark, docs, nMerges, minFreq)._1
      .map(m => (m.round, m.left, m.right, m.count))
      .toDF("merge_round", "left", "right", "pair_count")
  }

  /** Token-id space: single-character symbols use their Unicode code
    * point (`ascii()` in both engines); a symbol minted by merge round k
    * gets [[MergedIdBase]] + k — disjoint from any code point
    * (MergedIdBase > 0x10FFFF). If two merge rounds ever mint the same
    * symbol STRING (possible: (a,bc) and (ab,c) both make "abc"), the
    * LOWEST round's id wins — the Spark CASE chain and the oracle's
    * evaluate in the same round order.
    */
  val MergedIdBase = 2000000L

  /** Number of leading token ids surfaced per document. */
  val EncodeHeadK = 8

  /** Apply the trained tokenizer to the corpus: train `nMerges` rules,
    * then encode every document by folding the merge table IN ORDER
    * through the wrapped-state replace — one narrow map over the corpus
    * (the merge table is a driver-local scalar, folded into the
    * expression like a broadcast centroid table; no shuffle, no second
    * corpus read beyond the histogram the training already took).
    * Emits per doc: token count, the first [[EncodeHeadK]] token ids
    * (comma-joined), and the token-id sum (an order-insensitive
    * checksum of the full encoding).
    *
    * This is the highest-traffic path of a production pipeline —
    * train→ENCODE→pack — and at 100 TB it is embarrassingly parallel:
    * the fold is whole-stage-codegen string work per row.
    */
  def bpeEncode(
      spark: SparkSession,
      docs: DataFrame,
      nMerges: Int,
      minFreq: Long = 1L): DataFrame = {
    val (merges, _) = trainMerges(spark, docs, nMerges, minFreq)
    encodeWithMerges(docs, merges)
  }

  /** The APPLY half of the tokenizer, over an already-trained merge
    * table: fold the (scalar-sized, in-round-order) merges into the
    * wrapped-state replace expression — one narrow whole-stage-codegen
    * map over the corpus, no histogram scan, no training jobs anywhere
    * in the plan. [[bpeEncode]] is train+this; [[bpeApplyStored]] is
    * read-model+this.
    */
  def encodeWithMerges(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val words = filter(
      Parity.tokens(col("text")),
      w => !w.contains(SepL) && !w.contains(SepR) && !w.contains(WordSep))
    val wordState = (w: Column) =>
      array_join(
        transform(
          sequence(lit(1), length(w)),
          i => concat(lit(SepL), w.substr(i, lit(1)), lit(SepR))),
        "")
    val state0 = array_join(transform(words, wordState), WordSep)
    val encoded = merges.foldLeft(state0)((st, m) => mergeReplace(st, m.left, m.right))
    // strip word separators, then split into symbols; '' → zero tokens
    val stripped = replace(encoded, lit(WordSep), lit(""))
    val syms = when(length(stripped) === 0, array().cast("array<string>"))
      .otherwise(symbols(stripped))
    val idOf = (s: Column) =>
      merges
        .foldLeft(when(lit(false), lit(0L))) { (acc, m) =>
          acc.when(s === lit(m.left + m.right), lit(MergedIdBase + m.round))
        }
        .otherwise(ascii(s).cast("long"))
    docs.select(
      col("doc_id"),
      size(syms).cast("long").as("n_tokens"),
      array_join(transform(slice(syms, 1, EncodeHeadK), s => idOf(s).cast("string")), ",")
        .as("head_ids"),
      aggregate(syms, lit(0L), (acc, s) => acc + idOf(s)).as("sum_ids"))
  }

  /** Train once, persist the model: the merge table written as a parquet
    * artifact (schema = [[bpeTrain]]'s row). The merge table IS the whole
    * tokenizer — scalar-sized, so the artifact is one tiny file a fleet
    * of encode jobs can read for years without touching the training
    * corpus again.
    */
  def writeBpeModel(
      spark: SparkSession,
      docs: DataFrame,
      nMerges: Int,
      minFreq: Long = 1L): String = {
    val dir = graft.sources.Staging.freshDir("bpe-model")
    bpeTrain(spark, docs, nMerges, minFreq).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  /** The production train-once / apply-many path: READ the stored merge
    * table (never the training corpus) and encode with it. The model is
    * collected once (it is scalar-sized by construction — the same
    * category as a broadcast centroid table) and folded into the encode
    * expression, so the query plan is a single corpus scan + projection:
    * no pair histogram, no argmax rounds, no training stage of any kind.
    */
  def bpeApplyStored(spark: SparkSession, docs: DataFrame, modelDir: String): DataFrame = {
    val merges = spark.read
      .parquet(modelDir)
      .orderBy(col("merge_round"))
      .collect()
      .map(r => Merge(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    encodeWithMerges(docs, merges)
  }

  // ---- DuckDB mirrors ------------------------------------------------

  /** WITH-clause body producing the initial (state, freq) table. */
  def initialStatesSql(minFreq: Long = 1L): String =
    s"""hist AS (
       |  SELECT w, count(*) AS freq
       |  FROM (SELECT unnest(${Parity.tokensSql("text")}) AS w FROM documents)
       |  WHERE NOT contains(w, chr(1)) AND NOT contains(w, chr(2)) AND NOT contains(w, chr(3))
       |  GROUP BY w),
       |s0 AS (
       |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
       |                                        i -> chr(1) || substr(w, CAST(i AS INT), 1) || chr(2)),
       |                         '') AS state,
       |         freq
       |  FROM hist WHERE freq >= $minFreq)""".stripMargin

  /** Pair histogram over a state CTE named `sN`. */
  private def pairCountsSql(s: String): String =
    s"""SELECT syms[CAST(i AS INT)] AS "left", syms[CAST(i + 1 AS INT)] AS "right",
       |       CAST(sum(freq) AS BIGINT) AS pair_count
       |FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i
       |      FROM (SELECT string_split(substr(state, 2, length(state) - 2),
       |                                chr(2) || chr(1)) AS syms,
       |                   freq
       |            FROM $s))
       |GROUP BY 1, 2""".stripMargin

  /** The full iteration-1 pair histogram (exact oracle for
    * [[pairCounts]] over [[initialStates]]).
    */
  val pairCountsOracleSql: String =
    s"""WITH ${initialStatesSql()}
       |${pairCountsSql("s0")}
       |ORDER BY "left", "right"""".stripMargin

  /** The per-round argmax + state-advance CTEs, t1/s1 … t_n/s_n —
    * shared by [[bpeMergesSql]] and [[bpeEncodeSql]]. Sequential, one
    * merge per round: the batched Spark loop must land on exactly this.
    */
  private def trainRoundsSql(nMerges: Int): String =
    (1 to nMerges)
      .map { k =>
        s"""t$k AS (
           |  ${pairCountsSql(s"s${k - 1}").replace("\n", "\n  ")}
           |  ORDER BY pair_count DESC, "left", "right" LIMIT 1),
           |s$k AS (
           |  SELECT replace(state,
           |                 chr(1) || t$k."left" || chr(2) || chr(1) || t$k."right" || chr(2),
           |                 chr(1) || t$k."left" || t$k."right" || chr(2)) AS state, freq
           |  FROM s${k - 1} CROSS JOIN t$k)""".stripMargin
      }
      .mkString(",\n")

  /** The whole training loop, unrolled `nMerges` rounds: each round's
    * argmax CTE feeds a replace() over the previous state CTE —
    * byte-identical semantics to [[bpeTrain]].
    */
  def bpeMergesSql(nMerges: Int, minFreq: Long = 1L): String = {
    val out = (1 to nMerges)
      .map(k =>
        s"""SELECT CAST($k AS BIGINT) AS merge_round, "left", "right", pair_count FROM t$k""")
      .mkString("\nUNION ALL\n")
    s"""WITH ${initialStatesSql(minFreq)},
       |${trainRoundsSql(nMerges)}
       |$out
       |ORDER BY merge_round""".stripMargin
  }

  /** [[bpeEncode]] unrolled: the training CTEs, then the document state
    * folded through each round's merge (LEFT JOIN ON TRUE so an
    * exhausted round — empty t_k — passes the state through unchanged,
    * matching the Spark fold over only the trained merges), then
    * symbol → id per [[MergedIdBase]]. The id CASE chain checks rounds
    * in ascending order, mirroring the Spark fold's first-match-wins.
    */
  /** Tokenizer fertility — the standard tokenizer-evaluation metric:
    * BPE pieces per word, per language. High fertility on a language
    * means the vocabulary under-serves it (each word shatters into many
    * pieces) — the number multilingual pipelines use to size per-lang
    * vocab budgets. Uses the STORED merge table (train-once, evaluate
    * per corpus slice); all sums are integers (order-independent); the
    * one division happens on the aggregated row.
    */
  def tokenizerFertility(
      spark: SparkSession,
      docs: DataFrame,
      nMerges: Int,
      minFreq: Long = 1L): DataFrame = {
    val modelDir = writeBpeModel(spark, docs, nMerges, minFreq)
    val enc = bpeApplyStored(spark, docs, modelDir).select(col("doc_id"), col("n_tokens"))
    val words = size(
      filter(
        Parity.tokens(col("text")),
        w => !w.contains(SepL) && !w.contains(SepR) && !w.contains(WordSep))).cast("long")
    docs
      .select(col("doc_id"), col("lang"), words.as("n_words"))
      .join(enc, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_bpe_tokens"))
      .select(
        col("lang"),
        col("n_docs"),
        col("n_words"),
        col("n_bpe_tokens"),
        when(col("n_words") > 0,
          round(col("n_bpe_tokens").cast("double") / col("n_words").cast("double"), 6))
          .otherwise(lit(0.0d)).as("fertility"))
  }

  /** DuckDB oracle for [[tokenizerFertility]]: the encode CTEs as a
    * subquery, per-lang integer rollup, one division on the aggregate. */
  def tokenizerFertilitySql(nMerges: Int, minFreq: Long = 1L): String = {
    val wordsSql =
      s"len(list_filter(${Parity.tokensSql("text")}, " +
        "w -> NOT contains(w, chr(1)) AND NOT contains(w, chr(2)) AND NOT contains(w, chr(3))))"
    s"""SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum($wordsSql) AS BIGINT) AS n_words,
       |       CAST(sum(e.n_tokens) AS BIGINT) AS n_bpe_tokens,
       |       CASE WHEN sum($wordsSql) > 0
       |            THEN round(CAST(sum(e.n_tokens) AS DOUBLE) / CAST(sum($wordsSql) AS DOUBLE), 6)
       |            ELSE CAST(0.0 AS DOUBLE) END AS fertility
       |FROM (${bpeEncodeSql(nMerges, minFreq)}) e
       |JOIN documents d USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  def bpeEncodeSql(nMerges: Int, minFreq: Long = 1L): String = {
    val docRounds = (1 to nMerges)
      .map { k =>
        s"""e$k AS (
           |  SELECT doc_id,
           |         CASE WHEN t$k."left" IS NULL THEN state
           |              ELSE replace(state,
           |                           chr(1) || t$k."left" || chr(2) || chr(1) || t$k."right" || chr(2),
           |                           chr(1) || t$k."left" || t$k."right" || chr(2)) END AS state
           |  FROM e${k - 1} LEFT JOIN t$k ON TRUE)""".stripMargin
      }
      .mkString(",\n")
    val idCases = (1 to nMerges)
      .map(k =>
        s"""WHEN t$k."left" IS NOT NULL AND sym = t$k."left" || t$k."right" THEN CAST(${MergedIdBase + k} AS BIGINT)""")
      .mkString(" ")
    val tJoins = (1 to nMerges).map(k => s"LEFT JOIN t$k ON TRUE").mkString(" ")
    s"""WITH ${initialStatesSql(minFreq)},
       |${trainRoundsSql(nMerges)},
       |e0 AS (
       |  SELECT doc_id,
       |         array_to_string(list_transform(
       |           list_filter(${Parity.tokensSql("text")},
       |                       w -> NOT contains(w, chr(1)) AND NOT contains(w, chr(2)) AND NOT contains(w, chr(3))),
       |           w -> array_to_string(list_transform(range(1, length(w) + 1),
       |                                               i -> chr(1) || substr(w, CAST(i AS INT), 1) || chr(2)),
       |                                '')),
       |         chr(3)) AS state
       |  FROM documents),
       |$docRounds,
       |symtab AS (
       |  SELECT doc_id,
       |         CASE WHEN length(s) = 0 THEN CAST([] AS VARCHAR[])
       |              ELSE string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) END AS syms
       |  FROM (SELECT doc_id, replace(state, chr(3), '') AS s FROM e$nMerges)),
       |idtab AS (
       |  SELECT doc_id,
       |         list_transform(syms, sym -> CASE $idCases
       |                                          ELSE CAST(ascii(sym) AS BIGINT) END) AS ids
       |  FROM symtab $tJoins)
       |SELECT doc_id,
       |       CAST(len(ids) AS BIGINT) AS n_tokens,
       |       array_to_string(list_transform(list_slice(ids, 1, $EncodeHeadK),
       |                                      x -> CAST(x AS VARCHAR)), ',') AS head_ids,
       |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ids), (acc, x) -> acc + x) AS BIGINT) AS sum_ids
       |FROM idtab
       |ORDER BY doc_id""".stripMargin
  }

  // ---- WordPiece-style greedy longest-match encoder -------------------------

  /** Unrolled matching steps for [[wordpieceEncode]] — one per emitted
    * piece; 8 covers the corpus' longest word even under full
    * character fallback (asserted by the pos-past-end fixpoint: a step
    * on a finished word is a no-op).
    */
  val WordpieceMaxSteps = 8

  /** WordPiece-style GREEDY LONGEST-MATCH encoding over the BPE-trained
    * piece vocabulary — the third canonical subword algorithm next to
    * merge-order BPE ([[bpeEncode]]) and Viterbi unigram
    * ([[unigramEncode]]): at each position take the LONGEST vocabulary
    * piece that matches (ties to the earliest-trained piece), falling
    * back to single characters. Deliberately shares the BPE vocabulary
    * so the two segmentations are comparable on identical pieces —
    * greedy longest-match and merge-order replay genuinely differ
    * (e.g. merges (a,b),(ab,c),(d,e) segment "dabc" as d|abc greedily
    * but d|ab|c under merge order when (d,e) outranks nothing at
    * position d).
    *
    * Scale shape: encoding runs on the DISTINCT-WORD histogram, never
    * the corpus (the [[unigramEncode]] discipline); each of the
    * [[WordpieceMaxSteps]] steps is a narrow codegen'd CASE chain over
    * literal pieces — no join, no explode. Corpus-level rollups join
    * the bounded word table back on the word key.
    *
    * Output per distinct word: `(word, freq, n_pieces, segs)` with
    * `segs` the '|'-joined segmentation.
    */
  def wordpieceEncode(
      spark: SparkSession,
      docs: DataFrame,
      nMerges: Int = 8,
      minFreq: Long = 2L): DataFrame = {
    val (merges, _) = trainMerges(spark, docs, nMerges, minFreq)
    val ordered = merges
      .map(m => (m.left + m.right, m.round))
      .groupBy(_._1)
      .map { case (p, g) => (p, g.map(_._2).min) }
      .toSeq
      .sortBy { case (p, r) => (-p.length, r, p) }
    var st = wordHistogram(docs).select(
      col("w"),
      col("freq"),
      lit(1).as("pos"),
      lit(0L).as("np"),
      lit("").as("segs"))
    (1 to WordpieceMaxSteps).foreach { _ =>
      val pieceCase = ordered
        .foldLeft(when(lit(false), lit("")))((acc, pr) =>
          acc.when(col("w").substr(col("pos"), lit(pr._1.length)) === pr._1, lit(pr._1)))
        .otherwise(col("w").substr(col("pos"), lit(1)))
      st = st
        .withColumn("piece", when(col("pos") <= length(col("w")), pieceCase))
        .select(
          col("w"),
          col("freq"),
          when(col("piece").isNull, col("pos"))
            .otherwise(col("pos") + length(col("piece")))
            .as("pos"),
          when(col("piece").isNull, col("np")).otherwise(col("np") + 1L).as("np"),
          when(col("piece").isNull, col("segs"))
            .otherwise(
              when(col("segs") === "", col("piece"))
                .otherwise(concat(col("segs"), lit("|"), col("piece"))))
            .as("segs"))
    }
    st.select(col("w").as("word"), col("freq"), col("np").as("n_pieces"), col("segs"))
  }

  /** [[wordpieceEncode]] mirrored: the training CTEs build the piece
    * table, then [[WordpieceMaxSteps]] unrolled (match, argmax-by-length,
    * advance) steps over the word histogram.
    */
  def wordpieceEncodeSql(nMerges: Int = 8, minFreq: Long = 2L): String = {
    val pieceUnion = (1 to nMerges)
      .map(k => s"""SELECT t$k."left" || t$k."right" AS piece, $k AS rnd FROM t$k""")
      .mkString(" UNION ALL ")
    val steps = (1 to WordpieceMaxSteps)
      .map { t =>
        s"""c$t AS MATERIALIZED (
           |  SELECT s.word, s.freq, s.pos, s.np, s.segs, p.piece, p.len,
           |         row_number() OVER (PARTITION BY s.word
           |                            ORDER BY p.len DESC, p.rnd) AS rn
           |  FROM w${t - 1} s LEFT JOIN allp p
           |    ON s.pos <= length(s.word) AND substr(s.word, s.pos, p.len) = p.piece),
           |w$t AS MATERIALIZED (
           |  SELECT word, freq,
           |         CASE WHEN piece IS NULL THEN pos ELSE pos + len END AS pos,
           |         CASE WHEN piece IS NULL THEN np ELSE np + 1 END AS np,
           |         CASE WHEN piece IS NULL THEN segs
           |              WHEN segs = '' THEN piece
           |              ELSE segs || '|' || piece END AS segs
           |  FROM c$t WHERE rn = 1)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH ${initialStatesSql(minFreq)},
       |${trainRoundsSql(nMerges)},
       |mp AS MATERIALIZED (
       |  SELECT piece, CAST(min(rnd) AS BIGINT) AS rnd, length(piece) AS len
       |  FROM ($pieceUnion) WHERE piece IS NOT NULL GROUP BY piece),
       |wchars AS (
       |  SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS piece
       |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS i FROM hist)),
       |allp AS MATERIALIZED (
       |  SELECT piece, len, rnd FROM mp
       |  UNION ALL SELECT piece, 1, CAST(1000000 AS BIGINT) FROM wchars),
       |w0 AS (SELECT w AS word, freq, 1 AS pos, CAST(0 AS BIGINT) AS np, '' AS segs
       |       FROM hist),
       |$steps
       |SELECT word, CAST(freq AS BIGINT) AS freq, np AS n_pieces, segs
       |FROM w$WordpieceMaxSteps""".stripMargin
  }

  // ---- unigram (SentencePiece-style) tokenizer -----------------------------

  /** Trainer vocabulary cap: the unigram model trains on the TOP
    * words of the histogram by (freq, word) — the bounded-collect
    * discipline (SentencePiece itself caps its seed corpus); words
    * outside the cap are served by character fallback.
    */
  val UniMaxWords = 200

  /** Maximum candidate piece length (substring span). */
  val UniMaxPieceLen = 4

  /** Words longer than this are excluded from the trainer (fallback
    * serves them); also the Viterbi DP unroll depth.
    */
  val UniMaxWordLen = 16

  /** Sentinel for an impossible piece lookup inside the DP `greatest`
    * — far below any real 16-piece path score, far above overflow.
    */
  private val UniMissing = -1000000000000L

  /** Unigram-LM tokenizer (Kudo 2018, "Subword Regularization", the
    * SentencePiece unigram model), seed-vocabulary form: candidate
    * pieces are all substrings (length ≤ [[UniMaxPieceLen]]) of the
    * top-[[UniMaxWords]] histogram words, scored by occurrence-weighted
    * relative frequency (micro-unit integer log-probs on the shared
    * 9 dp ln grid), and each word is segmented by an exact VITERBI
    * dynamic program maximizing total piece log-prob, fewest-pieces
    * tie-break. The DP is pure column arithmetic — the per-position
    * values `v_e` maximize the lexicographic pair (score, −pieces)
    * packed into one integer (`score_micro · 32 − n_pieces`; a
    * ≤ [[UniMaxWordLen]]-char word has ≤ 16 < 32 pieces, so the pack
    * is injective and unpacks exactly).
    *
    * Scale shape: like BPE, the trainer NEVER touches the corpus —
    * one word-histogram aggregate, then a TakeOrdered cap; everything
    * after operates on ≤ [[UniMaxWords]] rows (substring explode,
    * piece histogram, 16-step DP as withColumn chain — no loop, no
    * shuffle beyond the two tiny aggregates).
    *
    * Output: `(w, freq, n_pieces, score_micro)` per trained word.
    */
  def unigramSegments(docs: DataFrame): DataFrame = {
    val top = wordHistogram(docs)
      .filter(length(col("w")) <= UniMaxWordLen)
      .orderBy(col("freq").desc, col("w"))
      .limit(UniMaxWords)
    // (start, len) grid per word — every candidate piece occurrence
    val grid = flatten(
      transform(
        sequence(lit(1), length(col("w"))),
        i =>
          transform(
            sequence(lit(1), least(lit(UniMaxPieceLen), length(col("w")) - i + 1)),
            l => struct(i.cast("long").as("i"), l.cast("long").as("l")))))
    val subs = top
      .select(col("w"), col("freq"), explode(grid).as("il"))
      .select(
        col("w"),
        col("freq"),
        col("il.i").as("i"),
        col("il.l").as("l"),
        expr("substr(w, CAST(i AS INT), CAST(l AS INT))").as("p"))
    val cnt = subs.groupBy(col("p")).agg(sum(col("freq")).as("c"))
    val tot = cnt.agg(sum(col("c")).as("t"))
    val sc = cnt
      .crossJoin(broadcast(tot))
      .select(
        col("p"),
        expr(
          "CAST(round(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 9) * 1000000.0) AS BIGINT)")
          .as("s"))
    // pivot scores to one row per word: s_e_l = score of the piece
    // ENDING at position e with length l
    val scored = subs
      .join(sc, Seq("p"))
      .select(col("w"), col("freq"), (col("i") + col("l") - 1).as("e"), col("l"), col("s"))
    val aggCols = for {
      e <- 1 to UniMaxWordLen
      l <- 1 to math.min(UniMaxPieceLen, e)
    } yield max(when(col("e") === e && col("l") === l, col("s"))).as(s"s_${e}_$l")
    var dp = scored
      .groupBy(col("w"), col("freq"))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("n", length(col("w")).cast("long"))
    (1 to UniMaxWordLen).foreach { e =>
      val cands = (1 to math.min(UniMaxPieceLen, e)).map { l =>
        val prev = if (e - l == 0) lit(0L) else col(s"v_${e - l}")
        prev + coalesce(col(s"s_${e}_$l"), lit(UniMissing)) * 32L - 1L
      }
      dp = dp.withColumn(s"v_$e", if (cands.size == 1) cands.head else greatest(cands: _*))
    }
    val cArr = array((1 to UniMaxWordLen).map(e => col(s"v_$e")): _*)
    dp.select(col("w"), col("freq"), element_at(cArr, col("n").cast("int")).as("c"))
      .select(
        col("w"),
        col("freq"),
        expr("(-c) % 32").as("n_pieces"),
        expr("(c + ((-c) % 32)) div 32").as("score_micro"))
  }

  /** Serve the tokenizer over the corpus: per-language fertility
    * (pieces per word) under the trained segmentation, with CHARACTER
    * FALLBACK for out-of-vocabulary words (`n_pieces = len(word)` —
    * the byte-fallback discipline that makes the tokenizer total).
    * One corpus explode + a broadcast join against the
    * ≤ [[UniMaxWords]]-row segment table + one hash aggregate.
    */
  def unigramFertility(docs: DataFrame, segments: DataFrame): DataFrame =
    docs
      .select(col("lang"), explode(Parity.tokens(col("text"))).as("t"))
      .join(
        broadcast(segments.select(col("w"), col("n_pieces"))),
        col("t") === col("w"),
        "left_outer")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(coalesce(col("n_pieces"), length(col("t")).cast("long"))).as("n_pieces"))
      .select(
        col("lang"),
        col("n_words"),
        col("n_pieces"),
        expr("n_pieces * 1000 div n_words").as("fert_milli"))

  /** Persist the trained segment table as a parquet artifact. */
  def writeUnigramModel(spark: SparkSession, docs: DataFrame): String = {
    val dir = graft.sources.Staging.freshDir("unigram-model")
    unigramSegments(docs).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  /** [[unigramFertility]] over the STORED artifact — train-once /
    * apply-many; applied to the training corpus it reproduces the
    * in-query fertility exactly, so the two share an oracle.
    */
  def unigramFertilityStored(
      spark: SparkSession,
      docs: DataFrame,
      modelDir: String): DataFrame =
    unigramFertility(docs, spark.read.parquet(modelDir))

  /** CTE chain mirroring [[unigramSegments]] through `ures`. */
  private def unigramCtes(): String = {
    val toksSql = Parity.tokensSql("text")
    val sCols = (for {
      e <- 1 to UniMaxWordLen
      l <- 1 to math.min(UniMaxPieceLen, e)
    } yield s"max(CASE WHEN i + l - 1 = $e AND l = $l THEN s END) AS s_${e}_$l")
      .mkString(",\n                 ")
    val dpCtes = (1 to UniMaxWordLen)
      .map { e =>
        val cands = (1 to math.min(UniMaxPieceLen, e)).map { l =>
          val prev = if (e - l == 0) "CAST(0 AS BIGINT)" else s"v_${e - l}"
          s"($prev + coalesce(s_${e}_$l, $UniMissing) * 32 - 1)"
        }
        val v = if (cands.size == 1) cands.head else cands.mkString("greatest(", ", ", ")")
        val from = if (e == 1) "uwide" else s"udp${e - 1}"
        s"udp$e AS (SELECT *, $v AS v_$e FROM $from)"
      }
      .mkString(",\n")
    val cCase = (1 to UniMaxWordLen).map(e => s"WHEN $e THEN v_$e").mkString(" ")
    s"""uh AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toksSql) AS w FROM documents)
       |  WHERE NOT contains(w, chr(1)) AND NOT contains(w, chr(2)) AND NOT contains(w, chr(3))
       |  GROUP BY w),
       |utop AS (SELECT w, freq FROM uh WHERE length(w) <= $UniMaxWordLen
       |         ORDER BY freq DESC, w LIMIT $UniMaxWords),
       |usubs AS (SELECT w, freq, CAST(i AS BIGINT) AS i, CAST(l AS BIGINT) AS l,
       |                 substr(w, CAST(i AS INT), CAST(l AS INT)) AS p
       |          FROM utop, range(1, ${UniMaxWordLen + 1}) r1(i),
       |               range(1, ${UniMaxPieceLen + 1}) r2(l)
       |          WHERE i + l - 1 <= length(w)),
       |ucnt AS (SELECT p, CAST(sum(freq) AS BIGINT) AS c FROM usubs GROUP BY p),
       |utot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM ucnt),
       |usc AS (SELECT p,
       |               CAST(round(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 9)
       |                          * 1000000.0) AS BIGINT) AS s
       |        FROM ucnt CROSS JOIN utot),
       |uwide AS (SELECT w, freq, CAST(length(w) AS BIGINT) AS n,
       |                 $sCols
       |          FROM usubs JOIN usc USING (p) GROUP BY w, freq),
       |$dpCtes,
       |useg AS (SELECT w, freq, CASE n $cCase END AS c FROM udp$UniMaxWordLen),
       |ures AS (SELECT w, freq, (-c) % 32 AS n_pieces,
       |                (c + ((-c) % 32)) // 32 AS score_micro
       |         FROM useg)""".stripMargin
  }

  /** [[unigramSegments]] mirrored. */
  def unigramSegmentsSql(): String =
    s"""WITH ${unigramCtes()}
       |SELECT w, freq, n_pieces, score_micro FROM ures ORDER BY w""".stripMargin

  /** Merge-count grid for [[compressionCurve]]. */
  val CurveMergeCounts = Seq(2, 4, 8)

  /** BPE compression-ROI curve: corpus-total pieces and fertility at
    * each candidate merge-table size — the marginal-return table that
    * decides when to stop growing the vocabulary (each row answers
    * "what did the next merges buy"). Trains ONCE at the largest
    * budget and slices PREFIXES for the smaller points: sequential BPE
    * has the prefix property (the budget-k merge list is the first k
    * rows of the budget-K list, K ≥ k — the round argmax doesn't
    * depend on the unpicked tail), and the per-budget DuckDB oracle
    * replays the sequential loop exactly, so the batched trainer's
    * budget-k output ≡ sequential(k) ≡ prefix-k of sequential(K) —
    * the gate itself proves every link. Exhaustion folds in free:
    * `take(k)` of an m-merge exhausted list is the m-merge list.
    *
    * Scale shape: ONE histogram-based training (corpus never scanned
    * per merge round) plus ONE fused encode pass — the grid's states
    * are prefix-chained folds of the same merge list, so each budget's
    * state extends the previous one inside a single projection, the
    * piece count is the `` wrap-char count (`length − length
    * (replace)`, no symbol-array construction), and the whole curve is
    * one corpus scan ending in one |grid|+1-sum aggregate. Was |grid|
    * trainings + |grid| encode scans + a word-count scan.
    *
    * Output: one row per budget
    * `(n_merges, n_words, n_pieces, fert_milli)`.
    */
  def compressionCurve(
      spark: SparkSession,
      docs: DataFrame,
      ks: Seq[Int] = CurveMergeCounts): DataFrame = {
    import spark.implicits._
    val (allMerges, _) = trainMerges(spark, docs, ks.max)
    val wordsArr = filter(
      Parity.tokens(col("text")),
      w => !w.contains(SepL) && !w.contains(SepR) && !w.contains(WordSep))
    val wordState = (w: Column) =>
      array_join(
        transform(
          sequence(lit(1), length(w)),
          i => concat(lit(SepL), w.substr(i, lit(1)), lit(SepR))),
        "")
    val state0 = array_join(transform(wordsArr, wordState), WordSep)
    val sorted = ks.sorted
    var st = state0
    var prev = 0
    val pieceCols = sorted.map { k =>
      st = allMerges.slice(prev, k).foldLeft(st)((s, m) => mergeReplace(s, m.left, m.right))
      prev = k
      (length(st) - length(replace(st, lit(SepL), lit("")))).cast("long").as(s"p$k")
    }
    val row = docs
      .select(size(wordsArr).cast("long").as("w") +: pieceCols: _*)
      .agg(sum(col("w")).as("w"), sorted.map(k => sum(col(s"p$k")).as(s"p$k")): _*)
      .head()
    val words = row.getLong(0)
    sorted.zipWithIndex
      .map { case (k, i) =>
        val pieces = row.getLong(i + 1)
        (k.toLong, words, pieces, pieces * 1000L / words)
      }
      .toDF("n_merges", "n_words", "n_pieces", "fert_milli")
  }

  /** [[compressionCurve]] mirrored: one encode-CTE subquery per budget,
    * unioned. */
  def compressionCurveSql(ks: Seq[Int] = CurveMergeCounts): String = {
    val wordsSql =
      s"len(list_filter(${Parity.tokensSql("text")}, " +
        "w -> NOT contains(w, chr(1)) AND NOT contains(w, chr(2)) AND NOT contains(w, chr(3))))"
    ks.map { k =>
        s"""SELECT CAST($k AS BIGINT) AS n_merges,
           |       (SELECT CAST(sum($wordsSql) AS BIGINT) FROM documents) AS n_words,
           |       CAST(sum(e.n_tokens) AS BIGINT) AS n_pieces,
           |       CAST(sum(e.n_tokens) AS BIGINT) * 1000
           |         // (SELECT CAST(sum($wordsSql) AS BIGINT) FROM documents) AS fert_milli
           |FROM (${bpeEncodeSql(k)}) e""".stripMargin
      }
      .mkString("\nUNION ALL\n")
  }

  /** Context lengths [[contextFit]] reports on — the capacity-planning
    * grid a training run sizes its sequence length against. */
  val ContextLengths = Seq(128L, 512L, 2048L)

  /** Context-length fit report: for each candidate sequence length C,
    * how the corpus packs — `n_chunks_padded = Σ_doc ceil(tok/C)` (the
    * one-doc-per-sequence regime, each doc padded to a multiple of C)
    * vs `n_chunks_packed = ceil(Σ tok / C)` (the concat-and-chunk
    * regime), with the padding waste `(padded·C − Σtok)·10⁶ div
    * (padded·C)` in exact ppm. The table that decides both the training
    * sequence length and whether sequence packing is worth its
    * attention-mask complexity — at short C long docs split cleanly
    * (low waste), at long C short docs drown in padding.
    *
    * Scale shape: ONE corpus scan to per-doc token counts (narrow map,
    * no explode of tokens), a 3× constant fan-out on the counts only,
    * one hash aggregate. All integer arithmetic.
    *
    * Output: one row per C —
    * `(ctx_len, n_docs, n_tokens, n_chunks_padded, waste_ppm,
    * n_chunks_packed)`.
    */
  def contextFit(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(size(Parity.tokens(col("text"))).cast("long").as("tok"))
    perDoc
      .select(
        explode(array(ContextLengths.map(lit): _*)).as("ctx_len"),
        col("tok"))
      .groupBy(col("ctx_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        sum(expr("(tok + ctx_len - 1) div ctx_len")).as("n_chunks_padded"))
      .select(
        col("ctx_len"),
        col("n_docs"),
        col("n_tokens"),
        col("n_chunks_padded"),
        expr("(n_chunks_padded * ctx_len - n_tokens) * 1000000" +
          " div (n_chunks_padded * ctx_len)").as("waste_ppm"),
        expr("(n_tokens + ctx_len - 1) div ctx_len").as("n_chunks_packed"))
  }

  /** [[contextFit]] mirrored. */
  def contextFitSql(): String = {
    val cs = ContextLengths.mkString("[", ", ", "]")
    s"""WITH pd AS (SELECT CAST(len(${Parity.tokensSql("text")}) AS BIGINT) AS tok
       |            FROM documents),
       |x AS (SELECT unnest($cs) AS ctx_len, tok FROM pd),
       |a AS (SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
       |             CAST(count(*) AS BIGINT) AS n_docs,
       |             CAST(sum(tok) AS BIGINT) AS n_tokens,
       |             CAST(sum((tok + ctx_len - 1) // ctx_len) AS BIGINT) AS n_chunks_padded
       |      FROM x GROUP BY 1)
       |SELECT ctx_len, n_docs, n_tokens, n_chunks_padded,
       |       (n_chunks_padded * ctx_len - n_tokens) * 1000000
       |         // (n_chunks_padded * ctx_len) AS waste_ppm,
       |       (n_tokens + ctx_len - 1) // ctx_len AS n_chunks_packed
       |FROM a""".stripMargin
  }

  /** Vocabulary ranks [[vocabCoverage]] reports at — the candidate
    * vocab sizes a tokenizer budget weighs. */
  val CoverageRanks = Seq(100L, 1000L, 10000L)

  /** Vocabulary coverage curve: what share of all token OCCURRENCES the
    * top-k most frequent word types cover, at each candidate vocab
    * size — the sizing table read before training a tokenizer (the
    * complement of the Zipf fit: Zipf says how the tail decays,
    * coverage says where to cut it). Ranks tie-break on the token
    * string so the running sum is fully deterministic; shares are
    * exact integer ppm. A k past the vocabulary reports full coverage
    * with the true type count.
    *
    * Scale shape: the corpus compresses to one row per word type
    * (hash aggregate, map-side partials); the single-series running
    * sum windows over the |vocab|-row table, and only ≤ 3 rows leave.
    *
    * Output: one row per k —
    * `(k, n_types, n_tokens_total, covered, coverage_ppm)`.
    */
  def vocabCoverage(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs
      .select(explode(Parity.tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("f"))
    val tot = freq.agg(sum(col("f")).as("n_tokens_total"), count(lit(1)).as("n_types"))
    val ord = Window
      .orderBy(col("f").desc, col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = freq
      .withColumn("rk", row_number().over(Window.orderBy(col("f").desc, col("w"))))
      .withColumn("cum", sum(col("f")).over(ord))
    ranked
      .crossJoin(broadcast(tot))
      .select(
        explode(array(CoverageRanks.map(lit): _*)).as("k"),
        col("rk"),
        col("cum"),
        col("n_types"),
        col("n_tokens_total"))
      .filter(col("rk") === least(col("k"), col("n_types")))
      .select(
        col("k"),
        col("n_types"),
        col("n_tokens_total"),
        col("cum").as("covered"),
        expr("cum * 1000000 div n_tokens_total").as("coverage_ppm"))
  }

  /** [[vocabCoverage]] mirrored. */
  def vocabCoverageSql(): String = {
    val ks = CoverageRanks.mkString("[", ", ", "]")
    s"""WITH freq AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(${Parity.tokensSql("text")}) AS w FROM documents)
       |  GROUP BY w),
       |t AS (SELECT CAST(sum(f) AS BIGINT) AS n_tokens_total,
       |             CAST(count(*) AS BIGINT) AS n_types FROM freq),
       |rk AS (
       |  SELECT CAST(row_number() OVER (ORDER BY f DESC, w) AS BIGINT) AS rk,
       |         CAST(sum(f) OVER (ORDER BY f DESC, w ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |           AS cum
       |  FROM freq),
       |ks AS (SELECT CAST(unnest($ks) AS BIGINT) AS k)
       |SELECT ks.k, t.n_types, t.n_tokens_total, rk.cum AS covered,
       |       rk.cum * 1000000 // t.n_tokens_total AS coverage_ppm
       |FROM ks CROSS JOIN t JOIN rk ON rk.rk = least(ks.k, t.n_types)""".stripMargin
  }

  /** [[unigramFertility]] mirrored (also the stored-serving oracle). */
  def unigramFertilitySql(): String = {
    val toksSql = Parity.tokensSql("text")
    s"""WITH ${unigramCtes()},
       |utok AS (SELECT lang, unnest($toksSql) AS t FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(coalesce(r.n_pieces, length(t.t))) AS BIGINT) AS n_pieces,
       |       CAST(sum(coalesce(r.n_pieces, length(t.t))) * 1000 // count(*) AS BIGINT)
       |         AS fert_milli
       |FROM utok t LEFT JOIN ures r ON r.w = t.t
       |GROUP BY lang ORDER BY lang""".stripMargin
  }
}
