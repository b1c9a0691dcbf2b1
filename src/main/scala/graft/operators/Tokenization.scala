package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Tokenizer training: byte-pair-encoding merge induction over the
  * corpus — the step that turns "count tokens" into "own the tokenizer".
  *
  * Scale design: BPE never trains on the corpus — it trains on the WORD
  * HISTOGRAM ([[wordHistogram]]: one hash aggregate, map-side partial,
  * output = distinct tokens, orders of magnitude smaller than the
  * corpus). Every merge round is then one small aggregation over the
  * histogram plus a narrow map applying the merge; at 100 TB the corpus
  * is read exactly once.
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
  * proxy.
  *
  * No reference counterpart (north-star extension per BASELINE.json).
  */
object Tokenization {

  /** Symbol delimiters. U+0001/U+0002 never appear in the corpus (and
    * [[wordHistogram]] drops any word containing them, mirrored in the
    * oracle, so a hostile input degrades coverage, not correctness).
    */
  val SepL = "\u0001"
  val SepR = "\u0002"

  /** Whitespace-token histogram: (word, freq), one shuffle on the word.
    * The BPE training set.
    */
  def wordHistogram(docs: DataFrame): DataFrame =
    docs
      .select(explode(Parity.tokens(col("text"))).as("w"))
      .filter(!col("w").contains(SepL) && !col("w").contains(SepR))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))

  /** Initial BPE state: each distinct word as its wrapped character
    * sequence (`␁c␂` per char), with its corpus frequency.
    */
  def initialStates(docs: DataFrame): DataFrame =
    wordHistogram(docs).select(
      array_join(
        transform(
          sequence(lit(1), length(col("w"))),
          i => concat(lit(SepL), col("w").substr(i, lit(1)), lit(SepR))),
        "").as("state"),
      col("freq"))

  /** The symbol array of a state: strip the outermost delimiters, split
    * on the `␂␁` junctions.
    */
  private def symbols(state: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
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

  /** Train `nMerges` BPE merge rules: each round takes the most frequent
    * adjacent symbol pair (ties broken lexicographically — deterministic
    * across engines) and merges it greedily in every word state. Only
    * the single argmax row comes to the driver per round (a scalar, like
    * a convergence counter); the histogram itself never does. Returns
    * the merge table (merge_round, left, right, pair_count).
    */
  def bpeTrain(spark: SparkSession, docs: DataFrame, nMerges: Int): DataFrame = {
    import spark.implicits._
    var states = Phys.materialized(initialStates(docs))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val top = pairCounts(states)
        .orderBy(desc("pair_count"), col("left"), col("right"))
        .limit(1)
        .collect()
      if (top.isEmpty) {
        // every word is one symbol — mirror the oracle, whose round-k
        // argmax CTE is empty and contributes no row
        exhausted = true
      } else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        states = Phys.materialized(
          states.select(
            replace(
              col("state"),
              lit(SepL + l + SepR + SepL + r + SepR),
              lit(SepL + l + r + SepR)).as("state"),
            col("freq")))
        merges += ((merges.length + 1L, l, r, n))
      }
    }
    merges.toSeq.toDF("merge_round", "left", "right", "pair_count")
  }

  // ---- DuckDB mirrors ------------------------------------------------

  /** WITH-clause body producing the initial (state, freq) table. */
  val initialStatesSql: String =
    s"""hist AS (
       |  SELECT w, count(*) AS freq
       |  FROM (SELECT unnest(${Parity.tokensSql("text")}) AS w FROM documents)
       |  WHERE NOT contains(w, chr(1)) AND NOT contains(w, chr(2)) GROUP BY w),
       |s0 AS (
       |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
       |                                        i -> chr(1) || substr(w, CAST(i AS INT), 1) || chr(2)),
       |                         '') AS state,
       |         freq
       |  FROM hist)""".stripMargin

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
    s"""WITH $initialStatesSql
       |${pairCountsSql("s0")}
       |ORDER BY "left", "right"""".stripMargin

  /** The whole training loop, unrolled `nMerges` rounds: each round's
    * argmax CTE feeds a replace() over the previous state CTE —
    * byte-identical semantics to [[bpeTrain]].
    */
  def bpeMergesSql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { k =>
      s"""t$k AS (
         |  ${pairCountsSql(s"s${k - 1}").replace("\n", "\n  ")}
         |  ORDER BY pair_count DESC, "left", "right" LIMIT 1),
         |s$k AS (
         |  SELECT replace(state,
         |                 chr(1) || t$k."left" || chr(2) || chr(1) || t$k."right" || chr(2),
         |                 chr(1) || t$k."left" || t$k."right" || chr(2)) AS state, freq
         |  FROM s${k - 1} CROSS JOIN t$k)""".stripMargin
    }
    val out = (1 to nMerges)
      .map(k =>
        s"""SELECT CAST($k AS BIGINT) AS merge_round, "left", "right", pair_count FROM t$k""")
      .mkString("\nUNION ALL\n")
    s"""WITH $initialStatesSql,
       |${rounds.mkString(",\n")}
       |$out
       |ORDER BY merge_round""".stripMargin
  }
}
