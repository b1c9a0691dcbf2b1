package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Sequence packing for LLM pretraining: fitting variable-length
  * documents into fixed-capacity training sequences (context windows).
  * Two standard disciplines, reported side by side:
  *
  *  - '''concat-then-chunk''' ([[seqPack]]): documents are concatenated
  *    in a deterministic order and the token stream is cut every
  *    `capacity` tokens (the GPT-style packing used by most pretraining
  *    pipelines — zero padding waste, but documents straddle chunk
  *    boundaries and lose a cross-boundary attention span).
  *  - '''no-split next-fit''' ([[packNextFit]]): each document is kept
  *    whole; a bin is closed when the next document no longer fits
  *    (the document-integrity packing used when truncation is not
  *    acceptable — no straddling, but padding waste).
  *
  * The pair quantifies the actual trade a curation user tunes: cuts vs
  * waste at a given capacity.
  *
  * Scale shape: packing is sequential by nature, so it is made
  * distributed the way real pipelines do — per-shard. Documents land in
  * `nShards` deterministic shards (`doc_id % nShards`); each shard
  * packs independently (order = `doc_id`, the stand-in for the fixed
  * pretraining shuffle order). [[seqPack]] is a per-shard window prefix
  * sum plus integer division — no fold at all. [[packNextFit]] folds a
  * per-shard token-length list; at 100 TB `nShards` grows with the
  * corpus (one shard per input split) so each fold stays
  * splits-sized — nothing here ever needs a global sort or a
  * driver-side loop.
  */
object Packing {

  /** Training-sequence token capacity (tokens per context window). The
    * synthetic docs run 10–99 whitespace tokens, so 256 packs ~4–5 docs
    * per sequence — the same docs-per-window regime a 2k-token window
    * has over real web documents.
    */
  val Capacity = 256L

  /** Documents per shard for the DERIVED shard count: production
    * queries shard the corpus into `ceil(n_docs / DocsPerShard)` packing
    * shards — one per "input split" — so each per-shard fold stays
    * split-sized as the corpus grows instead of growing with it
    * (sf0.01: 500 docs → 8 shards; sf0.1: 5 000 → 79; 100 TB → one per
    * actual input split). The oracle derives the same count from the
    * same table ([[shardsForSql]]), so parity holds at every sf with
    * DIFFERENT shard counts.
    */
  val DocsPerShard = 64L

  /** Fixture shard count: specs pass doc_ids that are multiples of this
    * to route a hand-built corpus into one shard. Production queries do
    * NOT use it — they derive the count via [[shardsFor]].
    */
  val NShards = 8L

  /** Scale-coupled shard count: one bounded driver-side scalar (a
    * parquet count(*) — metadata speed), mirrored in SQL by
    * [[shardsForSql]].
    */
  def shardsFor(docs: DataFrame): Long =
    math.max(1L, (docs.count() + DocsPerShard - 1) / DocsPerShard)

  /** The same derivation as a one-row CTE body over `documents`. */
  def shardsForSql: String =
    s"SELECT greatest(1, (count(*) + ${DocsPerShard - 1}) // $DocsPerShard) AS n FROM documents"

  private def nTok(text: Column): Column = size(Parity.tokens(text)).cast("long")

  /** Concat-then-chunk packing report, per shard: the token stream cut
    * every [[Capacity]] tokens. A document occupying stream positions
    * `[cum, cum + n)` straddles a boundary iff its first and last token
    * fall in different chunks; `n_cuts` counts boundary crossings
    * (= extra attention-span truncations), `tail_pad` is the only
    * padding (the final partial chunk). `fill_ppm` is exact integer
    * parts-per-million.
    *
    * One narrow map + one per-shard window prefix sum + one 8-row
    * aggregate; the window sort is per-shard (parallel across shards),
    * never global.
    */
  def seqPack(docs: DataFrame, capacity: Long = Capacity, nShards: Long = -1L): DataFrame = {
    val nsh = if (nShards > 0) nShards else shardsFor(docs)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val chunks =
      docs
        .select(col("doc_id"), (col("doc_id") % nsh).as("shard"), nTok(col("text")).as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("cum_before", sum(col("n_tok")).over(w) - col("n_tok"))
        .select(
          col("shard"),
          col("n_tok"),
          expr(s"cum_before div $capacity").as("c0"),
          expr(s"(cum_before + n_tok - 1) div $capacity").as("c1"))
    val nChunks = expr(s"(sum(n_tok) + ${capacity - 1}) div $capacity")
    chunks
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        nChunks.as("n_chunks"),
        sum(when(col("c1") > col("c0"), 1L).otherwise(0L)).as("n_straddled"),
        sum(col("c1") - col("c0")).as("n_cuts"),
        (nChunks * capacity - sum(col("n_tok"))).as("tail_pad"),
        expr(s"sum(n_tok) * 1000000 div (((sum(n_tok) + ${capacity - 1}) div $capacity) * $capacity)")
          .as("fill_ppm"))
  }

  /** [[seqPack]] mirrored: same shard rule, same prefix sum, same
    * integer division (`//`).
    */
  def seqPackSql(capacity: Long = Capacity, nShards: Long = -1L): String =
    s"""WITH nsh AS (${if (nShards > 0) s"SELECT CAST($nShards AS BIGINT) AS n" else shardsForSql}),
       |t AS (
       |  SELECT doc_id, doc_id % nsh.n AS shard,
       |         CAST(len(${Parity.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents CROSS JOIN nsh),
       |c AS (
       |  SELECT shard, doc_id, n_tok,
       |         CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok AS cum_before
       |  FROM t WHERE n_tok > 0),
       |m AS (
       |  SELECT shard, n_tok,
       |         cum_before // $capacity AS c0,
       |         (cum_before + n_tok - 1) // $capacity AS c1
       |  FROM c)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |       CAST((sum(n_tok) + ${capacity - 1}) // $capacity AS BIGINT) AS n_chunks,
       |       CAST(sum(CASE WHEN c1 > c0 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddled,
       |       CAST(sum(c1 - c0) AS BIGINT) AS n_cuts,
       |       CAST(((sum(n_tok) + ${capacity - 1}) // $capacity) * $capacity - sum(n_tok) AS BIGINT)
       |         AS tail_pad,
       |       CAST(sum(n_tok) * 1000000 //
       |         (((sum(n_tok) + ${capacity - 1}) // $capacity) * $capacity) AS BIGINT) AS fill_ppm
       |FROM m GROUP BY shard""".stripMargin

  /** No-split next-fit packing report, per shard: documents are placed
    * whole, in `doc_id` order; a bin closes the moment the next
    * document does not fit (next-fit — the streaming-friendly packing:
    * one open bin, O(1) state). Oversize documents (`n_tok > capacity`)
    * are counted and skipped — upstream they are truncated or split,
    * and counting them is the knob a user reads to pick the capacity.
    *
    * `waste_tokens` includes every closed bin's slack AND the open
    * bin's tail, so `n_packed_tokens + waste_tokens =
    * bins_used · capacity` exactly.
    *
    * The fold is the textbook sequential next-fit state machine
    * `(fill, bins, waste)`, run inside ONE codegen'd `aggregate`
    * expression over the shard's token-length list — the list is
    * splits-sized by construction (see the object doc), so the
    * `collect_list` here is a per-shard buffer, not a global one.
    */
  def packNextFit(
      docs: DataFrame,
      capacity: Long = Capacity,
      nShards: Long = -1L): DataFrame = {
    val nsh = if (nShards > 0) nShards else shardsFor(docs)
    val base = docs.select(
      col("doc_id"),
      (col("doc_id") % nsh).as("shard"),
      nTok(col("text")).as("n_tok"))
    val g = base
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tok") > capacity, 1L).otherwise(0L)).as("n_oversize"),
        coalesce(
          sum(when(col("n_tok") > 0 && col("n_tok") <= capacity, col("n_tok"))),
          lit(0L)).as("n_packed_tokens"),
        sort_array(
          collect_list(
            when(
              col("n_tok") > 0 && col("n_tok") <= capacity,
              struct(col("doc_id"), col("n_tok"))))).as("ds"))
    val st = aggregate(
      transform(col("ds"), d => d.getField("n_tok")),
      struct(lit(0L).as("fill"), lit(0L).as("bins"), lit(0L).as("waste")),
      (acc, x) =>
        when(
          acc.getField("bins") === 0L,
          struct(x.as("fill"), lit(1L).as("bins"), lit(0L).as("waste")))
          .when(
            acc.getField("fill") + x <= capacity,
            struct(
              (acc.getField("fill") + x).as("fill"),
              acc.getField("bins").as("bins"),
              acc.getField("waste").as("waste")))
          .otherwise(struct(
            x.as("fill"),
            (acc.getField("bins") + 1L).as("bins"),
            (acc.getField("waste") + capacity - acc.getField("fill")).as("waste"))))
    g.withColumn("st", st)
      .select(
        col("shard"),
        col("n_docs"),
        col("n_oversize"),
        col("n_packed_tokens"),
        col("st.bins").as("bins_used"),
        when(col("st.bins") === 0L, 0L)
          .otherwise(col("st.waste") + capacity - col("st.fill"))
          .as("waste_tokens"),
        when(col("st.bins") === 0L, 0L)
          .otherwise(expr(s"n_packed_tokens * 1000000 div (st.bins * $capacity)"))
          .as("fill_ppm"))
  }

  /** [[packNextFit]] mirrored: the same state machine as a
    * `list_reduce` whose accumulator is a 3-element BIGINT list
    * `[fill, bins, waste]` (LIST, not STRUCT — DuckDB 1.0's struct
    * lambda accumulators misread fields mid-fold; see the Holt note in
    * PERF_NOTES). Elements are wrapped `[x]` so seed and element share
    * the accumulator's type.
    */
  def packNextFitSql(capacity: Long = Capacity, nShards: Long = -1L): String =
    s"""WITH nsh AS (${if (nShards > 0) s"SELECT CAST($nShards AS BIGINT) AS n" else shardsForSql}),
       |t AS (
       |  SELECT doc_id, doc_id % nsh.n AS shard,
       |         CAST(len(${Parity.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents CROSS JOIN nsh),
       |g AS (
       |  SELECT shard,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(count(*) FILTER (WHERE n_tok > $capacity) AS BIGINT) AS n_oversize,
       |         CAST(coalesce(sum(n_tok) FILTER (WHERE n_tok > 0 AND n_tok <= $capacity), 0)
       |           AS BIGINT) AS n_packed_tokens,
       |         list(n_tok ORDER BY doc_id) FILTER (WHERE n_tok > 0 AND n_tok <= $capacity) AS ns
       |  FROM t GROUP BY shard),
       |f AS (
       |  SELECT shard, n_docs, n_oversize, n_packed_tokens,
       |         list_reduce(
       |           -- a shard with zero packable docs leaves ns NULL (list(..) FILTER
       |           -- over no rows); coalesce to [] so the fold degrades to the seed,
       |           -- exactly like the Spark aggregate over an empty collect_list
       |           list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
       |                        coalesce(list_transform(ns, x -> [x]), [])),
       |           (acc, x) -> CASE
       |             WHEN acc[2] = 0 THEN [x[1], CAST(1 AS BIGINT), CAST(0 AS BIGINT)]
       |             WHEN acc[1] + x[1] <= $capacity THEN [acc[1] + x[1], acc[2], acc[3]]
       |             ELSE [x[1], acc[2] + 1, acc[3] + $capacity - acc[1]] END) AS st
       |  FROM g)
       |SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_oversize, n_packed_tokens,
       |       st[2] AS bins_used,
       |       CASE WHEN st[2] = 0 THEN CAST(0 AS BIGINT)
       |            ELSE st[3] + $capacity - st[1] END AS waste_tokens,
       |       CASE WHEN st[2] = 0 THEN CAST(0 AS BIGINT)
       |            ELSE n_packed_tokens * 1000000 // (st[2] * $capacity) END AS fill_ppm
       |FROM f""".stripMargin

  /** No-split BEST-FIT-DECREASING packing report, per shard: documents
    * sorted by descending token count (ties by doc_id) and each placed
    * in the FULLEST open bin it still fits — the classic 11/9·OPT+1
    * offline heuristic (Johnson 1973), closing the packing quality
    * ladder above [[packNextFit]]'s 2-approx streaming form
    * (spec-asserted never worse on the same shards). This is the
    * packing a batch pipeline runs when it can afford a sort; the
    * waste delta against next-fit is the number that decides whether
    * the sort is worth it.
    *
    * The fold's accumulator is the OPEN-BIN LOAD LIST (≤ docs/1 bins,
    * shard-bounded), searched per placement with bounded list ops —
    * still one aggregate expression per shard, no driver loop.
    */
  def packBestFit(
      docs: DataFrame,
      capacity: Long = Capacity,
      nShards: Long = -1L): DataFrame = {
    val nsh = if (nShards > 0) nShards else shardsFor(docs)
    val base = docs.select(
      col("doc_id"),
      (col("doc_id") % nsh).as("shard"),
      nTok(col("text")).as("n_tok"))
    val g = base
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tok") > capacity, 1L).otherwise(0L)).as("n_oversize"),
        coalesce(
          sum(when(col("n_tok") > 0 && col("n_tok") <= capacity, col("n_tok"))),
          lit(0L)).as("n_packed_tokens"),
        sort_array(
          collect_list(
            when(
              col("n_tok") > 0 && col("n_tok") <= capacity,
              struct((-col("n_tok")).as("neg"), col("doc_id"))))).as("ds"))
    val bins = aggregate(
      transform(col("ds"), d => -d.getField("neg")),
      array().cast("array<bigint>"),
      (acc, x) => {
        val fits = filter(acc, l => l + x <= capacity)
        val best = array_max(fits)
        val idx = element_at(
          filter(sequence(lit(1), size(acc)), i => element_at(acc, i) === best),
          1)
        when(size(fits) === 0, concat(acc, array(x)))
          .otherwise(
            concat(
              slice(acc, lit(1), idx - 1),
              array(best + x),
              slice(acc, idx + 1, size(acc) - idx)))
      })
    g.withColumn("bins", bins)
      .select(
        col("shard"),
        col("n_docs"),
        col("n_oversize"),
        col("n_packed_tokens"),
        size(col("bins")).cast("long").as("bins_used"),
        (size(col("bins")).cast("long") * capacity - col("n_packed_tokens")).as("waste_tokens"),
        when(size(col("bins")) === 0, 0L)
          .otherwise(expr(s"n_packed_tokens * 1000000 div (size(bins) * $capacity)"))
          .as("fill_ppm"))
  }

  /** [[packBestFit]] mirrored: the same load-list fold as a
    * `list_reduce` (accumulator = the open-bin load list; the seed is
    * prepended, elements stay bare BIGINTs since the accumulator is
    * already a list).
    */
  def packBestFitSql(capacity: Long = Capacity, nShards: Long = -1L): String =
    s"""WITH nsh AS (${if (nShards > 0) s"SELECT CAST($nShards AS BIGINT) AS n" else shardsForSql}),
       |t AS (
       |  SELECT doc_id, doc_id % nsh.n AS shard,
       |         CAST(len(${Parity.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents CROSS JOIN nsh),
       |g AS (
       |  SELECT shard,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(count(*) FILTER (WHERE n_tok > $capacity) AS BIGINT) AS n_oversize,
       |         CAST(coalesce(sum(n_tok) FILTER (WHERE n_tok > 0 AND n_tok <= $capacity), 0)
       |           AS BIGINT) AS n_packed_tokens,
       |         list(n_tok ORDER BY n_tok DESC, doc_id)
       |           FILTER (WHERE n_tok > 0 AND n_tok <= $capacity) AS ns
       |  FROM t GROUP BY shard),
       |f AS (
       |  SELECT shard, n_docs, n_oversize, n_packed_tokens,
       |         list_reduce(
       |           -- elements wrapped [x] so seed (the empty load list) and
       |           -- elements share the accumulator's BIGINT[] type
       |           list_prepend(CAST([] AS BIGINT[]),
       |                        coalesce(list_transform(ns, x -> [x]), [])),
       |           (acc, x) -> CASE
       |             WHEN len(list_filter(acc, l -> l + x[1] <= $capacity)) = 0
       |               THEN list_append(acc, x[1])
       |             ELSE list_concat(list_concat(
       |                    acc[1:list_position(acc, list_max(list_filter(acc, l -> l + x[1] <= $capacity))) - 1],
       |                    [list_max(list_filter(acc, l -> l + x[1] <= $capacity)) + x[1]]),
       |                    acc[list_position(acc, list_max(list_filter(acc, l -> l + x[1] <= $capacity))) + 1:])
       |             END) AS bins
       |  FROM g)
       |SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_oversize, n_packed_tokens,
       |       CAST(len(bins) AS BIGINT) AS bins_used,
       |       CAST(len(bins) AS BIGINT) * $capacity - n_packed_tokens AS waste_tokens,
       |       CASE WHEN len(bins) = 0 THEN CAST(0 AS BIGINT)
       |            ELSE n_packed_tokens * 1000000 // (CAST(len(bins) AS BIGINT) * $capacity) END
       |         AS fill_ppm
       |FROM f""".stripMargin
  // ---- cross-document attention fraction ------------------------------------

  /** Cross-document attention mass of the two no-split packings — the
    * number that decides whether packed pretraining needs attention
    * masking (Zhao et al. 2024 "best-fit packing" measure the same
    * fraction): under full causal attention over a packed bin with doc
    * lengths l₁..l_m, total pairs are T(T+1)/2 for T = Σl and
    * within-doc pairs Σ lᵢ(lᵢ+1)/2 — everything else attends ACROSS
    * document boundaries. Within-doc mass is packing-invariant, so the
    * per-strategy difference is entirely in the bin totals.
    *
    * All-integer arithmetic off the same folds the packing reports run
    * (next-fit gains one accumulator slot for Σ T(T+1)/2 over closed
    * bins; best-fit reads its open-bin load list); one corpus scan per
    * strategy, bounded rollup after.
    *
    * Output: 2 rows `(strategy, bins_used, total_pairs, xdoc_pairs,
    * xdoc_ppm)` ordered by strategy.
    */
  def packXdoc(docs: DataFrame, capacity: Long = Capacity, nShards: Long = -1L): DataFrame = {
    val nsh = if (nShards > 0) nShards else shardsFor(docs)
    val base = docs.select(
      col("doc_id"),
      (col("doc_id") % nsh).as("shard"),
      nTok(col("text")).as("n_tok"))
    // shared within-doc mass over the packable docs
    val within = base
      .filter(col("n_tok") > 0 && col("n_tok") <= capacity)
      .agg(coalesce(sum(expr("n_tok * (n_tok + 1) div 2")), lit(0L)).as("w"))
    // T(T+1) is even and ≤ capacity², so the double division is exact
    // and the cast restores the fold's BIGINT accumulator type
    def pairsOf(load: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (load * (load + lit(1L)) / lit(2L)).cast("long")
    // next-fit: the packNextFit fold with a pair-sum slot (ps accumulates
    // closed bins; the final open bin is added at readout)
    val nfG = base
      .groupBy(col("shard"))
      .agg(
        sort_array(
          collect_list(
            when(
              col("n_tok") > 0 && col("n_tok") <= capacity,
              struct(col("doc_id"), col("n_tok"))))).as("ds"))
    val nfSt = aggregate(
      transform(col("ds"), d => d.getField("n_tok")),
      struct(lit(0L).as("fill"), lit(0L).as("bins"), lit(0L).as("ps")),
      (acc, x) =>
        when(
          acc.getField("bins") === 0L,
          struct(x.as("fill"), lit(1L).as("bins"), lit(0L).as("ps")))
          .when(
            acc.getField("fill") + x <= capacity,
            struct(
              (acc.getField("fill") + x).as("fill"),
              acc.getField("bins").as("bins"),
              acc.getField("ps").as("ps")))
          .otherwise(struct(
            x.as("fill"),
            (acc.getField("bins") + 1L).as("bins"),
            (acc.getField("ps") + pairsOf(acc.getField("fill"))).as("ps"))))
    val nf = nfG
      .withColumn("st", nfSt)
      .select(
        col("st.bins").as("bins"),
        when(col("st.bins") === 0L, 0L)
          .otherwise(col("st.ps") + pairsOf(col("st.fill")))
          .as("pairs"))
      .agg(sum(col("bins")).as("bins_used"), sum(col("pairs")).as("total_pairs"))
      .select(lit("nextfit").as("strategy"), col("bins_used"), col("total_pairs"))
    // best-fit-decreasing: Σ T(T+1)/2 straight off the load list
    val bfdG = base
      .groupBy(col("shard"))
      .agg(
        sort_array(
          collect_list(
            when(
              col("n_tok") > 0 && col("n_tok") <= capacity,
              struct((-col("n_tok")).as("neg"), col("doc_id"))))).as("ds"))
    val bfdBins = aggregate(
      transform(col("ds"), d => -d.getField("neg")),
      array().cast("array<bigint>"),
      (acc, x) => {
        val fits = filter(acc, l => l + x <= capacity)
        val best = array_max(fits)
        val idx = element_at(
          filter(sequence(lit(1), size(acc)), i => element_at(acc, i) === best),
          1)
        when(size(fits) === 0, concat(acc, array(x)))
          .otherwise(
            concat(
              slice(acc, lit(1), idx - 1),
              array(best + x),
              slice(acc, idx + 1, size(acc) - idx)))
      })
    val bfd = bfdG
      .withColumn("bins", bfdBins)
      .select(
        size(col("bins")).cast("long").as("nb"),
        aggregate(col("bins"), lit(0L), (acc, t) => acc + pairsOf(t)).as("pairs"))
      .agg(sum(col("nb")).as("bins_used"), sum(col("pairs")).as("total_pairs"))
      .select(lit("bestfit").as("strategy"), col("bins_used"), col("total_pairs"))
    bfd
      .unionAll(nf)
      .crossJoin(broadcast(within))
      .select(
        col("strategy"),
        col("bins_used"),
        col("total_pairs"),
        (col("total_pairs") - col("w")).as("xdoc_pairs"),
        expr("(total_pairs - w) * 1000000 div nullif(total_pairs, 0)").as("xdoc_ppm"))
      .orderBy(col("strategy"))
  }

  /** [[packXdoc]] mirrored: the same folds as `list_reduce`s (next-fit
    * accumulator = [fill, bins, ps]; best-fit = the load-list fold) and
    * the same T(T+1)/2 arithmetic.
    */
  def packXdocSql(capacity: Long = Capacity, nShards: Long = -1L): String =
    s"""WITH nsh AS (${if (nShards > 0) s"SELECT CAST($nShards AS BIGINT) AS n" else shardsForSql}),
       |t AS (
       |  SELECT doc_id, doc_id % nsh.n AS shard,
       |         CAST(len(${Parity.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents CROSS JOIN nsh),
       |w AS (
       |  SELECT CAST(coalesce(sum(n_tok * (n_tok + 1) // 2), 0) AS BIGINT) AS w
       |  FROM t WHERE n_tok > 0 AND n_tok <= $capacity),
       |nfg AS (
       |  SELECT shard, list(n_tok ORDER BY doc_id)
       |           FILTER (WHERE n_tok > 0 AND n_tok <= $capacity) AS ns
       |  FROM t GROUP BY shard),
       |nff AS (
       |  SELECT shard,
       |         list_reduce(
       |           list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
       |                        coalesce(list_transform(ns, x -> [x]), [])),
       |           (acc, x) -> CASE
       |             WHEN acc[2] = 0 THEN [x[1], CAST(1 AS BIGINT), CAST(0 AS BIGINT)]
       |             WHEN acc[1] + x[1] <= $capacity THEN [acc[1] + x[1], acc[2], acc[3]]
       |             ELSE [x[1], acc[2] + 1, acc[3] + acc[1] * (acc[1] + 1) // 2] END) AS st
       |  FROM nfg),
       |nf AS (
       |  SELECT 'nextfit' AS strategy,
       |         CAST(sum(st[2]) AS BIGINT) AS bins_used,
       |         CAST(sum(CASE WHEN st[2] = 0 THEN 0
       |                       ELSE st[3] + st[1] * (st[1] + 1) // 2 END) AS BIGINT) AS total_pairs
       |  FROM nff),
       |bfg AS (
       |  SELECT shard, list(n_tok ORDER BY n_tok DESC, doc_id)
       |           FILTER (WHERE n_tok > 0 AND n_tok <= $capacity) AS ns
       |  FROM t GROUP BY shard),
       |bff AS (
       |  SELECT shard,
       |         list_reduce(
       |           list_prepend(CAST([] AS BIGINT[]),
       |                        coalesce(list_transform(ns, x -> [x]), [])),
       |           (acc, x) -> CASE
       |             WHEN len(list_filter(acc, l -> l + x[1] <= $capacity)) = 0
       |               THEN list_append(acc, x[1])
       |             ELSE list_concat(list_concat(
       |                    acc[1:list_position(acc, list_max(list_filter(acc, l -> l + x[1] <= $capacity))) - 1],
       |                    [list_max(list_filter(acc, l -> l + x[1] <= $capacity)) + x[1]]),
       |                    acc[list_position(acc, list_max(list_filter(acc, l -> l + x[1] <= $capacity))) + 1:])
       |             END) AS bins
       |  FROM bfg),
       |bf AS (
       |  SELECT 'bestfit' AS strategy,
       |         CAST(sum(len(bins)) AS BIGINT) AS bins_used,
       |         CAST(sum(list_reduce(list_prepend(CAST(0 AS BIGINT), bins),
       |                              (a, b) -> a + b * (b + 1) // 2)) AS BIGINT) AS total_pairs
       |  FROM bff),
       |u AS (SELECT * FROM bf UNION ALL SELECT * FROM nf)
       |SELECT strategy, bins_used, total_pairs,
       |       total_pairs - w.w AS xdoc_pairs,
       |       (total_pairs - w.w) * 1000000 // nullif(total_pairs, 0) AS xdoc_ppm
       |FROM u CROSS JOIN w ORDER BY strategy""".stripMargin
}
