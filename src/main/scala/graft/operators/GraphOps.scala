package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.INF

/** Spark-native rebuild of the reference's graph operators.
  *
  * Reference: `/root/reference/src/comp9313/ass4/SingleSourceSP.java` (SSSP,
  * Bellman-Ford label-correcting over Hadoop MR) and `ReverseGraph.java`
  * (graph transposition with sorted adjacency via secondary sort).
  *
  * Design: every operator is a pure `DataFrame => DataFrame` over the edge
  * schema `(src: Long, dst: Long, w: Double)`. The MR idioms do NOT carry
  * over (SURVEY.md §2.3): the A/O/U tagged-union shuffle becomes an
  * equi-join + min aggregation; the `Pair` WritableComparable + custom
  * partitioner + LinkedHashMap secondary sort becomes
  * `groupBy.agg(sort_array(collect_list(...)))`; the Hadoop counter becomes
  * a `count()` on the checkpointed state; the per-round HDFS round-trip
  * becomes `localCheckpoint`.
  *
  * Scale notes (100 TB): all aggregations here are hash-aggregatable with
  * map-side partial aggregation (the reference never wrote a combiner —
  * `setCombinerClass` is absent — so Spark is strictly better); the SSSP
  * loop's only per-round shuffles are the frontier⋈edges join and the
  * min-agg, both on a single long key, skew-handled by AQE; the edge table
  * is shuffled once (`repartition($"src")`) and that partitioning is reused
  * by every round's join.
  */
object GraphOps {

  /** Graph transposition with sorted adjacency output.
    *
    * Reference: `ReverseGraph.java:102-205` — map swaps (from,to) by
    * binding order (`:120-126`), a composite `Pair` key + custom
    * partitioner (`:134-143`) gets the shuffle to sort, and a reducer-wide
    * LinkedHashMap (`:153,165-180`) accumulates the ascending adjacency.
    * Duplicate (parallel) edges are preserved (`:165-180`, SURVEY.md Q3).
    *
    * Here: one hash-aggregate. `sort_array` keeps duplicates, matching the
    * reference; the single-reducer total order (`ReverseGraph.java:225`)
    * becomes an `orderBy` only at output time (callers that don't need a
    * total order skip it — at 100 TB a global sort is a deliberate act).
    */
  def reverseGraph(edges: DataFrame): DataFrame =
    edges
      .select(col("dst").as("node"), col("src"))
      .groupBy("node")
      .agg(concat_ws(",", sort_array(collect_list(col("src")))).as("adj"))

  /** Adjacency-list construction + SSSP state seeding (format job).
    *
    * Reference: `SingleSourceSP.java:56-129` — map projects edge lines to
    * `(from, "to:w")` (`:64-66`), reduce concatenates a CSV adjacency and
    * seeds `dist=0.0` for the query node / 65535.0 otherwise, flag=Y
    * (`:99-127`). The first-iteration flag is true for ALL nodes
    * (SURVEY.md Q5). Adjacency entries are emitted in shuffle order; here
    * they are sorted by (dst, w) to make output deterministic.
    */
  def buildAdjacency(edges: DataFrame, source: Long): DataFrame =
    edges
      .groupBy(col("src").as("node"))
      .agg(
        concat_ws(
          ",",
          transform(
            sort_array(collect_list(struct(col("dst"), col("w")))),
            e => concat(e("dst").cast("string"), lit(":"), e("w").cast("string")))
        ).as("adj"))
      .withColumn("dist", when(col("node") === source, 0.0).otherwise(INF))
      .withColumn("updated", lit(true))

  /** One Bellman-Ford relaxation round over an explicit state table.
    *
    * The Spark decomposition of the reference's A/O/U tagged shuffle
    * (`SingleSourceSP.java:157,166,190`, SURVEY.md §2.3):
    *
    *   frontier  = state where updated ∧ dist ≠ INF          (F2, `:179`)
    *   cand      = frontier ⋈ edges on id=src, dist+w        (M1, `:181-197`)
    *   best      = min(cand) per id                          (A2, `:214-270`)
    *   state'    = state FULL OUTER best                     (A2, `:224-281`)
    *
    * The join is FULL OUTER (not the reference's implicit left-outer):
    * nodes with no out-edges have no state row until a relaxation reaches
    * them, yet must then enter the state table (SURVEY.md Q4,
    * `SingleSourceSP.java:220,259-262`).
    *
    * At scale: `best` after the min-agg is small (≤ frontier out-degree
    * sum, collapsed per node) — AQE broadcast-joins it against state.
    * Partial (map-side) min runs automatically.
    */
  def ssspRound(state: DataFrame, edges: DataFrame): DataFrame = {
    // Explicit aliases: state is often derived from edges (seedState), and
    // an unaliased frontier⋈edges would be an ambiguous self-join.
    val frontier = state
      .filter(col("updated") && col("dist") =!= INF)
      .select(col("id"), col("dist"))
      .alias("f")
    val cand = frontier
      .join(edges.alias("e"), col("f.id") === col("e.src"))
      .select(col("e.dst").as("id"), (col("f.dist") + col("e.w")).as("cand"))
    val best = cand.groupBy("id").agg(min(col("cand")).as("best"))
    // One left-outer merge join per round. `state` is seeded with EVERY
    // vertex (src ∪ dst — see seedState), so no node is ever discovered
    // mid-iteration and no full-outer/anti machinery is needed; `best`
    // (bounded by the active frontier's out-neighborhood) is the build
    // side, AQE converts the join to broadcast at runtime, and the state
    // table never moves. Extra state columns (is_src) pass through.
    val dropped = Set("dist", "updated", "reached")
    val passthrough = state.columns.filterNot(dropped).map(col)
    val reached =
      if (state.columns.contains("reached"))
        Seq((col("reached") || col("best").isNotNull).as("reached"))
      else Nil
    state
      .join(best, Seq("id"), "left_outer")
      .select(
        passthrough ++ reached ++ Seq(
          least(col("dist"), coalesce(col("best"), lit(INF))).as("dist"),
          (coalesce(col("best"), lit(INF)) < col("dist")).as("updated")): _*)
  }

  /** Seed state for [[sssp]]: EVERY vertex (src ∪ dst), source at 0.0,
    * everyone flagged updated (SURVEY.md Q5; `SingleSourceSP.java:114-123`),
    * plus an `is_src` marker. The reference only materializes nodes with
    * out-edges and lets relaxation messages create sink rows on the fly
    * (Q4); seeding the full vertex set instead keeps every round's merge
    * a single broadcastable left-outer join, and [[membershipFilter]]
    * restores the reference's output-set semantics at the end.
    */
  def seedState(edges: DataFrame, source: Long): DataFrame =
    edges
      .select(col("src").as("id"), lit(true).as("is_src"))
      .unionAll(edges.select(col("dst").as("id"), lit(false).as("is_src")))
      .groupBy("id")
      .agg(max(col("is_src")).as("is_src"))
      .withColumn("reached", lit(false))
      .withColumn("dist", when(col("id") === source, 0.0).otherwise(INF))
      .withColumn("updated", lit(true))

  /** Reference output membership (Q4): nodes with out-edges ∪ nodes that
    * ever received a relaxation message. A pure sink never relaxed does
    * not appear — and neither does an edgeless source (its dist 0 row is
    * a seeding artifact here; the reference's format job never creates
    * it, `SingleSourceSP.java:101`).
    */
  def membershipFilter(state: DataFrame): DataFrame =
    state.filter(col("is_src") || col("reached")).drop("is_src", "reached")

  /** Full iterative single-source shortest path.
    *
    * Reference: the driver loop at `SingleSourceSP.java:439-519` submits
    * one full MR job per round, round-tripping the entire node state
    * through HDFS (`:513-517`) and reading a Hadoop counter for
    * convergence (`:473-479`). Here the loop lives in the driver over
    * cached DataFrames; `localCheckpoint` truncates lineage each round
    * (otherwise plan analysis blows up ~20 rounds in, SURVEY.md §4.3);
    * convergence is `count()` on the checkpointed state — deterministic,
    * unlike accumulators in transformations, and it doubles as the
    * materialization action.
    *
    * `maxRounds` bounds the loop at |V|−1 (Bellman-Ford guarantee for
    * non-negative weights) as a safety net against pathological input.
    *
    * Output = nodes with out-edges ∪ nodes ever reached; unreachable
    * nodes with out-edges keep dist 65535.0 (SURVEY.md Q1/Q4).
    */
  def sssp(
      edges: DataFrame,
      source: Long,
      maxRounds: Int = Int.MaxValue,
      relaxPerRound: Int = 2): DataFrame = {
    // One shuffle up front; every round's frontier⋈edges reuses it.
    val e = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    // `relaxPerRound`=2 Bellman-Ford relaxations per materialization:
    // driver-loop latency (job scheduling, plan analysis, checkpoint,
    // counter read) dominates per-round cost on all but the densest
    // frontiers, so batching relaxations between checkpoints nearly
    // halves wall-clock. Not more than 2: each un-checkpointed sub-round
    // references the state twice (frontier + merge), so evaluation cost
    // doubles per extra sub-round. Convergence stays exact — a
    // sub-round's updates are relaxed by the next sub-round inside the
    // same plan, and the final sub-round's `updated` flags are the loop
    // condition.
    val state =
      iterateUntilConverged(seedState(e, source), maxRounds.toLong, relaxPerRound)(
        ssspRound(_, e))
    e.unpersist()
    membershipFilter(state)
  }

  /** Final-result projection (the reference's `JobSeq=Last` pass,
    * `SingleSourceSP.java:285-288,484-508`): `(source, id, dist)`,
    * adjacency and flag dropped.
    */
  def finalResult(state: DataFrame, source: Long): DataFrame =
    state.select(lit(source).as("source"), col("id"), col("dist"))

  /** Shared driver-loop skeleton for iterate-until-converged algorithms.
    *
    * Runs `batch` step applications per materialization; each round does
    * ONE action (a count of still-`updated` rows) which both materializes
    * the lazy local checkpoint and reads the convergence counter (A4).
    * Frees earlier rounds' checkpoint blocks; bounds the loop at
    * min(maxRounds, seedCount−1); disables AQE partition coalescing for
    * the loop's duration (coalesced output partitioning can't be reused
    * by the next round's joins, forcing a state re-exchange per round)
    * and restores the caller's setting on exit.
    *
    * The `updated` boolean column is the convergence contract: the loop
    * stops when no row has it set.
    */
  private def iterateUntilConverged(
      seed: DataFrame,
      maxRounds: Long,
      batch: Int)(step: DataFrame => DataFrame): DataFrame = {
    val session = seed.sparkSession
    val sc = session.sparkContext
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = session.conf.get(coalesceKey, "true")
    session.conf.set(coalesceKey, "false")
    try {
      val baselineIds = sc.getPersistentRDDs.keySet.toSet
      var state = seed.localCheckpoint(false)
      val bound = math.min(maxRounds, math.max(1L, state.count() - 1L))
      var rounds = 0L
      var changed = 1L
      while (changed > 0 && rounds < bound) {
        val preRoundIds = sc.getPersistentRDDs.keySet.toSet
        var next = state
        var i = 0
        while (i < batch && rounds + i < bound) { next = step(next); i += 1 }
        state = next.localCheckpoint(false)
        changed = state.filter(col("updated")).count()
        rounds += i
        // free earlier rounds' checkpointed blocks (the reference leaves
        // every iteration's full state on HDFS, SingleSourceSP.java:513-517;
        // keeping every round's checkpoint in executor memory would be
        // the same leak)
        val persisted = sc.getPersistentRDDs
        val freshIds = persisted.keySet.toSet -- preRoundIds
        (persisted.keySet.toSet -- baselineIds -- freshIds)
          .foreach(id => persisted.get(id).foreach(_.unpersist(false)))
      }
      state
    } finally session.conf.set(coalesceKey, prevCoalesce)
  }

  /** One min-label propagation round for [[connectedComponents]]. */
  def ccRound(state: DataFrame, undirected: DataFrame): DataFrame = {
    val frontier = state.filter(col("updated")).select(col("id"), col("lab")).alias("f")
    val best = frontier
      .join(undirected.alias("e"), col("f.id") === col("e.src"))
      .select(col("e.dst").as("id"), col("f.lab").as("cand"))
      .groupBy("id")
      .agg(min(col("cand")).as("best"))
    state
      .join(best, Seq("id"), "left_outer")
      .select(
        col("id"),
        least(col("lab"), coalesce(col("best"), col("lab"))).as("lab"),
        (coalesce(col("best"), col("lab")) < col("lab")).as("updated"))
  }

  /** Connected components over the UNDIRECTED closure of the edge list:
    * iterative min-label propagation on the shared loop skeleton;
    * converges in O(diameter) rounds. Labels are node ids; each node
    * ends with the minimum id in its component.
    *
    * Not in the reference (its two programs are SSSP and transpose), but
    * the natural second consumer of the iterate-until-converged machinery.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = Int.MaxValue): DataFrame = {
    val und = edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seed = und
      .select(col("src").as("id"))
      .distinct()
      .withColumn("lab", col("id"))
      .withColumn("updated", lit(true))
    val state =
      iterateUntilConverged(seed, maxRounds.toLong, batch = 2)(ccRound(_, und))
    und.unpersist()
    state.select(col("id"), col("lab").as("component"))
  }

  /** Fixed-point (integer-scaled) PageRank, `iters` rounds, damping 0.85.
    *
    * Ranks are BIGINT micro-units (scale 10^12) and every operation is
    * integer arithmetic — deliberately: floating-point PageRank sums in a
    * different order on every engine (and every run), so it can never
    * hash-match a SQL oracle; integer sums are associative, making the
    * result bit-identical and order-independent on ANY engine. The cost
    * is ≤ outdeg units of truncation per node per round — far below any
    * ranking-relevant difference.
    *
    * Dangling-node mass is dropped (classic simplification); ranks are
    * seeded uniformly over the SOURCE set (nodes with out-edges).
    */
  def pagerankFixed(edges: DataFrame, iters: Int): DataFrame = {
    val scale = 1000000000000L // 10^12
    val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val n = outdeg.count()
    val base = 15L * (scale / n) / 100L
    var rank = outdeg.select(col("id"), col("deg"), lit(scale / n).as("pr")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val contrib = rank
        .join(e, rank("id") === e("src"))
        .select(e("dst").as("id"), expr("pr div deg").as("c")) // integer div: exact on any engine
      val summed = contrib.groupBy("id").agg(sum(col("c")).as("s"))
      rank = rank
        .join(summed, Seq("id"), "left_outer")
        .select(
          col("id"),
          col("deg"),
          expr(s"CAST($base + (85 * coalesce(s, 0L)) div 100 AS BIGINT)").as("pr"))
        .localCheckpoint(true)
    }
    e.unpersist()
    rank.select(col("id"), col("pr"))
  }

  /** Global triangle count over the undirected simple graph (dedup'd,
    * self-loops dropped). Ordered-triple join (a<b<c): each edge stored
    * once with a<b, triangles counted exactly once — the join-based
    * formulation whose shuffles are all on single node-id keys (AQE
    * handles the skewed high-degree centers). Returns one row:
    * (n_und_edges, n_triangles).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tri = und.alias("e1")
      .join(und.alias("e2"), col("e1.b") === col("e2.a"))
      .join(und.alias("e3"), col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    und.agg(count(lit(1)).as("n_und_edges")).crossJoin(tri)
  }

  /** Parse whitespace-delimited edge lines `"id from to w"` into the edge
    * schema, dropping the edge-id column and non-digit-initial header
    * lines.
    *
    * Reference: P1 projection `SingleSourceSP.java:56-71` + the comment
    * filter `ReverseGraph.java:118`. The reference's only input format is
    * text lines; in the rebuild this is one declarative select whose
    * `split`/`cast` stay inside whole-stage codegen.
    */
  def parseEdgeLines(lines: DataFrame, col0: Column): DataFrame = {
    val toks = split(trim(col0), "\\s+")
    lines
      .filter(col0.rlike("^[0-9]"))
      .select(
        toks.getItem(1).cast("long").as("src"),
        toks.getItem(2).cast("long").as("dst"),
        toks.getItem(3).cast("double").as("w"))
  }
}
