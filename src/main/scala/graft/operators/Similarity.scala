package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     O(|Q|·|C|); fine when the query set is small (broadcast the
  *     queries, stream the corpus — one narrow pass, no shuffle except
  *     the final per-query top-k).
  *   - [[lshTopK]]: random-hyperplane LSH — the scale path. Bucketing is a
  *     single map over the corpus; the candidate join shuffles on the
  *     bucket id only, so cost is per-bucket quadratic instead of global.
  *
  * Hyperplanes are deterministic literals (Parity.planeLit) so the DuckDB
  * oracle embeds bit-identical planes.
  */
object Similarity {

  val Dim = 64

  /** Multi-table LSH layout: [[NTables]] independent hash tables, each
    * bucketing on [[PlanesPerTable]] sign-of-projection bits from its own
    * disjoint slice of the shared hyperplane sequence. One table of b
    * bits has collision probability (1 − θ/π)^b for angle θ — at b=6 a
    * true neighbor lands in the query's bucket so rarely that measured
    * recall@3 was 6%. L tables recover recall 1 − (1 − p^b)^L while the
    * candidate join stays bucket-keyed (the scale shape): more tables ⇒
    * more candidates, never all-pairs.
    */
  val NTables = 6
  val PlanesPerTable = 4

  private def asDouble(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** Exact cosine top-k per query vector. Queries = `vec_id < nQueries`
    * (a deterministic subset so the oracle can reproduce it). Ranking is
    * dense by (cosine desc, vec_id asc) — fully deterministic.
    */
  def bruteForceTopK(embs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val d = asDouble(embs)
    val q = d.filter(col("vec_id") < nQueries).alias("q")
    val c = d.alias("c")
    val scored = q
      .join(c, col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        round(Parity.cosine(col("q.e"), col("c.e")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[bruteForceTopK]] with the ranking done by a typed bounded-heap
    * [[graft.functions.TopKAggregator]] instead of a window sort:
    * identical output, but only k rows per query cross the shuffle
    * (map-side partial top-k) — the form that survives a 100 TB corpus.
    */
  def bruteForceTopKAgg(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      nQueries: Int,
      k: Int): DataFrame = {
    import spark.implicits._
    val d = asDouble(embs)
    val q = d.filter(col("vec_id") < nQueries).alias("q")
    val c = d.alias("c")
    val scored = q
      .join(c, col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        round(Parity.cosine(col("q.e"), col("c.e")), 6).as("cos"))
      .as[(Long, Long, Double)]
    val topk = new graft.functions.TopKAggregator(k)
    scored
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topk.toColumn)
      .flatMap { case (qId, hits) =>
        hits.zipWithIndex.map { case ((nId, cos), i) => (qId, nId, cos, i + 1) }
      }
      .toDF("q_id", "n_id", "cos", "rank")
  }

  /** Per-label centroid of the embedding space, one row per (label, dim).
    * posexplode keeps the dim index; the aggregation is a plain hash avg
    * (map-side partial). Output rounded — a distributed double sum is
    * order-nondeterministic at the last ulp by nature; 6-decimal rounding
    * is ~10^7 ulps wide at these magnitudes.
    */
  def labelCentroids(embs: DataFrame): DataFrame =
    asDoubleWithLabel(embs)
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(round(avg(col("v")), 6).as("centroid"), count(lit(1)).as("n"))

  private def asDoubleWithLabel(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))

  /** EMBEDDING-DRIFT monitor between two corpus snapshots: per label,
    * the per-dim centroid of the BASELINE slice (even vec_id — the
    * harness stand-in for "last ingest window") vs the CURRENT slice
    * (odd vec_id), reduced to the two numbers a drift dashboard plots:
    * the L2 shift between the centroids and their cosine. A retrain
    * trigger reads this table — embedding drift is the vector-side
    * analog of the text-side [[TextOps]] KL source drift.
    *
    * Determinism: per-dim centroids are 6-decimal-rounded BEFORE the
    * distance/cosine fold (the [[labelCentroids]] cross-engine
    * identity), so the final metrics are computed from identical
    * inputs in both engines.
    *
    * Scale shape: one narrow explode + two hash aggregates — (label,
    * dim, slice) then (label) — both map-side partial; no join, no
    * window, nothing quadratic. At 100 TB the snapshot flag comes off
    * a partition column instead of the id parity and the plan is
    * unchanged.
    */
  def labelDrift(embs: DataFrame): DataFrame = {
    val per = asDoubleWithLabel(embs)
      .select(
        col("label"),
        (col("vec_id") % 2 === 0).as("base"),
        posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"), col("base"))
      .agg(round(avg(col("v")), 6).as("c"), count(lit(1)).as("n"))
    val ab = per
      .groupBy(col("label"), col("pos"))
      .agg(
        max(when(col("base"), col("c"))).as("ca"),
        max(when(!col("base"), col("c"))).as("cb"),
        max(when(col("base"), col("n"))).as("na"),
        max(when(!col("base"), col("n"))).as("nb"))
    ab.groupBy(col("label"))
      .agg(
        max(col("na")).as("n_base"),
        max(col("nb")).as("n_curr"),
        round(sqrt(sum(pow(col("ca") - col("cb"), 2))), 6).as("l2_shift"),
        round(
          sum(col("ca") * col("cb")) /
            (sqrt(sum(col("ca") * col("ca"))) * sqrt(sum(col("cb") * col("cb")))),
          6).as("cos_sim"))
  }

  /** Corpus bucketing, one row per (vector, table): sign-of-projection
    * bucket of [[PlanesPerTable]] bits per hash table. A narrow map — at
    * 100 TB this is the only pass over the corpus the index build needs.
    */
  def buckets(embs: DataFrame): DataFrame =
    asDouble(embs).select(
      col("vec_id"),
      col("e"),
      posexplode(array((0 until NTables).map(t =>
        Parity.rpBucket(col("e"), PlanesPerTable, Dim, t * PlanesPerTable)): _*))
        .as(Seq("tbl", "bucket")))

  /** Coarse-quantizer cells for [[ivfTopK]]: the per-label centroids
    * ([[labelCentroids]], 6-decimal rounded for cross-engine identity)
    * re-assembled into vectors. In a production IVF the quantizer comes
    * from k-means over a sample; here the label structure plays the role
    * of that training product — the INDEX mechanics (assign, invert,
    * probe) are what this operator exercises.
    */
  def centroidVectors(embs: DataFrame): DataFrame =
    labelCentroids(embs)
      .groupBy(col("label").as("cid"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("dim"), col("centroid")))),
          s => s("centroid")).as("c"))

  /** IVF (inverted-file) ANN: every corpus vector is assigned to its
    * nearest coarse cell (one narrow pass + a broadcast of the tiny
    * centroid table); each query probes its `nProbe` nearest cells and
    * re-ranks exactly ONLY within those inverted lists. The candidate
    * join is keyed on the cell id — the second classic scale shape next
    * to [[lshTopK]]'s hash tables: cost per query is the probed lists,
    * never the corpus.
    */
  def ivfTopK(embs: DataFrame, nQueries: Int, k: Int, nProbe: Int = 2): DataFrame = {
    val d = asDouble(embs)
    val cellScores = d
      .crossJoin(broadcast(centroidVectors(embs)))
      .select(
        col("vec_id"),
        col("cid"),
        col("e"),
        round(Parity.cosine(col("e"), col("c")), 6).as("ccos"))
    rankAndProbe(cellScores, nQueries, k, nProbe)
  }

  /** Shared IVF probe machinery: rank cells per vector, invert (rn = 1),
    * probe (rn ≤ nProbe), exact cosine re-rank within the probed lists.
    * Input must carry (vec_id, cid, e, ccos).
    */
  private def rankAndProbe(
      cellScores: DataFrame,
      nQueries: Int,
      k: Int,
      nProbe: Int,
      candPred: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    // materialized: both the inverted lists (rn = 1) and the query probes
    // (rn <= nProbe) consume this — without it the corpus×centroid
    // scoring pass runs twice
    val rankedCells = Phys.materialized(cellScores.withColumn("rn", row_number().over(wCell)))
    val assigned = rankedCells
      .filter(col("rn") === 1)
      .filter(candPred)
      .select(col("vec_id").as("n_id"), col("cid"), col("e").as("ne"))
    val probes = rankedCells
      .filter(col("vec_id") < nQueries && col("rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("cid"), col("e").as("qe"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    probes
      .join(assigned, Seq("cid"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), round(Parity.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ---- trained coarse quantizer: integer fixed-point Lloyd k-means ---------

  /** Micro-unit scale for the fixed-point k-means. Embedding components
    * are in (−1, 1), so scaled values fit 20 bits; a 64-dim dot product
    * of two scaled vectors is ≤ 64·10¹² < 2⁵³ — every product and every
    * partial sum is EXACTLY representable as a double, which is what
    * makes the whole training bit-identical on any engine (same reason
    * pagerankFixed uses integer micro-units).
    */
  val KmeansScale = 1000000L

  val KmeansCells = 8
  val KmeansIters = 2

  /** (vec_id, e: double[], ei: micro-unit long[]) — `round` (half away
    * from zero on both engines) then exact integer cast.
    */
  private def intEmb(embs: DataFrame): DataFrame =
    embs.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("e"),
      graft.functions.MicroInts(col("embedding").cast("array<double>"), KmeansScale).as("ei"))

  /** Cell-assignment score: dot(ei, c) / |c| over the INTEGER vectors.
    * The dot is exact (see [[KmeansScale]]), `/` and `sqrt` are
    * correctly-rounded IEEE on both engines — the score is bit-identical
    * cross-engine, so argmax assignment (ties by cid) is too. Dividing
    * by |c| (not |ei|·|c|) preserves the per-vector argmax ordering:
    * |ei| is constant across the candidate cells.
    */
  private def cellScore(ei: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
    graft.functions.DotLongs(ei, c) / sqrt(graft.functions.DotLongs(c, c))

  /** Lloyd k-means over the embeddings in integer micro-units — the IVF
    * quantizer TRAINING step ([[centroidVectors]]' label shortcut stands
    * in for this when labels exist). Deterministic init (the vectors
    * with `vec_id < kCells`); per-iteration: broadcast the tiny
    * centroid table, assign each vector to its max-cosine cell (one
    * narrow pass over the corpus), recompute centroids as per-dimension
    * INTEGER means (`sum div count` — truncating division, identical in
    * Spark `div` and DuckDB `//`). Everything the oracle must reproduce
    * is integer or correctly-rounded IEEE, so the trained centroids are
    * bit-identical cross-engine — no float-summation-order divergence.
    *
    * Scale shape: classic distributed Lloyd — assignment is a broadcast
    * map, the update is one explode + hash aggregate (map-side partial)
    * per iteration; nothing ever shuffles the corpus on a non-key.
    */
  /** The Lloyd centroid table under the [[ModelCache]] train-once
    * discipline: with a corpus identity the k-cell quantizer trains once
    * ever and every consumer (SemDeDup blocking, the kNN graph, the
    * silhouette/health reads) serves the stored table; key-less callers
    * keep the inline training (spec fixtures, the oracle-replay demos).
    * Sound because [[kmeansFixed]] is deterministic (integer micro-unit
    * Lloyd, argmax ties to the lower cid).
    */
  def kmeansCached(embs: DataFrame, kCells: Int, corpusKey: String): DataFrame =
    if (corpusKey.isEmpty) kmeansFixed(embs, kCells)
    else
      embs.sparkSession.read.parquet(
        ModelCache.dir(s"kmeans-centroids|$corpusKey|k=$kCells,iters=$KmeansIters")(
          kmeansFixed(embs, kCells)))

  def kmeansFixed(
      embs: DataFrame,
      kCells: Int = KmeansCells,
      iters: Int = KmeansIters): DataFrame = {
    val d = Phys.materialized(intEmb(embs).select(col("vec_id"), col("ei")))
    var cent = d.filter(col("vec_id") < kCells).select(col("vec_id").as("cid"), col("ei").as("c"))
    (1 to iters).foreach { _ =>
      // hash-agg argmax (see [[argmaxCell]]): same selection as the
      // former row_number window, with map-side partial aggregation
      val assigned = d
        .crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cid"), col("ei"), cellScore(col("ei"), col("c")).as("score"))
        .groupBy(col("vec_id"))
        .agg(
          max(struct(col("score"), (-col("cid")).as("ncid"))).as("sel"),
          first(col("ei")).as("ei"))
        .select(col("vec_id"), (-col("sel.ncid")).as("cid"), col("ei"))
      cent = assigned
        .select(col("cid"), posexplode(col("ei")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(expr("sum(v) div count(1)").as("cv"))
        .groupBy(col("cid"))
        .agg(
          transform(array_sort(collect_list(struct(col("pos"), col("cv")))), s => s("cv")).as("c"))
    }
    cent
  }

  /** IVF over the TRAINED quantizer: [[kmeansFixed]] centroids as the
    * coarse cells, integer assignment scores, exact cosine re-rank
    * within the probed inverted lists — the full production IVF path
    * (train → assign → invert → probe) with every stage cross-engine
    * deterministic.
    */
  def ivfTrainedTopK(embs: DataFrame, nQueries: Int, k: Int, nProbe: Int): DataFrame =
    ivfWithCentroids(embs, kmeansFixed(embs), nQueries, k, nProbe)

  /** The probe path over an ALREADY-TRAINED quantizer — lets a caller
    * train once and evaluate several probe widths ([[ivfRecall]])
    * without re-running Lloyd per width.
    */
  def ivfWithCentroids(
      embs: DataFrame,
      cents: DataFrame,
      nQueries: Int,
      k: Int,
      nProbe: Int): DataFrame = {
    // materialized BEFORE the centroid cross: projection collapse
    // otherwise inlines the MicroInts quantization under the post-join
    // project, re-rounding every component once per (vector, cell) row —
    // k× the work of the one narrow pass the plan reads as (measured 3×+
    // on invertedLists at 64 cells; guide §4.4's duplicated-expression
    // trap). Same discipline as the PQ paths' materialized `dsub`.
    val cellScores = Phys.materialized(intEmb(embs))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), col("e"), cellScore(col("ei"), col("c")).as("ccos"))
    rankAndProbe(cellScores, nQueries, k, nProbe)
  }

  /** Train once, persist the quantizer: the [[kmeansFixed]] centroid
    * table written as a parquet artifact — (cid, c: array of micro-unit
    * longs), k rows. The centroid table IS the IVF coarse quantizer;
    * storing it decouples the Lloyd training cost from every future
    * probe/index job.
    */
  def writeIvfModel(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      corpusKey: String = ""): String =
    // a corpus identity upgrades the artifact to the ModelCache
    // train-once/serve-many discipline: the Lloyd rounds run once per
    // corpus across ALL queries and processes, not once per query; the
    // key-less form keeps the per-query Staging demo for specs
    if (corpusKey.nonEmpty)
      ModelCache.dir(s"ivf-centroids|$corpusKey|k=$KmeansCells,iters=$KmeansIters")(
        kmeansFixed(embs))
    else {
      val dir = graft.sources.Staging.freshDir("ivf-model")
      kmeansFixed(embs).coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }

  /** The IVF inverted lists of a corpus under a given centroid table:
    * (cid, n_id, ne) — each vector in its argmax cell, selected by the
    * same hash-agg `max(struct(score, -cid))` shape as the trained path
    * (map-side partial, no window). This is the INDEX half of the online
    * ANN story: built once over the static corpus, then probed by every
    * arriving query batch.
    */
  def invertedLists(embs: DataFrame, cents: DataFrame): DataFrame =
    // materialized intEmb — see ivfWithCentroids (64-cell cross would
    // otherwise re-round every component 64×)
    Phys.materialized(intEmb(embs))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), col("e"), cellScore(col("ei"), col("c")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("sel"),
        first(col("e")).as("e"))
      .select(col("vec_id").as("n_id"), (-col("sel.ncid")).as("cid"), col("e").as("ne"))

  /** Top-`nProbe` probe cells of one embedding as a PURE EXPRESSION over
    * a driver-collected centroid table (scalar-sized, like a folded
    * merge table): array of (neg_score, cid) structs, ascending — i.e.
    * best cell first, ties to the lower cid, exactly the trained path's
    * `ORDER BY ccos DESC, cid`. Stateless and narrow, which is what lets
    * a STREAMING query assign arriving vectors to cells without any
    * aggregation state.
    */
  def probeCellsExpr(
      emb: org.apache.spark.sql.Column,
      cents: Seq[(Long, Seq[Long])],
      nProbe: Int): org.apache.spark.sql.Column = {
    val ei = graft.functions.MicroInts(emb.cast("array<double>"), KmeansScale)
    val scored = cents.map { case (cid, c) =>
      struct((-cellScore(ei, typedLit(c))).as("ns"), lit(cid).as("cid"))
    }
    slice(array_sort(array(scored: _*)), 1, nProbe)
  }

  /** The production probe path over a STORED quantizer: read the
    * centroid artifact (k tiny rows — broadcast, never shuffled), assign
    * + probe exactly as [[ivfWithCentroids]]. The plan contains the
    * artifact scan and the corpus scan and nothing else — no Lloyd
    * iteration, no assignment feedback loop; this is what every
    * incremental batch of a 100 TB pipeline runs after training happens
    * once.
    */
  def ivfStoredTopK(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      modelDir: String,
      nQueries: Int,
      k: Int,
      nProbe: Int): DataFrame =
    ivfWithCentroids(embs, spark.read.parquet(modelDir), nQueries, k, nProbe)

  /** EXTERNAL-query ANN over the stored quantizer — the vector
    * counterpart of the external BM25 search: the query embedding
    * arrives as a runtime parameter (not a corpus row), its probe
    * cells are selected DRIVER-side over the k-row centroid artifact
    * (the bounded-artifact discipline — the same exact long-dot /
    * IEEE-sqrt score as [[cellScore]], ties to the lower cid), and
    * the plan that touches data is: inverted-list scan FILTERED to
    * the probe cells → one narrow cosine map against the literal
    * query → TakeOrdered k. At 100 TB the lists are a table
    * partitioned by cid, so the cell filter prunes the scan to
    * nProbe/cells of the corpus — this is the per-query serving cost
    * of vector search over an indexed corpus.
    *
    * Output: `(n_id, cos)`, the k best matches (ties to the lower
    * id). Exact within the probed cells; recall vs brute force is the
    * indexed trade measured by `ann_ivf_recall`.
    */
  def ivfQueryStored(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      modelDir: String,
      query: Seq[Double],
      k: Int,
      nProbe: Int): DataFrame = {
    require(query.length == Dim, s"query must have dim $Dim, got ${query.length}")
    val qi = query.map(v => math.round(v * KmeansScale))
    val cents = spark.read
      .parquet(modelDir)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    // probe-cell argmax over ≤ KmeansCells rows: exact integer dots,
    // the same IEEE division/sqrt as cellScore, ties to the lower cid
    val probeCids = cents
      .map { case (cid, c) =>
        val d = c.zip(qi).map { case (x, y) => x * y }.sum
        val cc = c.map(x => x * x).sum
        (-(d.toDouble / math.sqrt(cc.toDouble)), cid)
      }
      .sorted
      .take(nProbe)
      .map(_._2)
    invertedLists(embs, spark.read.parquet(modelDir))
      .filter(col("cid").isin(probeCids: _*))
      .select(
        col("n_id"),
        round(Parity.cosine(typedLit(query), col("ne")), 6).as("cos"))
      .orderBy(col("cos").desc, col("n_id"))
      .limit(k)
  }

  /** IVF INDEX HEALTH REPORT over a stored quantizer — the ops-side
    * companion of the upsert/compaction family: per cell, its vector
    * count, occupancy share in exact ppm, and the mean/min assignment
    * score in micro-units (each vector's score rounded to integer
    * micros BEFORE the per-cell sum, so the aggregate is order-free).
    * The two production alarms this feeds: OCCUPANCY SKEW (a hot cell
    * degrades probe latency and recall — time to re-train or split)
    * and LOW MEAN SCORE (a cell whose members sit far from their
    * centroid — the quantizer no longer fits the drifted corpus;
    * [[graft.operators.Multimodal]]'s drift monitor says the same
    * thing from the label side). Empty cells surface as n_vecs = 0
    * with NULL scores — dead centroids, the classic Lloyd pathology.
    *
    * Scale shape: one broadcast of the k-row centroid artifact, one
    * narrow assignment pass over the corpus (hash-agg argmax, no
    * window), one ≤ k-row aggregate. The 1-row total broadcasts back.
    */
  def ivfHealth(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      modelDir: String): DataFrame = {
    val cents = spark.read.parquet(modelDir)
    val asg = Phys.materialized(intEmb(embs))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), cellScore(col("ei"), col("c")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("sel"))
      .select(
        col("vec_id"),
        (-col("sel.ncid")).as("cid"),
        expr("CAST(round(sel.ccos * 1000000) AS BIGINT)").as("sm"))
    val tot = asg.agg(count(lit(1)).as("n_total"))
    val perCell = asg
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("sm")).as("ssum"),
        min(col("sm")).as("min_score_micro"))
    cents
      .select(col("cid"))
      .join(perCell, Seq("cid"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(
        col("cid"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        expr("coalesce(n_vecs, 0) * 1000000 div n_total").as("occ_ppm"),
        when(col("n_vecs").isNull, lit(null).cast("long"))
          .otherwise(expr("ssum div n_vecs"))
          .as("mean_score_micro"),
        col("min_score_micro"))
  }

  /** Simplified (centroid-based) silhouette per cluster over the stored
    * quantizer — the clustering-QUALITY readout beside [[ivfHealth]]'s
    * occupancy: for each vector, `a = 1 − cos(v, own centroid)`,
    * `b = 1 − cos(v, nearest OTHER centroid)`, silhouette
    * `(b − a)/max(a, b)` (≈1 tight and separated, ≈0 on a boundary,
    * < 0 likely mis-assigned), micro-rounded per vector and averaged
    * per cluster as an integer mean. Centroid-based (not pairwise) on
    * purpose: the classic silhouette's |V|² distances are exactly what
    * can't run at 100 TB — against k centroids the cost is the same
    * broadcast pass the assignment already does. Ranking by
    * [[cellScore]] and by full cosine agree (|v| is constant within a
    * vector's candidates), so "own" is the IVF assignment cell.
    *
    * Scale shape: one broadcast of the k-row artifact, one narrow
    * scoring pass, TWO hash-agg argmax reductions (own, then best
    * other — no window), one ≤ k-row aggregate.
    *
    * Output: `(cid, n_vecs, mean_sil_micro)` per non-empty cell.
    */
  def silhouette(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      modelDir: String): DataFrame = {
    val cents = spark.read.parquet(modelDir)
    val scored = Phys.materialized(
      Phys.materialized(intEmb(embs))
        .crossJoin(broadcast(cents))
        .select(
          col("vec_id"),
          col("cid"),
          (graft.functions.DotLongs(col("ei"), col("c")) /
            (sqrt(graft.functions.DotLongs(col("ei"), col("ei"))) *
              sqrt(graft.functions.DotLongs(col("c"), col("c"))))).as("cos")))
    val own = scored
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("s1"))
      .select(col("vec_id"), (-col("s1.ncid")).as("own_cid"), col("s1.cos").as("cos1"))
    val other = scored
      .join(own, Seq("vec_id"))
      .filter(col("cid") =!= col("own_cid"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("s2"))
      .select(col("vec_id"), col("s2.cos").as("cos2"))
    own
      .join(other, Seq("vec_id"))
      .select(
        col("own_cid").as("cid"),
        when(lit(1.0d) - col("cos2") === 0.0d, lit(0L))
          .otherwise(
            round((col("cos1") - col("cos2")) / (lit(1.0d) - col("cos2")) * 1000000.0d)
              .cast("long"))
          .as("sil_micro"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), expr("sum(sil_micro) div count(1)").as("mean_sil_micro"))
  }

  /** Multi-table LSH ANN: candidates share the query's bucket in ANY of
    * the [[NTables]] tables; exact cosine re-rank over the deduplicated
    * candidate set. The join is keyed on (table, bucket) only — per-bucket
    * quadratic, never all-pairs. Recall < 1 by construction (floored by a
    * measured recall@k test) — the verify contract is determinism, not
    * equality with brute force.
    */
  /** Measured recall@k of [[lshTopK]] against [[bruteForceTopK]], per
    * query: |LSH top-k ∩ exact top-k| / k. The number that makes the
    * approximate path trustworthy — a pipeline tunes NTables /
    * PlanesPerTable against THIS table, not against hope. Queries with
    * zero LSH hits still appear (n_hits = 0).
    */
  def lshRecall(embs: DataFrame, nQueries: Int, k: Int): DataFrame =
    recallVsExact(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id")),
      lshTopK(embs, nQueries, k),
      k)

  /** Per-query recall@k of any approximate top-k against the exact one:
    * |approx ∩ exact| / k. Shared by [[lshRecall]] and [[ivfRecall]].
    * Queries with zero approximate hits still appear (n_hits = 0).
    */
  private def recallVsExact(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    exact
      .join(
        approx.select(col("q_id").as("a_qid"), col("n_id").as("a_nid")),
        col("q_id") === col("a_qid") && col("n_id") === col("a_nid"),
        "left_outer")
      .groupBy(col("q_id"))
      .agg(count(col("a_nid")).as("n_hits"))
      .select(
        col("q_id"),
        col("n_hits"),
        round(col("n_hits").cast("double") / k.toDouble, 6).as("recall"))

  /** Measured recall@k of the TRAINED IVF path ([[ivfTrainedTopK]]) at
    * each probe width in `nProbes` — the number that turns nProbe from a
    * guess into a measured cost/recall trade (probing p of
    * [[KmeansCells]] cells scans ~p/cells of the corpus per query). The
    * exact baseline is computed once and reused across probe widths;
    * each IVF run retrains the same deterministic k-means (bit-identical
    * by construction), so correctness doesn't depend on the reuse.
    */
  def ivfRecall(embs: DataFrame, nQueries: Int, k: Int, nProbes: Seq[Int]): DataFrame = {
    val exact = Phys.materialized(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id")))
    // train ONCE, probe per width — k-means is deterministic, so this is
    // result-identical to retraining per width, minus the repeated Lloyd
    // iterations (the dominant cost of the retrain)
    val cents = Phys.materialized(kmeansFixed(embs))
    nProbes
      .map(p =>
        recallVsExact(exact, ivfWithCentroids(embs, cents, nQueries, k, nProbe = p), k)
          .select(lit(p).cast("int").as("n_probe"), col("q_id"), col("n_hits"), col("recall")))
      .reduce(_ unionAll _)
  }

  /** Measured recall@k of the trained IVF at a fixed probe width, for
    * each k in `ks` — the companion curve to [[ivfRecall]]'s probe
    * sweep: nProbe fixes the scan cost, and this table shows what that
    * cost buys at each result-set size (recall@1 is usually the
    * sensitive point). The quantizer trains ONCE; the exact baseline
    * and the probe ranking are cut at each k. Readout is aggregate
    * (one row per k), recall in exact ppm from integer hit counts.
    */
  def ivfRecallAtK(
      embs: DataFrame,
      nQueries: Int,
      ks: Seq[Int] = Seq(1, 3, 5),
      nProbe: Int = 2): DataFrame = {
    val cents = Phys.materialized(kmeansFixed(embs))
    ks.map { k =>
        val exact = bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id"))
        recallVsExact(exact, ivfWithCentroids(embs, cents, nQueries, k, nProbe), k)
          .agg(count(lit(1)).as("n_queries"), sum(col("n_hits")).as("n_hits"))
          .select(
            lit(k.toLong).as("k"),
            col("n_queries"),
            col("n_hits"),
            expr(s"n_hits * 1000000 div (n_queries * $k)").as("recall_ppm"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("k"))
  }

  /** Discount weights for [[ivfNdcg]]: `round(1e6·log 2 / log(i+1))`
    * for ranks 1..k — computed ONCE here and folded as literals into
    * both engines' plans (the [[graft.operators.Quality.dpThresholds]]
    * literal-table discipline), so the transcendental never crosses an
    * engine boundary.
    */
  def ndcgWeights(k: Int): Seq[(Int, Long)] =
    (1 to k).map(i => i -> math.round(1000000.0 * math.log(2.0) / math.log(i + 1.0)))

  /** The ideal DCG at k under [[ndcgWeights]] with graded gains
    * `k+1−rank` — a pure integer constant. */
  def ndcgIdeal(k: Int): Long =
    ndcgWeights(k).map { case (i, w) => (k + 1 - i).toLong * w }.sum

  /** Rank-weighted retrieval quality of the trained IVF: nDCG@k
    * (Järvelin & Kekäläinen 2002) against the brute-force ranking —
    * the metric that (unlike recall@k) penalizes the approximate index
    * for returning the right neighbors in the WRONG ORDER: each exact
    * neighbor carries graded gain `k+1−exact_rank`, each approximate
    * position a literal `1/log2(i+1)` micro-unit discount, and the
    * readout is `Σ DCG / (n_queries · IDCG)` in exact ppm.
    *
    * Scale shape: the exact baseline is the spec-verified brute pass
    * over the query sample; the IVF side reuses the trained quantizer
    * probe path; the metric itself is one (q,n)-keyed join + one
    * aggregate. Integer end-to-end (gains, literal discounts, ppm
    * division), so the number is bit-identical cross-engine.
    *
    * Output: one row `(k, n_probe, n_queries, ndcg_ppm)`.
    */
  def ivfNdcg(embs: DataFrame, nQueries: Int, k: Int = 10, nProbe: Int = 2): DataFrame = {
    val wLut = ndcgWeights(k)
    val idcg = ndcgIdeal(k)
    val wCase = "CASE " +
      wLut.map { case (i, w) => s"WHEN rank_a = $i THEN ${w}L" }.mkString(" ") + " ELSE 0L END"
    val exact = Phys.materialized(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id"), col("rank").as("rank_e")))
    val cents = Phys.materialized(kmeansFixed(embs))
    val approx = ivfWithCentroids(embs, cents, nQueries, k, nProbe)
      .select(col("q_id"), col("n_id"), col("rank").as("rank_a"))
    val nq = exact.agg(countDistinct(col("q_id")).as("n_queries"))
    approx
      .join(exact, Seq("q_id", "n_id"), "left_outer")
      .select(
        (coalesce(lit((k + 1).toLong) - col("rank_e"), lit(0L)) * expr(wCase)).as("term"))
      .agg(coalesce(sum(col("term")), lit(0L)).as("dcg_sum"))
      .crossJoin(broadcast(nq))
      .select(
        lit(k.toLong).as("k"),
        lit(nProbe.toLong).as("n_probe"),
        col("n_queries"),
        expr(s"1000000 * dcg_sum div (n_queries * ${idcg}L)").as("ndcg_ppm"))
  }

  // ---- random-projection dimensionality reduction --------------------------

  /** Reduced dimensionality and the slice of the shared deterministic
    * hyperplane sequence backing it. Offset 100 keeps the reduction
    * planes disjoint from the LSH tables' planes 0..23 — reusing those
    * would correlate the reduction error with the LSH bucketing error
    * exactly where the two are composed.
    */
  val RpDim = 16
  val RpPlaneOffset = 100

  /** Johnson–Lindenstrauss-style random projection: each vector mapped
    * to [[RpDim]] deterministic hyperplane projections (the REAL-valued
    * counterpart of the sign-only LSH bucket — LSH keeps 1 bit per
    * plane, this keeps the whole coordinate). One narrow map over the
    * corpus; at 100 TB the 4× dim cut is a 4× cut in every downstream
    * dot product, shuffle byte, and cache line, which is why reduction
    * runs FIRST in a production similarity pipeline. The JL guarantee
    * (angles are preserved in expectation with error ~1/√RpDim) is made
    * measurable by [[rpRecall]].
    */
  def rpReduce(embs: DataFrame): DataFrame =
    asDouble(embs).select(
      col("vec_id"),
      array((0 until RpDim).map(j =>
        Parity.dot(col("e"), Parity.planeLit(RpPlaneOffset + j, Dim))): _*).as("r"))

  /** Exact cosine top-k in the REDUCED space — [[bruteForceTopK]]'s
    * plan shape over [[rpReduce]] output. Same determinism contract
    * (round 6, ties by id).
    */
  def rpTopK(embs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val d = rpReduce(embs)
    val q = d.filter(col("vec_id") < nQueries).alias("q")
    val c = d.alias("c")
    val scored = q
      .join(c, col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        round(Parity.cosine(col("q.r"), col("c.r")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Measured recall@k of reduced-space ranking against the full-dim
    * exact top-k: what a 4× dimension cut actually costs on THIS
    * corpus — the number that decides whether downstream ANN runs at 16
    * or 64 dims.
    */
  def rpRecall(embs: DataFrame, nQueries: Int, k: Int): DataFrame =
    recallVsExact(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id")),
      rpTopK(embs, nQueries, k),
      k)

  // ---- binary quantization ---------------------------------------------------

  /** Candidate pool the Hamming scan hands to the exact rerank. */
  val BqRerank = 20

  /** 1-bit-per-dimension binary quantization: each vector compresses to
    * its 64 sign bits, stored as two 32-bit words — a 32× compression
    * that turns the candidate scan into XOR + popcount over 16 bytes
    * (the trick modern vector stores ship as "binary quantization";
    * sign-bit Hamming approximates angular distance — the [[rpBucket]]
    * LSH family evaluated exhaustively instead of bucketed).
    */
  def bqCodes(embs: DataFrame): DataFrame = {
    def word(lo: Int, hi: Int): org.apache.spark.sql.Column =
      (lo until hi)
        .map(j => when(element_at(col("e"), j + 1) > 0.0d, lit(1L << (j - lo))).otherwise(0L))
        .reduce(_ + _)
    asDouble(embs).select(col("vec_id"), word(0, 32).as("w0"), word(32, 64).as("w1"))
  }

  /** Hamming-ranked top-`rerank` candidates per query, exact-cosine
    * reranked to top-k. The scan phase touches only the 16-byte codes;
    * the full vectors are read back for just `rerank` rows per query —
    * the two-phase shape that makes 1-bit search usable at corpus scale.
    */
  def bqTopK(embs: DataFrame, nQueries: Int, k: Int, rerank: Int = BqRerank): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val codes = Phys.materialized(bqCodes(embs))
    val q = codes.filter(col("vec_id") < nQueries).alias("q")
    val c = codes.alias("c")
    // Hamming phase: the |q|·|corpus| scored stream is ranked by the
    // bounded-heap [[graft.functions.TopKAggregator]] (score = −ham so
    // "higher first, lower id on ties" realizes (ham ASC, n_id ASC)) —
    // map-side partial top-`rerank`, so only rerank·|q| rows cross the
    // shuffle; a row_number window here would instead SORT the whole
    // scan per partition, the scan's dominant shuffle at corpus scale.
    val scoredHam = q
      .join(c, col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        (-(expr("bit_count(q.w0 ^ c.w0)") + expr("bit_count(q.w1 ^ c.w1)")))
          .cast("double").as("negham"))
      .as[(Long, Long, Double)]
    val topHam = new graft.functions.TopKAggregator(rerank)
    val cands = scoredHam
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topHam.toColumn)
      .flatMap { case (qId, hits) => hits.map { case (nId, _) => (qId, nId) } }
      .toDF("q_id", "n_id")
    // rerank phase: exact cosine over the rerank-bounded pool only
    val d = asDouble(embs)
    val reranked = cands
      .join(d.select(col("vec_id").as("q_id"), col("e").as("qe")), Seq("q_id"))
      .join(d.select(col("vec_id").as("n_id"), col("e").as("ne")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), round(Parity.cosine(col("qe"), col("ne")), 6).as("cos"))
      .as[(Long, Long, Double)]
    val topCos = new graft.functions.TopKAggregator(k)
    reranked
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topCos.toColumn)
      .flatMap { case (qId, hits) =>
        hits.zipWithIndex.map { case ((nId, cos), i) => (qId, nId, cos, i + 1) }
      }
      .toDF("q_id", "n_id", "cos", "rank")
  }

  /** [[bqTopK]] for an EXTERNAL query vector — the point-lookup serving
    * API of the 1-bit index, next to `ann_ivf_query`/`text_bm25_query`:
    * the query's sign words fold in as literals, the corpus scan
    * touches only the 16-byte codes, and the full vectors are read back
    * for `rerank` rows.
    *
    * Output: k rows `(rank, vec_id, cos)`.
    */
  def bqQuery(
      embs: DataFrame,
      query: Seq[Double],
      k: Int = 5,
      rerank: Int = BqRerank): DataFrame = {
    def word(lo: Int, hi: Int): Long =
      (lo until hi).map(j => if (query(j) > 0) 1L << (j - lo) else 0L).sum
    val (q0, q1) = (word(0, 32), word(32, 64))
    val cands = bqCodes(embs)
      .select(
        col("vec_id"),
        (expr(s"bit_count(w0 ^ ${q0}L)") + expr(s"bit_count(w1 ^ ${q1}L)")).as("ham"))
      .orderBy(col("ham"), col("vec_id"))
      .limit(rerank)
    val scored = cands
      .join(asDouble(embs), Seq("vec_id"))
      .select(
        col("vec_id"),
        round(Parity.cosine(typedLit(query), col("e")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
    // rank over the bounded k-row result only
    scored
      .withColumn(
        "rank",
        row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("rank"), col("vec_id"), col("cos"))
  }

  /** [[bqQuery]] mirrored. */
  def bqQuerySql(query: Seq[Double], k: Int = 5, rerank: Int = BqRerank): String = {
    def wordSql(lo: Int, hi: Int): String =
      (lo until hi)
        .map(j =>
          s"(CASE WHEN e[${j + 1}] > 0 THEN CAST(${1L << (j - lo)} AS BIGINT) ELSE 0 END)")
        .mkString("(", " + ", ")")
    def word(lo: Int, hi: Int): Long =
      (lo until hi).map(j => if (query(j) > 0) 1L << (j - lo) else 0L).sum
    val qLit = s"CAST(${query.mkString("[", ", ", "]")} AS DOUBLE[])"
    s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |codes AS (
       |  SELECT vec_id, ${wordSql(0, 32)} AS w0, ${wordSql(32, 64)} AS w1 FROM d),
       |cands AS (
       |  SELECT vec_id,
       |         bit_count(xor(w0, CAST(${word(0, 32)} AS BIGINT)))
       |           + bit_count(xor(w1, CAST(${word(32, 64)} AS BIGINT))) AS ham
       |  FROM codes ORDER BY ham, vec_id LIMIT $rerank),
       |scored AS (
       |  SELECT c.vec_id, round(${Parity.cosineSql(qLit, "d.e")}, 6) AS cos
       |  FROM cands c JOIN d ON d.vec_id = c.vec_id
       |  ORDER BY cos DESC, c.vec_id LIMIT $k)
       |SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank,
       |       vec_id, cos
       |FROM scored""".stripMargin
  }

  /** Measured recall@k of the 1-bit two-phase search vs the exact
    * full-precision top-k — what 32× compression costs on THIS corpus,
    * next to [[rpRecall]] (16× via projection) and [[pqRecall]]
    * (36× via codebooks).
    */
  def bqRecall(embs: DataFrame, nQueries: Int, k: Int): DataFrame =
    recallVsExact(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id")),
      bqTopK(embs, nQueries, k),
      k)

  /** [[bqRecall]] mirrored. */
  def bqRecallSql(nQueries: Int, k: Int, rerank: Int = BqRerank): String = {
    def wordSql(lo: Int, hi: Int): String =
      (lo until hi)
        .map(j =>
          s"(CASE WHEN e[${j + 1}] > 0 THEN CAST(${1L << (j - lo)} AS BIGINT) ELSE 0 END)")
        .mkString("(", " + ", ")")
    s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |codes AS (
       |  SELECT vec_id, ${wordSql(0, 32)} AS w0, ${wordSql(32, 64)} AS w1 FROM d),
       |cands AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |           bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS ham,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)), c.vec_id)
       |             AS hrank
       |    FROM codes q JOIN codes c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |  WHERE hrank <= $rerank),
       |approx AS (
       |  SELECT * FROM (
       |    SELECT t.q_id, t.n_id,
       |           CAST(row_number() OVER (PARTITION BY t.q_id
       |             ORDER BY round(${Parity.cosineSql("q.e", "n.e")}, 6) DESC, t.n_id) AS INT)
       |             AS rank
       |    FROM cands t JOIN d q ON q.vec_id = t.q_id JOIN d n ON n.vec_id = t.n_id)
       |  WHERE rank <= $k),
       |exact AS (
       |  SELECT * FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |           CAST(row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY round(${Parity.cosineSql("q.e", "c.e")}, 6) DESC, c.vec_id) AS INT)
       |             AS rank
       |    FROM d q JOIN d c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |  WHERE rank <= $k)
       |SELECT e.q_id, CAST(count(a.n_id) AS BIGINT) AS n_hits,
       |       round(CAST(count(a.n_id) AS DOUBLE) / $k, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON a.q_id = e.q_id AND a.n_id = e.n_id
       |GROUP BY e.q_id""".stripMargin
  }

  /** Product-quantization geometry: [[Dim]] split into [[PqM]] contiguous
    * subspaces of [[PqSubDim]] dims, each quantized by its own
    * [[kmeansFixed]] codebook of [[PqCells]] centroids — 8×7-bit codes
    * (56 bits, a 36× compression of 64 floats). Geometry chosen by a
    * measured sweep on the harness corpus (recall@3 vs brute-force
    * cosine): 2×8 codes 0.09, 4×16 0.13, 4×64 0.28, 8×128 0.45 — the
    * label-clustered embeddings need enough cells for WITHIN-cluster
    * resolution, or every same-cluster candidate reconstructs identically
    * and ranking degenerates to the id tie-break.
    */
  val PqM = 8
  val PqSubDim: Int = Dim / PqM
  val PqCells = 128

  /** Product-quantized approximate top-k (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI): each vector
    * is compressed to [[PqM]] codebook ids (here 8×7 bits in place of
    * 64 floats); a query builds a per-subspace LOOK-UP TABLE of its dot
    * product with every centroid, and each candidate's approximate inner
    * product is just the sum of [[PqM]] table entries — the asymmetric
    * distance computation (ADC) that lets a scan rank millions of
    * candidates without touching a single full vector. The codebooks are
    * the integer fixed-point [[kmeansFixed]] per subspace, so training,
    * encoding, and ADC are all bit-identical cross-engine (micro-unit
    * dots of 32 dims stay < 2^53 — exact in doubles).
    *
    * Scale shape: training is [[PqM]] independent Lloyd runs; encoding is
    * one broadcast-codebook argmax pass over the corpus (narrow map); the
    * LUT is queries × cells × subspaces rows — broadcast; the ADC scan is
    * one broadcast-hash join keyed on (subspace, code) plus a partial-agg
    * sum per (query, candidate). At 100 TB this composes with the IVF
    * probe (IVF-PQ): the coarse quantizer bounds the candidate list and
    * ADC replaces the exact re-rank's full-vector reads.
    */
  /** All [[PqM]] subspace views of the integer embeddings in ONE frame
    * (m, vec_id, ei_m): a single narrow map emitting [[PqM]] rows per
    * vector. Slicing the pre-rounded `ei` equals rounding the sliced
    * doubles (round is elementwise), so downstream math is bit-identical
    * to per-subspace slicing.
    */
  private def subspaced(di: DataFrame): DataFrame =
    di.select(
        col("vec_id"),
        explode(array((0 until PqM).map(m =>
          struct(
            lit(m).as("m"),
            slice(col("ei"), m * PqSubDim + 1, PqSubDim).as("ei_m"))): _*)).as("s"))
      .select(col("s.m").as("m"), col("vec_id"), col("s.ei_m").as("ei_m"))

  /** [[kmeansFixed]] with a grouping key: trains one independent Lloyd
    * run PER distinct `m` in the same jobs — identical per-key math
    * (same `vec_id < kCells` init, same scores, same integer means), but
    * [[PqM]] codebooks cost ONE chain of Spark jobs instead of [[PqM]]
    * sequential chains. The centroid table stays tiny (m × kCells rows),
    * so assignment remains a broadcast join keyed on `m`.
    */
  /** Per-(grouping cols) argmax over (score desc, cid asc) as a HASH
    * aggregate: `max(struct(score, -cid))` selects exactly the row a
    * `row_number() = 1` window over (score desc, cid) would — but with
    * map-side partial aggregation, only ONE row per group crosses the
    * exchange instead of the full #cells-wide candidate set passing
    * through a sort. `ei_m` rides along via `first` (constant within a
    * group — every candidate row of a vector carries the same vector).
    */
  private def argmaxCell(scoredCands: DataFrame, keys: Seq[String]): DataFrame =
    scoredCands
      .groupBy(keys.map(col): _*)
      .agg(
        max(struct(col("score"), (-col("cid")).as("ncid"))).as("sel"),
        first(col("ei_m")).as("ei_m"))
      .select(keys.map(col) ++ Seq((-col("sel.ncid")).as("cid"), col("ei_m")): _*)

  private def kmeansFixedKeyed(d: DataFrame, kCells: Int, iters: Int): DataFrame = {
    var cent = d
      .filter(col("vec_id") < kCells)
      .select(col("m"), col("vec_id").as("cid"), col("ei_m").as("c"))
    (1 to iters).foreach { _ =>
      val assigned = argmaxCell(
        d.join(broadcast(cent), Seq("m"))
          .select(
            col("m"),
            col("vec_id"),
            col("cid"),
            col("ei_m"),
            cellScore(col("ei_m"), col("c")).as("score")),
        Seq("m", "vec_id"))
      cent = assigned
        .select(col("m"), col("cid"), posexplode(col("ei_m")).as(Seq("pos", "v")))
        .groupBy(col("m"), col("cid"), col("pos"))
        .agg(expr("sum(v) div count(1)").as("cv"))
        .groupBy(col("m"), col("cid"))
        .agg(
          transform(array_sort(collect_list(struct(col("pos"), col("cv")))), s => s("cv")).as("c"))
    }
    cent
  }

  /** Per-subspace PQ quantization distortion — the codebook-quality
    * table beside [[ivfHealth]]'s coarse-cell view: for each of the
    * [[PqM]] subspaces, the mean squared L2 error between vectors and
    * their assigned centroid, in EXACT integer micro² units (vectors
    * and centroids are both integer micro-unit arrays, so `Σ(x−c)²`
    * is a plain 64-bit sum — no floating distance anywhere). A
    * subspace whose distortion is an outlier dominates the ADC error
    * budget — the signal to re-train or re-slice before recall decays.
    *
    * Scale shape: the same one-frame subspace explode and broadcast
    * codebook join the encoder uses, then an 8-row aggregate.
    *
    * Output: `(m, n_vecs, mean_sqerr)`.
    */
  def pqDistortion(embs: DataFrame): DataFrame = {
    val dsub = Phys.materialized(subspaced(intEmb(embs).select(col("vec_id"), col("ei"))))
    val cent = Phys.materialized(kmeansFixedKeyed(dsub, PqCells, KmeansIters))
    val assigned = argmaxCell(
      dsub
        .join(broadcast(cent), Seq("m"))
        .select(
          col("m"),
          col("vec_id"),
          col("cid"),
          col("ei_m"),
          cellScore(col("ei_m"), col("c")).as("score")),
      Seq("m", "vec_id"))
    assigned
      .join(broadcast(cent), Seq("m", "cid"))
      .select(
        col("m"),
        aggregate(
          zip_with(col("ei_m"), col("c"), (x, y) => (x - y) * (x - y)),
          lit(0L),
          (acc, v) => acc + v).as("sqerr"))
      .groupBy(col("m").cast("long").as("m"))
      .agg(count(lit(1)).as("n_vecs"), expr("sum(sqerr) div count(1)").as("mean_sqerr"))
  }

  /** The PQ index pair: per-vector codes (n_id, m, code) and the query
    * LUT (q_id, m, code, qdot, cnorm). The LUT carries BOTH the
    * query-centroid dot and the centroid's own squared norm: the ADC
    * approximates COSINE (the exact path's objective), so the candidate
    * norm must be reconstructed from its codes — raw inner-product ADC
    * mis-ranks any corpus with varying vector norms (measured: recall@3
    * 0.09 → cosine ADC fixes).
    */
  private def pqCodesAndLut(embs: DataFrame, nQueries: Int): (DataFrame, DataFrame) = {
    val dsub = Phys.materialized(subspaced(intEmb(embs).select(col("vec_id"), col("ei"))))
    val cent = Phys.materialized(kmeansFixedKeyed(dsub, PqCells, KmeansIters))
    codesAndLutFrom(dsub, cent, nQueries)
  }

  /** Encode + LUT against a GIVEN codebook table — the apply half of the
    * PQ index, shared by the train-inline path and the stored-model
    * serving path. The codebook is m × [[PqCells]] rows — broadcast on
    * both uses, never shuffled.
    */
  private def codesAndLutFrom(
      dsub: DataFrame,
      cent: DataFrame,
      nQueries: Int): (DataFrame, DataFrame) = {
    val codes = argmaxCell(
      dsub
        .join(broadcast(cent), Seq("m"))
        .select(
          col("m"),
          col("vec_id"),
          col("cid"),
          col("ei_m"),
          cellScore(col("ei_m"), col("c")).as("score")),
      Seq("m", "vec_id"))
      .select(col("vec_id").as("n_id"), col("m"), col("cid").as("code"))
    val qtab = dsub
      .filter(col("vec_id") < nQueries)
      .join(broadcast(cent), Seq("m"))
      .select(
        col("vec_id").as("q_id"),
        col("m"),
        col("cid").as("code"),
        graft.functions.DotLongs(col("ei_m"), col("c")).as("qdot"),
        graft.functions.DotLongs(col("c"), col("c")).as("cnorm"))
    (codes, qtab)
  }

  /** Train once, persist the PQ quantizer: the [[kmeansFixedKeyed]]
    * per-subspace codebooks written as a parquet artifact — (m, cid, c),
    * [[PqM]]·[[PqCells]] tiny rows, the [[writeIvfModel]] pattern for
    * the product quantizer. Storing it decouples the [[PqM]] Lloyd
    * chains from every future encode/ADC job.
    */
  def writePqModel(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      corpusKey: String = ""): String = {
    def train = {
      val dsub = Phys.materialized(subspaced(intEmb(embs).select(col("vec_id"), col("ei"))))
      kmeansFixedKeyed(dsub, PqCells, KmeansIters)
    }
    if (corpusKey.nonEmpty)
      ModelCache.dir(s"pq-codebooks|$corpusKey|m=$PqM,cells=$PqCells,iters=$KmeansIters")(train)
    else {
      val dir = graft.sources.Staging.freshDir("pq-model")
      train.coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
  }

  /** Train once, persist the SCALAR quantizer (faiss SQ8): per-dimension
    * (dim, lo, hi) over the corpus — 64 tiny rows, one posexplode + one
    * 64-key hash aggregate (map-side partial min/max). The cheapest
    * trained compressor in the family: no Lloyd at all, 4× smaller codes
    * than raw floats, and unlike PQ the reconstruction is per-dimension
    * independent, so the serving dot product decomposes exactly (see
    * [[sqStoredTopK]]).
    */
  def writeSqModel(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      corpusKey: String = ""): String = {
    def train =
      asDouble(embs)
        .select(posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy((col("pos") + 1).cast("int").as("dim"))
        .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    if (corpusKey.nonEmpty) ModelCache.dir(s"sq-ranges|$corpusKey|dim=$Dim")(train)
    else {
      val dir = graft.sources.Staging.freshDir("sq-model")
      train.coalesce(1).write.mode("overwrite").parquet(dir)
      dir
    }
  }

  /** Inner-product top-k over a STORED scalar quantizer: the corpus is
    * encoded to uint8 codes against the artifact's per-dim [lo, hi]
    * ranges (one interpreted zip pass per CORPUS vector — never per
    * pair), and the query-side dot decomposes EXACTLY through the
    * quantizer:
    * `dot(q, dequant(c)) = dot(q, lo) + dot(q ∘ step, code)` with
    * `step_d = (hi_d − lo_d)/255` — so the per-pair hot path is ONE
    * codegen'd [[graft.functions.DotProduct]] over the code array plus a
    * scalar add, with the query-side `dot(q, lo)` and `q ∘ step`
    * precomputed once per QUERY row. The plan reads the 64-row artifact
    * (broadcast) and the corpus, nothing else — no training stage.
    * Degenerate dims (hi = lo) encode to 0 and contribute exactly
    * `q_d·lo_d` through the decomposition, so constant dimensions are
    * lossless.
    */
  def sqStoredTopK(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      modelDir: String,
      nQueries: Int,
      k: Int): DataFrame = {
    // fold the 64 (dim, lo, hi) rows into dim-aligned arrays INSIDE the
    // plan (single-row aggregate, broadcast) — no driver-side collect
    val m = broadcast(
      spark.read.parquet(modelDir).agg(
        transform(array_sort(collect_list(struct(col("dim"), col("lo")))), s => s("lo"))
          .as("lo"),
        transform(array_sort(collect_list(struct(col("dim"), col("hi")))), s => s("hi"))
          .as("hi")))
    val d = asDouble(embs)
    val codes = d.crossJoin(m).select(
      col("vec_id").as("n_id"),
      zip_with(
        zip_with(col("e"), col("lo"), (x, l) => x - l),
        zip_with(col("hi"), col("lo"), (h, l) => h - l),
        (xl, r) =>
          when(r > lit(0.0), least(greatest(floor(xl / r * lit(255.0)), lit(0.0)), lit(255.0)))
            .otherwise(lit(0.0))).as("code"))
    val q = d.filter(col("vec_id") < nQueries).crossJoin(m).select(
      col("vec_id").as("q_id"),
      Parity.dot(col("e"), col("lo")).as("qlo"),
      zip_with(
        col("e"),
        zip_with(col("hi"), col("lo"), (h, l) => (h - l) / lit(255.0)),
        (x, s) => x * s).as("qs"))
    val scored = broadcast(q)
      .join(codes, col("q_id") =!= col("n_id"))
      .select(
        col("q_id"),
        col("n_id"),
        round(col("qlo") + Parity.dot(col("qs"), col("code")), 6).as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("score"), col("rank"))
  }

  /** Per-dimension SQ8 quantization distortion over the stored scalar
    * quantizer — completes the index-health triple ([[ivfHealth]]
    * occupancy, [[pqDistortion]] codebook error, this): for each of
    * the 64 dimensions, the mean and max absolute reconstruction error
    * `|x − (lo + code·step)|` in nano units (each element's error
    * micro-rounded at 10⁻⁹ BEFORE the per-dim integer mean — order
    * free). A dimension whose max error spikes has outliers stretching
    * its [lo, hi] range — the signal to clip or re-scale before
    * recall decays; degenerate dims reconstruct exactly (error 0).
    *
    * Scale shape: the 64-row artifact folds to one broadcast row; one
    * narrow encode-reconstruct pass; a 64-row aggregate.
    *
    * Output: `(dim, n_vecs, mean_err_nano, max_err_nano)`.
    */
  def sqDistortion(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      modelDir: String): DataFrame = {
    val m = broadcast(
      spark.read.parquet(modelDir).agg(
        transform(array_sort(collect_list(struct(col("dim"), col("lo")))), s => s("lo"))
          .as("lo"),
        transform(array_sort(collect_list(struct(col("dim"), col("hi")))), s => s("hi"))
          .as("hi")))
    asDouble(embs)
      .crossJoin(m)
      .select(posexplode(col("e")).as(Seq("pos", "x")), col("lo"), col("hi"))
      .select(
        (col("pos") + 1).cast("long").as("dim"),
        col("x"),
        element_at(col("lo"), col("pos").cast("int") + 1).as("l"),
        element_at(col("hi"), col("pos").cast("int") + 1).as("h"))
      .withColumn(
        "err_nano",
        expr("""CAST(round(abs(x - (l + CASE WHEN (h - l) > 0.0
                |  THEN least(greatest(floor((x - l) / (h - l) * 255.0), 0.0), 255.0)
                |       * ((h - l) / 255.0)
                |  ELSE 0.0 END)) * 1000000000.0) AS BIGINT)""".stripMargin))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n_vecs"),
        expr("sum(err_nano) div count(1)").as("mean_err_nano"),
        max(col("err_nano")).as("max_err_nano"))
  }

  /** [[sqDistortion]] mirrored. */
  def sqDistortionSql(): String = {
    val dims = 64
    s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |mm AS (SELECT t.i AS dim, min(e[t.i]) AS lo, max(e[t.i]) AS hi
       |       FROM d CROSS JOIN range(1, ${dims + 1}) t(i) GROUP BY 1),
       |x AS (
       |  SELECT mm.dim, CAST(round(abs(e[mm.dim] - (mm.lo + CASE WHEN (mm.hi - mm.lo) > 0.0
       |    THEN least(greatest(floor((e[mm.dim] - mm.lo) / (mm.hi - mm.lo) * 255.0), 0.0),
       |               255.0) * ((mm.hi - mm.lo) / 255.0)
       |    ELSE 0.0 END)) * 1000000000.0) AS BIGINT) AS err_nano
       |  FROM d CROSS JOIN mm)
       |SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(sum(err_nano) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_err_nano,
       |       CAST(max(err_nano) AS BIGINT) AS max_err_nano
       |FROM x GROUP BY dim""".stripMargin
  }

  /** Shared oracle CTEs for the SQ8 path: min/max train, encode, and the
    * decomposed dot, operation for operation (ends with ranked `r`). */
  private def sqCtes(nQueries: Int): String = {
    val dims = 64
    s"""d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |mm AS (SELECT t.i AS dim, min(e[t.i]) AS lo, max(e[t.i]) AS hi
       |       FROM d CROSS JOIN range(1, ${dims + 1}) t(i) GROUP BY 1),
       |m AS (SELECT list(lo ORDER BY dim) AS lo, list(hi ORDER BY dim) AS hi FROM mm),
       |codes AS (SELECT vec_id AS n_id,
       |  [CASE WHEN (hi[i] - lo[i]) > 0.0
       |        THEN least(greatest(floor((e[i] - lo[i]) / (hi[i] - lo[i]) * 255.0), 0.0), 255.0)
       |        ELSE 0.0 END FOR i IN range(1, ${dims + 1})] AS code
       |  FROM d CROSS JOIN m),
       |q AS (SELECT vec_id AS q_id,
       |  ${Parity.dotSql("e", "lo")} AS qlo,
       |  [e[i] * ((hi[i] - lo[i]) / 255.0) FOR i IN range(1, ${dims + 1})] AS qs
       |  FROM d CROSS JOIN m WHERE vec_id < $nQueries),
       |sc AS (SELECT q_id, n_id,
       |  round(qlo + ${Parity.dotSql("qs", "code")}, 6) AS score
       |  FROM q JOIN codes ON q_id <> n_id),
       |r AS (SELECT q_id, n_id, score,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS INT) AS rank
       |  FROM sc)""".stripMargin
  }

  /** DuckDB oracle for [[writeSqModel]]+[[sqStoredTopK]]. */
  def sqStoredTopKSql(nQueries: Int, k: Int): String =
    s"""WITH ${sqCtes(nQueries)}
       |SELECT q_id, n_id, score, rank FROM r WHERE rank <= $k
       |ORDER BY q_id, rank""".stripMargin

  /** Exact inner-product top-k — the baseline [[sqRecall]] measures
    * against (the SQ score is a dot, so the like-for-like exact ranking
    * is a dot, not a cosine).
    */
  def bruteDotTopK(embs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val d = asDouble(embs)
    val q = d.filter(col("vec_id") < nQueries).alias("q")
    val c = d.alias("c")
    val scored = q
      .join(c, col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        round(Parity.dot(col("q.e"), col("c.e")), 6).as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Measured recall@k of the SQ8 serving ranking against the exact
    * inner-product top-k — the number that makes the 4× compression a
    * measured trade instead of a hope (the [[pqRecall]] discipline).
    */
  def sqRecall(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      nQueries: Int,
      k: Int,
      corpusKey: String = ""): DataFrame = {
    val modelDir = writeSqModel(spark, embs, corpusKey)
    recallVsExact(
      bruteDotTopK(embs, nQueries, k).select(col("q_id"), col("n_id")),
      sqStoredTopK(spark, embs, modelDir, nQueries, k),
      k)
  }

  /** DuckDB oracle for [[sqRecall]]. */
  def sqRecallSql(nQueries: Int, k: Int): String =
    s"""WITH ${sqCtes(nQueries)},
       |scored_e AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         round(${Parity.dotSql("q.e", "c.e")}, 6) AS s
       |  FROM d q JOIN d c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
       |ranked_e AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY s DESC, n_id) AS rank
       |  FROM scored_e)
       |SELECT e.q_id, CAST(count(a.n_id) AS BIGINT) AS n_hits,
       |       round(CAST(count(a.n_id) AS DOUBLE) / $k.0, 6) AS recall
       |FROM (SELECT * FROM ranked_e WHERE rank <= $k) e
       |LEFT JOIN (SELECT * FROM r WHERE rank <= $k) a
       |  ON a.q_id = e.q_id AND a.n_id = e.n_id
       |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin

  /** The production ADC scan over a STORED product quantizer: read the
    * codebook artifact, encode the corpus and build the query LUT
    * against it (both broadcast probes), rank by ADC — no Lloyd stage
    * anywhere in the plan. Together with [[writePqModel]] this completes
    * train-once/apply-many for the PQ family.
    */
  def pqStoredTopK(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      modelDir: String,
      nQueries: Int,
      k: Int): DataFrame = {
    val dsub = Phys.materialized(subspaced(intEmb(embs).select(col("vec_id"), col("ei"))))
    val (codes, qtab) = codesAndLutFrom(dsub, spark.read.parquet(modelDir), nQueries)
    adcRank(codes, qtab, k)
  }

  /** Full-scan ADC ranking of (codes, LUT) — the scoring tail shared by
    * [[pqTopK]] and [[pqStoredTopK]].
    */
  private def adcRank(codes: DataFrame, qtab: DataFrame, k: Int): DataFrame = {
    // approximate cosine: Σ_m dot(q_m, c_m) / sqrt(Σ_m |c_m|² + 1); the
    // +1 micro-unit² regularizer (mirrored in the oracle) keeps an
    // all-zero reconstruction finite and is negligible against real
    // norms (~10¹²). All dots are exact integers in doubles; the one
    // division and sqrt are correctly-rounded IEEE — deterministic.
    val scored = codes
      .join(broadcast(qtab), Seq("m", "code"))
      .filter(col("q_id") =!= col("n_id"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(
        round(sum(col("qdot")) / sqrt(sum(col("cnorm")) + lit(1.0d)), 6).as("adc"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("adc"), col("rank"))
  }

  def pqTopK(embs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val (codes, qtab) = pqCodesAndLut(embs, nQueries)
    adcRank(codes, qtab, k)
  }

  /** Measured recall@k of [[pqTopK]] against brute force — 56-bit codes
    * are a 36× compression of 64 floats, so THIS table is what says
    * whether the compression is usable for a given corpus.
    */
  def pqRecall(embs: DataFrame, nQueries: Int, k: Int): DataFrame =
    recallVsExact(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id")),
      pqTopK(embs, nQueries, k),
      k)

  /** IVF-PQ, the production ANN composition (Jégou et al. 2011 §V): the
    * trained coarse quantizer ([[kmeansFixed]]) bounds each query's
    * candidate list to its `nProbe` nearest inverted lists, and the PQ
    * ADC ranks those candidates from 56-bit codes — so a query touches
    * neither the corpus (IVF prunes it) nor any full vector (ADC replaces
    * the exact re-rank's vector reads). At 100 TB this is the shape that
    * serves: candidate generation keyed on the cell id, scoring a
    * broadcast-LUT lookup summed per pair, both sides of every join
    * either bounded or broadcast.
    *
    * A candidate appears in exactly one inverted list (argmax cell), so
    * probing several cells never duplicates a (query, candidate) pair —
    * no DISTINCT needed on either engine.
    */
  def ivfpqTopK(embs: DataFrame, nQueries: Int, k: Int, nProbe: Int): DataFrame =
    ivfpqWith(embs, kmeansFixed(embs), pqCodesAndLut(embs, nQueries), nQueries, k, nProbe)

  /** IVF-PQ over STORED artifacts — both the coarse quantizer
    * ([[writeIvfModel]]) and the per-subspace codebooks
    * ([[writePqModel]]) read from parquet: the serving plan assigns,
    * probes, encodes, and ADC-ranks with zero Lloyd stages. This is the
    * complete production ANN shape at 100 TB: every model operand is a
    * broadcast-sized artifact scan, the corpus crosses the plan once
    * for assignment and once for encoding.
    */
  def ivfpqStoredTopK(
      spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame,
      ivfModelDir: String,
      pqModelDir: String,
      nQueries: Int,
      k: Int,
      nProbe: Int): DataFrame = {
    val dsub = Phys.materialized(subspaced(intEmb(embs).select(col("vec_id"), col("ei"))))
    ivfpqWith(
      embs,
      spark.read.parquet(ivfModelDir),
      codesAndLutFrom(dsub, spark.read.parquet(pqModelDir), nQueries),
      nQueries,
      k,
      nProbe)
  }

  private def ivfpqWith(
      embs: DataFrame,
      cents: DataFrame,
      codesQtab: (DataFrame, DataFrame),
      nQueries: Int,
      k: Int,
      nProbe: Int): DataFrame = {
    // materialized intEmb — see ivfWithCentroids
    val cellScores = Phys.materialized(intEmb(embs))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), cellScore(col("ei"), col("c")).as("ccos"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val rankedCells = Phys.materialized(cellScores.withColumn("rn", row_number().over(wCell)))
    val pairs = rankedCells
      .filter(col("vec_id") < nQueries && col("rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("cid"))
      .join(rankedCells.filter(col("rn") === 1).select(col("vec_id").as("n_id"), col("cid")), Seq("cid"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
    val (codes, qtab) = codesQtab
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id"))
    pairs
      .join(codes, Seq("n_id"))
      .join(broadcast(qtab), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(round(sum(col("qdot")) / sqrt(sum(col("cnorm")) + lit(1.0d)), 6).as("adc"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("adc"), col("rank"))
  }

  /** Measured recall@k of [[ivfpqTopK]] against brute force — quantifies
    * what the COMPOSITION costs over [[pqRecall]]'s full-scan ADC (the
    * IVF pruning can only lose candidates, never add them).
    */
  def ivfpqRecall(embs: DataFrame, nQueries: Int, k: Int, nProbe: Int): DataFrame =
    recallVsExact(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id")),
      ivfpqTopK(embs, nQueries, k, nProbe),
      k)

  /** IVF-PQ with an exact re-ranking tail (the IVFADC+R refinement,
    * Jégou et al. 2011 §VII / "Searching in one billion vectors",
    * ICASSP 2011): the ADC scan returns `nCand` > k candidates per
    * query from 56-bit codes, and only those nQueries·nCand pairs are
    * re-scored against the FULL vectors — exact cosine, re-ranked to
    * the final top-k. This repairs most of the quantization error
    * (ADC mis-orders near-ties; the exact tail restores them) at a
    * vector-read cost proportional to the CANDIDATE list, not the
    * corpus.
    *
    * Scale shape: the candidate table is nQueries·nCand rows —
    * broadcast against the corpus scan, so the refinement reads each
    * candidate's full vector exactly once via a broadcast-hash join and
    * never shuffles the corpus; the final top-k window partitions on
    * q_id over ≤ nCand rows per query.
    */
  def ivfpqRerankTopK(
      embs: DataFrame,
      nQueries: Int,
      k: Int,
      nProbe: Int,
      nCand: Int): DataFrame = {
    val cand = ivfpqTopK(embs, nQueries, nCand, nProbe).select(col("q_id"), col("n_id"))
    val d = asDouble(embs)
    val exact = broadcast(cand)
      .join(d.select(col("vec_id").as("q_id"), col("e").as("qe")), Seq("q_id"))
      .join(d.select(col("vec_id").as("n_id"), col("e").as("ne")), Seq("n_id"))
      .select(
        col("q_id"),
        col("n_id"),
        round(Parity.cosine(col("qe"), col("ne")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    exact
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  def lshTopK(embs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val b = buckets(embs)
    val q = b.filter(col("vec_id") < nQueries).alias("q")
    val c = b.alias("c")
    val scored = q
      .join(
        c,
        col("q.tbl") === col("c.tbl") && col("q.bucket") === col("c.bucket") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        round(Parity.cosine(col("q.e"), col("c.e")), 6).as("cos"))
      // a pair colliding in several tables appears once (max = the one cos)
      .groupBy(col("q_id"), col("n_id"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Contrastive hard-negative mining: for each query vector, the
    * top-`k` most-similar vectors with a DIFFERENT label — the pairs a
    * contrastive/embedding trainer wants as hard negatives. This is the
    * exact baseline (label-filtered brute force); at 100 TB the same
    * ranking runs over ANN candidates (the [[ivfTopK]] probe) instead of
    * the corpus cross — the label predicate composes with any candidate
    * generator.
    */
  def hardNegatives(embs: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val d = asDoubleWithLabel(embs)
    val q = d.filter(col("vec_id") < nQueries).alias("q")
    val c = d.alias("c")
    val scored = q
      .join(c, col("q.label") =!= col("c.label"))
      .select(
        col("q.vec_id").as("q_id"),
        col("q.label").as("q_label"),
        col("c.vec_id").as("n_id"),
        col("c.label").as("n_label"),
        round(Parity.cosine(col("q.e"), col("c.e")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** DuckDB oracle for [[hardNegatives]]. */
  def hardNegativesSql(nQueries: Int, k: Int): String =
    s"""WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS n_id, c.label AS n_label,
       |         round(${Parity.cosineSql("q.e", "c.e")}, 6) AS cos
       |  FROM d q JOIN d c ON q.vec_id < $nQueries AND q.label <> c.label),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
       |  FROM scored)
       |SELECT * FROM ranked WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Embedding-space label outliers: per label, the `k` vectors LEAST
    * similar to their own label centroid — the mislabeled-data /
    * low-quality-embedding mining step of an embedding pipeline. One
    * narrow pass scores the corpus against the broadcast centroid table
    * (the [[ivfTopK]] assignment shape); per-label top-k by ascending
    * similarity.
    */
  def labelOutliers(embs: DataFrame, k: Int): DataFrame = {
    val scored = asDoubleWithLabel(embs)
      .join(broadcast(centroidVectors(embs).withColumnRenamed("cid", "label")), Seq("label"))
      .select(
        col("label"),
        col("vec_id"),
        round(Parity.cosine(col("e"), col("c")), 6).as("ccos"))
    val w = Window.partitionBy(col("label")).orderBy(col("ccos").asc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Nearest-centroid classification eval: every vector is assigned to
    * the label whose centroid it is most cosine-similar to (ties →
    * smaller label), and the result is the CONFUSION MATRIX
    * `(label, pred, n)` — the label-quality audit of an embedding
    * corpus (off-diagonal mass = label noise or entangled classes; the
    * Rocchio-classifier read of [[labelCentroids]]).
    *
    * Scale shape: centroids are one hash aggregate; scoring crosses
    * the corpus with the broadcast |labels|-row table; the per-vector
    * argmax is a `max(struct(cos, −label))` hash aggregate — no
    * window, one exchange on vec_id; the matrix is ≤ |labels|² rows.
    */
  def nearestCentroidConfusion(embs: DataFrame): DataFrame = {
    val cents = broadcast(
      centroidVectors(embs).select(col("cid").as("clabel"), col("c")))
    asDoubleWithLabel(embs)
      .crossJoin(cents)
      .select(
        col("vec_id"),
        col("label"),
        col("clabel"),
        round(Parity.cosine(col("e"), col("c")), 6).as("ccos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("ccos"), (-col("clabel")).cast("long").as("nc"))).as("sel"))
      .select(col("label"), (-col("sel.nc")).as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** [[nearestCentroidConfusion]] mirrored (oracle argmax as a window
    * rank — fine at oracle scale).
    */
  def nearestCentroidConfusionSql(): String =
    s"""WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cent AS (
       |  SELECT label, t.i AS dim, round(avg(e[t.i]), 6) AS centroid
       |  FROM d CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
       |cv AS (SELECT label AS clabel, list(centroid ORDER BY dim) AS c FROM cent GROUP BY label),
       |scored AS (
       |  SELECT d.vec_id, d.label, cv.clabel,
       |         round(${Parity.cosineSql("d.e", "cv.c")}, 6) AS ccos
       |  FROM d CROSS JOIN cv),
       |rk AS (
       |  SELECT vec_id, label, clabel,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS rn
       |  FROM scored)
       |SELECT label, CAST(clabel AS BIGINT) AS pred, CAST(count(*) AS BIGINT) AS n
       |FROM rk WHERE rn = 1 GROUP BY 1, 2""".stripMargin

  /** DuckDB oracle for [[labelOutliers]] (the emb_centroids fold feeds
    * the centroid arrays). */
  def labelOutliersSql(k: Int): String =
    s"""WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cent AS (
       |  SELECT label, t.i AS dim, round(avg(e[t.i]), 6) AS centroid
       |  FROM d CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
       |cv AS (SELECT label, list(centroid ORDER BY dim) AS c FROM cent GROUP BY label),
       |scored AS (
       |  SELECT d.label, d.vec_id,
       |         round(${Parity.cosineSql("d.e", "cv.c")}, 6) AS ccos
       |  FROM d JOIN cv USING (label)),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY label ORDER BY ccos ASC, vec_id) AS INT) AS rank
       |  FROM scored)
       |SELECT * FROM ranked WHERE rank <= $k ORDER BY label, rank""".stripMargin

  // ---- Matryoshka truncation recall ----------------------------------------

  /** Recall@k of TRUNCATED-dimension exact search against the full-dim
    * exact top-k — the ablation behind Matryoshka-style embeddings
    * (Kusupati et al. 2022): if the first m dims alone rank well, the
    * index stores m/D of the bytes and every scan gets D/m faster. One
    * row per truncation width: `(dim, n_queries, sum_hits,
    * recall_ppm)` with recall_ppm = Σhits·10⁶ div (nq·k) exact.
    *
    * Scale shape: the scored join is the [[bruteForceTopK]] shape per
    * width (queries broadcast against the corpus); the full-dim
    * baseline is computed once and reused across widths.
    */
  def matryoshkaRecall(
      embs: DataFrame,
      nQueries: Int,
      k: Int,
      dims: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val exact = Phys.materialized(
      bruteForceTopK(embs, nQueries, k).select(col("q_id"), col("n_id")))
    dims.map { m =>
      val truncated = embs.select(col("vec_id"), slice(col("embedding"), 1, m).as("embedding"))
      recallVsExact(exact, bruteForceTopK(truncated, nQueries, k), k)
        .agg(
          count(lit(1)).as("n_queries"),
          sum(col("n_hits")).as("sum_hits"),
          expr(s"sum(n_hits) * 1000000 div (count(*) * $k)").as("recall_ppm"))
        .select(lit(m.toLong).as("dim"), col("n_queries"), col("sum_hits"), col("recall_ppm"))
    }.reduce(_ unionAll _)
  }

  /** [[matryoshkaRecall]] mirrored. */
  def matryoshkaRecallSql(nQueries: Int, k: Int, dims: Seq[Int] = Seq(8, 16, 32)): String = {
    def ranked(eExpr: String, name: String): String =
      s"""${name}_scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         round(${Parity.cosineSql(s"q.$eExpr", s"c.$eExpr")}, 6) AS cos
         |  FROM d q JOIN d c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
         |$name AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |    FROM ${name}_scored) WHERE rank <= $k)""".stripMargin
    val per = dims.map { m =>
      s"""SELECT CAST($m AS BIGINT) AS dim, CAST(count(DISTINCT e.q_id) AS BIGINT) AS n_queries,
         |       CAST(count(a.n_id) AS BIGINT) AS sum_hits,
         |       CAST(count(a.n_id) * 1000000 // (count(DISTINCT e.q_id) * $k) AS BIGINT)
         |         AS recall_ppm
         |FROM exact e LEFT JOIN approx_$m a ON a.q_id = e.q_id AND a.n_id = e.n_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    val truncCtes = dims
      .map(m =>
        s"""d$m AS (SELECT vec_id, e[1:$m] AS et FROM d),
           |${ranked("et", s"approx_$m").replace("FROM d q JOIN d c", s"FROM d$m q JOIN d$m c")}""".stripMargin)
      .mkString(",\n")
    s"""WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |${ranked("e", "exact")},
       |$truncCtes
       |$per""".stripMargin
  }

  // ---- k-NN classifier evaluation ------------------------------------------

  /** k-NN classification evaluated as a confusion matrix — the standard
    * "is this embedding space any good" probe: hold out every 5th
    * vector, predict its label by majority vote of its k nearest
    * training vectors (exact cosine; vote ties break to the smaller
    * label, rank ties to the smaller vec_id — fully deterministic), and
    * tabulate (true label × predicted label). At corpus scale the
    * held-out probe set is small and broadcast; the per-query cost is
    * one corpus scan — and the IVF/PQ serving paths drop in unchanged
    * because the vote only needs the top-k ids.
    *
    * Output: `(label_true, label_pred, n)` — bounded by |labels|².
    */
  def knnEval(embs: DataFrame, k: Int = 5): DataFrame = {
    val d = embs.select(
      col("vec_id"),
      col("label").cast("long").as("label"),
      col("embedding").cast("array<double>").as("e"))
    val test = d.filter(col("vec_id") % 5 === 0L).alias("q")
    val train = d.filter(col("vec_id") % 5 =!= 0L).alias("c")
    val scored = test
      .join(train, col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("q_id"),
        col("q.label").as("label_true"),
        col("c.label").as("cand_label"),
        col("c.vec_id").as("n_id"),
        round(Parity.cosine(col("q.e"), col("c.e")), 6).as("cos"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    val votes = scored
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .groupBy(col("q_id"), col("label_true"), col("cand_label"))
      .agg(count(lit(1)).as("n_votes"))
    val wVote =
      Window.partitionBy(col("q_id")).orderBy(col("n_votes").desc, col("cand_label"))
    votes
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .groupBy(col("label_true"), col("cand_label").as("label_pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** [[knnEval]] served through the IVF index — pins the claim the
    * brute evaluator's doc makes: the vote layer is agnostic to how the
    * top-k was retrieved. The quantizer trains on the TRAIN split only
    * (the held-out probes must not shape the index — the leakage rule
    * every eval pipeline follows), train members build the inverted
    * lists, and each held-out vector probes its `nProbe` best cells —
    * per-query candidate work drops from |train| to ~nProbe/cells of
    * it, the IVF bargain, at whatever recall the confusion matrix now
    * reflects.
    *
    * Output: `(label_true, label_pred, n)`.
    */
  def knnEvalIvf(embs: DataFrame, k: Int = 5, nProbe: Int = 2): DataFrame = {
    val train = embs.filter(col("vec_id") % 5L =!= 0L)
    val test = embs.filter(col("vec_id") % 5L === 0L)
    val cents = Phys.materialized(kmeansFixed(train))
    val lists = Phys.materialized(
      invertedLists(train, cents)
        .join(
          embs.select(col("vec_id").as("n_id"), col("label").cast("long").as("cand_label")),
          Seq("n_id")))
    val wCell = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cid"))
    val probed = Phys.materialized(intEmb(test))
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id").as("q_id"),
        col("cid"),
        col("e").as("qe"),
        cellScore(col("ei"), col("c")).as("ccos"))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= nProbe)
      .select(col("q_id"), col("cid"), col("qe"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    val wVote =
      Window.partitionBy(col("q_id")).orderBy(col("n_votes").desc, col("cand_label"))
    probed
      .join(lists, Seq("cid"))
      .select(
        col("q_id"),
        col("n_id"),
        col("cand_label"),
        round(Parity.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .join(
        test.select(col("vec_id").as("q_id"), col("label").cast("long").as("label_true")),
        Seq("q_id"))
      .groupBy(col("q_id"), col("label_true"), col("cand_label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .groupBy(col("label_true"), col("cand_label").as("label_pred"))
      .agg(count(lit(1)).as("n"))
  }

  // ---- MMR diversified re-ranking ------------------------------------------

  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) of the exact top-[[MmrCandidates]] — the serving-side
    * step between "nearest" and "useful": pick greedily by
    * `λ·rel − (1−λ)·max-sim-to-already-picked` so near-duplicate hits
    * don't crowd the result page. λ = 0.7 in exact integer deci-micro
    * units (`score = 7·rel_micro − 3·maxsim_micro`) — the greedy chain
    * is deterministic down to its (score desc, id asc) tie-break, so
    * the whole re-rank is oracle-checkable, which a float-scored MMR
    * never is.
    *
    * Scale shape: everything after the candidate top-k runs on
    * |queries|·k rows (k² sims per query) — re-ranking is bounded
    * per-query work, the corpus is touched only by the candidate
    * retrieval (the [[bruteForceTopK]] shape; any ANN path drops in).
    *
    * Output: `(q_id, rank, n_id, score)` — `rank` 1..k of the picked
    * diversified set.
    */
  def mmrDiversify(embs: DataFrame, nQueries: Int, k: Int = 5): DataFrame = {
    val d = asDouble(embs)
    val relMicro = expr("CAST(round(cosd * 1000000) AS BIGINT)")
    val scored = d
      .alias("q")
      .join(d.alias("c"), col("q.vec_id") =!= col("c.vec_id"))
      .filter(col("q.vec_id") < nQueries)
      .select(
        col("q.vec_id").as("q_id"),
        col("c.vec_id").as("n_id"),
        Parity.cosine(col("q.e"), col("c.e")).as("cosd"))
      .select(col("q_id"), col("n_id"), relMicro.as("rel"))
    val wCand = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("n_id"))
    val cand = Phys.materialized(
      scored.withColumn("rn", row_number().over(wCand)).filter(col("rn") <= MmrCandidates))
    val sim = Phys.materialized(
      cand
        .select(col("q_id"), col("n_id").as("a"))
        .join(cand.select(col("q_id"), col("n_id").as("b")), Seq("q_id"))
        .filter(col("a") =!= col("b"))
        .join(d.select(col("vec_id").as("a"), col("e").as("ea")), Seq("a"))
        .join(d.select(col("vec_id").as("b"), col("e").as("eb")), Seq("b"))
        .select(
          col("q_id"),
          col("a"),
          col("b"),
          round(Parity.cosine(col("ea"), col("eb")) * lit(1000000.0d), 0)
            .cast("long")
            .as("sim")))
    var pick = Phys.materialized(
      cand
        .filter(col("rn") === 1)
        .select(col("q_id"), col("n_id"), lit(1L).as("rank"), (col("rel") * 7L).as("score")))
    var picked = pick.select(col("q_id"), col("n_id"))
    val picks = scala.collection.mutable.ArrayBuffer(pick)
    (2 to k).foreach { t =>
      val stepScores = cand
        .join(picked.select(col("q_id"), col("n_id").as("p_id")), Seq("q_id"))
        .join(
          sim.select(col("q_id"), col("a").as("n_id"), col("b").as("p_id"), col("sim")),
          Seq("q_id", "n_id", "p_id"))
        .groupBy(col("q_id"), col("n_id"), col("rel"))
        .agg(max(col("sim")).as("maxsim"))
        .join(picked.withColumn("is_p", lit(true)), Seq("q_id", "n_id"), "left_anti")
        .select(col("q_id"), col("n_id"), (col("rel") * 7L - col("maxsim") * 3L).as("score"))
      val wPick = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
      pick = Phys.materialized(
        stepScores
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("q_id"), col("n_id"), lit(t.toLong).as("rank"), col("score")))
      picks += pick
      picked = Phys.materialized(picked.unionAll(pick.select(col("q_id"), col("n_id"))))
    }
    picks.reduce(_ unionAll _)
  }

  /** Candidate pool width for [[mmrDiversify]]. */
  val MmrCandidates = 10

  /** [[mmrDiversify]] mirrored: the greedy chain unrolled, one
    * (scores, argmax, picked-union) CTE triple per step.
    */
  def mmrDiversifySql(nQueries: Int, k: Int = 5): String = {
    val steps = (2 to k).map { t =>
      s"""s$t AS MATERIALIZED (
         |  SELECT c.q_id, c.n_id, 7 * c.rel - 3 * max(s.sim) AS score
         |  FROM cand c
         |  JOIN picked${t - 1} p ON p.q_id = c.q_id
         |  JOIN sim s ON s.q_id = c.q_id AND s.a = c.n_id AND s.b = p.n_id
         |  WHERE NOT EXISTS (SELECT 1 FROM picked${t - 1} x
         |                    WHERE x.q_id = c.q_id AND x.n_id = c.n_id)
         |  GROUP BY c.q_id, c.n_id, c.rel),
         |pick$t AS MATERIALIZED (
         |  SELECT q_id, n_id, CAST($t AS BIGINT) AS rank, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |                                 ORDER BY score DESC, n_id) AS rn FROM s$t)
         |  WHERE rn = 1),
         |picked$t AS MATERIALIZED (
         |  SELECT q_id, n_id FROM picked${t - 1} UNION ALL SELECT q_id, n_id FROM pick$t)"""
        .stripMargin
    }
    val unions =
      (1 to k).map(t => s"SELECT q_id, n_id, rank, score FROM pick$t").mkString(" UNION ALL ")
    s"""WITH d AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |scored AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         CAST(round(${Parity.cosineSql("q.e", "c.e")} * 1000000) AS BIGINT) AS rel
       |  FROM d q JOIN d c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
       |cand AS MATERIALIZED (
       |  SELECT q_id, n_id, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, n_id) AS rn
       |    FROM scored) WHERE rn <= $MmrCandidates),
       |sim AS MATERIALIZED (
       |  SELECT c1.q_id, c1.n_id AS a, c2.n_id AS b,
       |         CAST(round(${Parity.cosineSql("da.e", "db.e")} * 1000000) AS BIGINT) AS sim
       |  FROM cand c1 JOIN cand c2 ON c1.q_id = c2.q_id AND c1.n_id <> c2.n_id
       |  JOIN d da ON da.vec_id = c1.n_id JOIN d db ON db.vec_id = c2.n_id),
       |pick1 AS MATERIALIZED (
       |  SELECT q_id, n_id, CAST(1 AS BIGINT) AS rank, 7 * rel AS score FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, n_id) AS rn
       |    FROM cand) WHERE rn = 1),
       |picked1 AS MATERIALIZED (SELECT q_id, n_id FROM pick1),
       |${steps.mkString(",\n")}
       |SELECT q_id, rank, n_id, score FROM ($unions)""".stripMargin
  }

  /** [[knnEval]] mirrored. */
  def knnEvalSql(k: Int = 5): String =
    s"""WITH d AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, q.label AS label_true, c.label AS cand_label,
       |         c.vec_id AS n_id, round(${Parity.cosineSql("q.e", "c.e")}, 6) AS cos
       |  FROM d q JOIN d c ON q.vec_id % 5 = 0 AND c.vec_id % 5 <> 0
       |    AND q.vec_id <> c.vec_id),
       |topk AS (
       |  SELECT q_id, label_true, cand_label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
       |    FROM scored) WHERE rank <= $k),
       |votes AS (
       |  SELECT q_id, label_true, cand_label, CAST(count(*) AS BIGINT) AS n_votes
       |  FROM topk GROUP BY 1, 2, 3),
       |pred AS (
       |  SELECT q_id, label_true, cand_label AS label_pred FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |                                 ORDER BY n_votes DESC, cand_label) AS vr
       |    FROM votes) WHERE vr = 1)
       |SELECT label_true, label_pred, CAST(count(*) AS BIGINT) AS n
       |FROM pred GROUP BY 1, 2""".stripMargin

  // ---- k-means elbow (choose k) --------------------------------------------

  /** The elbow table for choosing the quantizer's cell count: the same
    * deterministic Lloyd training ([[kmeansFixed]]) run at each
    * candidate k, scored by within-cluster squared error in exact
    * integer micro² units (the [[pqDistortion]] readout applied to the
    * full vector). Inertia falls monotonically in k; the k where the
    * marginal drop flattens is the operating point — the standard
    * pre-flight before committing an IVF/SemDeDup cell count.
    *
    * Scale shape: one integer-embedding materialization shared across
    * all k; per k, Lloyd's broadcast assignment passes plus one
    * zip_with fold per vector — k and the candidate list are small
    * constants, so cost ≈ |ks| × one training.
    *
    * Output: one row per k `(k, n_vecs, sse, mean_sqerr)`.
    */
  def kmeansElbow(embs: DataFrame, ks: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    val d = Phys.materialized(intEmb(embs).select(col("vec_id"), col("ei")))
    ks.map { k =>
        val cent = kmeansFixed(embs, k)
        val assigned = d
          .crossJoin(broadcast(cent))
          .select(col("vec_id"), col("cid"), col("ei"), cellScore(col("ei"), col("c")).as("score"))
          .groupBy(col("vec_id"))
          .agg(
            max(struct(col("score"), (-col("cid")).as("ncid"))).as("sel"),
            first(col("ei")).as("ei"))
          .select((-col("sel.ncid")).as("cid"), col("ei"))
        assigned
          .join(broadcast(cent), Seq("cid"))
          .select(
            aggregate(
              zip_with(col("ei"), col("c"), (x, y) => (x - y) * (x - y)),
              lit(0L),
              (acc, v) => acc + v).as("sqerr"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("sqerr")).as("sse"),
            expr("sum(sqerr) div count(1)").as("mean_sqerr"))
          .select(lit(k.toLong).as("k"), col("n_vecs"), col("sse"), col("mean_sqerr"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("k"))
  }

  // ---- cell-blocked k-NN graph ---------------------------------------------

  /** k-nearest-neighbor graph over the embedding corpus, cell-blocked:
    * vectors are assigned to the deterministic Lloyd cells (the same
    * quantizer SemDeDup blocks on, [[graft.operators.Dedup.SemanticCells]]-
    * sized) and each vector's k neighbors are searched WITHIN its cell
    * only — the approximate-kNN-graph construction (cf. Dong et al.
    * 2011's blocked initialization) that graph-based curation (near-dup
    * clustering, label propagation over content, diversity sampling)
    * builds on at scale, where exact all-pairs kNN is quadratic.
    *
    * `mutual` marks edges whose reverse is also a top-k edge — the
    * mutual-kNN subgraph is the standard density-robust clustering
    * substrate.
    *
    * Scale shape: Lloyd train is broadcast (corpus never shuffled on a
    * non-key); each vector shuffles ONCE on its cell id; per-cell pair
    * work is (|V|/cells)² — grow `cells` with the corpus. The top-k
    * window partitions by vec_id over per-vector candidate lists
    * (bounded by the cell size), and the mutual check is a self-join of
    * the |V|·k edge list on the flipped key — no all-pairs term.
    *
    * Output: `(vec_id, nbr_id, nbr_rank, cos, mutual)`, rank 1..k by
    * (cos desc, nbr_id asc), cos rounded at 6 before ranking so the
    * order is engine-portable.
    */
  def knnGraph(
      embs: DataFrame,
      k: Int = 3,
      cells: Int = graft.operators.Dedup.SemanticCells,
      corpusKey: String = ""): DataFrame = {
    val assigned = Phys.materialized(invertedLists(embs, kmeansCached(embs, cells, corpusKey)))
    val a = assigned.alias("a")
    val b = assigned.alias("b")
    val cand = a
      .join(b, col("a.cid") === col("b.cid") && col("a.n_id") =!= col("b.n_id"))
      .select(
        col("a.n_id").as("vec_id"),
        col("b.n_id").as("nbr_id"),
        round(graft.functions.Parity.cosine(col("a.ne"), col("b.ne")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    val top = Phys.materialized(
      cand
        .withColumn("nbr_rank", row_number().over(w).cast("long"))
        .filter(col("nbr_rank") <= k))
    val rev = top.select(col("nbr_id").as("r_vec"), col("vec_id").as("r_nbr"))
    top
      .join(
        rev,
        col("vec_id") === col("r_vec") && col("nbr_id") === col("r_nbr"),
        "left_outer")
      .select(
        col("vec_id"),
        col("nbr_id"),
        col("nbr_rank"),
        col("cos"),
        col("r_vec").isNotNull.as("mutual"))
  }

  // ---- filtered vector search ------------------------------------------------

  /** Metadata-filtered ANN (the "filtered vector search" every vector
    * store ships): IVF probe with a candidate predicate — here `vec_id %
    * mod = 0`, standing in for any licensing/shard/tenant filter —
    * applied to the inverted lists BEFORE exact re-ranking, so the
    * filter prunes candidates inside the probed cells rather than
    * post-truncating the top-k (the classic wrong way, which returns
    * fewer than k rows or misses matches entirely). With filter
    * selectivity 1/mod the effective list length shrinks by ~mod, which
    * is why the default probes one more cell than [[ivfTopK]] — the
    * standard nProbe-vs-selectivity tradeoff, made visible here as a
    * parameter.
    *
    * Scale shape: identical to [[ivfTopK]] (one corpus×centroid
    * broadcast scoring pass reused by lists and probes, candidate join
    * keyed on the cell) — the predicate is a narrow filter pushed onto
    * the assigned lists.
    */
  def ivfFilteredTopK(
      embs: DataFrame,
      nQueries: Int,
      k: Int,
      nProbe: Int = 3,
      mod: Long = 3L): DataFrame = {
    val d = asDouble(embs)
    val cellScores = d
      .crossJoin(broadcast(centroidVectors(embs)))
      .select(
        col("vec_id"),
        col("cid"),
        col("e"),
        round(Parity.cosine(col("e"), col("c")), 6).as("ccos"))
    rankAndProbe(cellScores, nQueries, k, nProbe, candPred = col("vec_id") % mod === 0L)
  }

  /** [[ivfFilteredTopK]] mirrored (the ann_ivf_topk oracle with the
    * candidate predicate on the inverted lists). */
  def ivfFilteredTopKSql(nQueries: Int, k: Int, nProbe: Int = 3, mod: Long = 3L): String =
    s"""WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cent AS (
       |  SELECT label AS cid, list(centroid ORDER BY dim) AS c
       |  FROM (SELECT label, CAST(t.i AS INT) AS dim, round(avg(e[t.i]), 6) AS centroid
       |        FROM d CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2)
       |  GROUP BY label),
       |cell_scores AS (
       |  SELECT v.vec_id, c.cid, round(${Parity.cosineSql("v.e", "c.c")}, 6) AS ccos
       |  FROM d v CROSS JOIN cent c),
       |ranked_cells AS (
       |  SELECT vec_id, cid,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
       |  FROM cell_scores),
       |assigned AS (
       |  SELECT vec_id AS n_id, cid FROM ranked_cells WHERE rn = 1 AND vec_id % $mod = 0),
       |probes AS (
       |  SELECT vec_id AS q_id, cid FROM ranked_cells WHERE vec_id < $nQueries AND rn <= $nProbe),
       |scored AS (
       |  SELECT p.q_id, a.n_id, round(${Parity.cosineSql("q.e", "n.e")}, 6) AS cos
       |  FROM probes p
       |  JOIN assigned a ON a.cid = p.cid AND a.n_id <> p.q_id
       |  JOIN d q ON q.vec_id = p.q_id
       |  JOIN d n ON n.vec_id = a.n_id),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
       |  FROM scored)
       |SELECT * FROM ranked WHERE rank <= $k""".stripMargin

  // ---- k-center coreset selection -------------------------------------------

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal):
    * start from the minimum vec_id, then k−1 times pick the point
    * farthest (squared L2, exact integers) from everything chosen so
    * far. The selected set 2-approximates the optimal k-center cover,
    * which is the classic "pick k maximally-diverse exemplars" pass a
    * training pipeline runs to seed a labeling budget, dedup a few-shot
    * pool, or stratify an eval slice — the coverage-first complement of
    * [[mmrRerank]]'s relevance-first diversity.
    *
    * Determinism: vectors quantize to [[KmeansScale]] micro-integers
    * (the shared ANN discipline), distances are exact BIGINT, argmax
    * ties break to the smaller vec_id.
    *
    * Scale shape: k bounded argmax aggregates over one materialized
    * integer-vector frame — each round is one scan with a broadcast
    * center literal folded into `least(...)`; the only driver-side rows
    * are the k chosen centers (a bounded model artifact). The output's
    * last row is the achieved covering radius (max over the corpus of
    * the distance to the chosen set) — one more bounded aggregate.
    *
    * Output: k+1 rows `(rank, vec_id, dist2)` — rank 0..k−1 the chosen
    * exemplars with their selection distance (0 for the seed), rank k
    * the summary row `(k, -1, covering_radius²)`.
    */
  private def kcenterBase(embs: DataFrame): DataFrame =
    Phys.materialized(
      embs.select(
        col("vec_id").cast("long").as("vec_id"),
        graft.functions.MicroInts(col("embedding").cast("array<double>"), KmeansScale).as("ei")))

  // DotLongs accumulates in double; every value here stays below 2^53
  // (64 dims × (2·10⁶)² ≈ 2.6·10¹⁴ max dist²), so the cast back to
  // BIGINT is exact — the oracle's pure-integer fold sees the same.
  private def kcenterDist2(center: Array[Long]): org.apache.spark.sql.Column = {
    val c = typedLit(center.toSeq)
    val dl = graft.functions.DotLongs
    (dl(c, c) + dl(col("ei"), col("ei")) - lit(2.0d) * dl(col("ei"), c)).cast("long")
  }

  /** The greedy picking loop shared by [[kcenterCoreset]] and
    * [[kcenterAssign]]: returns (rank, vec_id, selection dist²,
    * integer vector) per chosen exemplar. */
  private def kcenterPick(base: DataFrame, k: Int): List[(Int, Long, Long, Array[Long])] = {
    val seed = base.orderBy(col("vec_id")).limit(1).collect()(0)
    var picked = List((0, seed.getLong(0), 0L, seed.getSeq[Long](1).toArray))
    var minD = kcenterDist2(picked.head._4)
    for (r <- 1 until k) {
      val sel = base
        .select(col("vec_id"), col("ei"), minD.as("d"))
        .orderBy(col("d").desc, col("vec_id"))
        .limit(1)
        .collect()(0)
      picked ::= ((r, sel.getLong(0), sel.getLong(2), sel.getSeq[Long](1).toArray))
      minD = least(minD, kcenterDist2(picked.head._4))
    }
    picked.reverse
  }

  def kcenterCoreset(embs: DataFrame, k: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val base = kcenterBase(embs)
    val picked = kcenterPick(base, k)
    val minD = picked.map(p => kcenterDist2(p._4)).reduce(least(_, _))
    val radius = base
      .agg(max(minD).as("dist2"))
      .select(lit(k).as("rank"), lit(-1L).as("vec_id"), col("dist2"))
    picked
      .map(p => (p._1, p._2, p._3))
      .toDF("rank", "vec_id", "dist2")
      .unionAll(radius)
  }

  /** The coreset's APPLY half: every corpus vector assigned to its
    * nearest chosen exemplar (ties to the lower rank), rolled up to the
    * per-exemplar cluster census — assigned count and achieved cluster
    * radius. This is what the labeling/stratification pass that chose
    * the coreset actually consumes: which exemplar speaks for how much
    * of the corpus, and how tightly.
    *
    * Scale shape: one scan over the materialized integer-vector frame
    * with k broadcast center literals folded into an argmin struct
    * array; one k-group aggregate.
    *
    * Output: k rows `(rank, vec_id, n_assigned, radius2)`.
    */
  def kcenterAssign(embs: DataFrame, k: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val base = kcenterBase(embs)
    val picked = kcenterPick(base, k)
    val best = array_min(
      array(picked.map(p => struct(kcenterDist2(p._4).as("d"), lit(p._1).as("r"))): _*))
    val exemplars = picked.map(p => (p._1, p._2)).toDF("rank", "vec_id")
    base
      .select(best.getField("d").as("d"), best.getField("r").as("rank"))
      .groupBy(col("rank"))
      .agg(count(lit(1)).as("n_assigned"), max(col("d")).as("radius2"))
      .join(broadcast(exemplars), Seq("rank"))
      .select(col("rank"), col("vec_id"), col("n_assigned"), col("radius2"))
  }

  /** [[kcenterAssign]] mirrored: the unrolled greedy CTEs of
    * [[kcenterCoresetSql]] feed a center union, per-point argmin by
    * (dist², rank), k-group census. */
  def kcenterAssignSql(k: Int = 8): String = {
    def d2(a: String, b: String) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(list_zip($a, $b), s -> (s[1] - s[2]) * (s[1] - s[2]))), " +
        s"(acc, x) -> acc + x)"
    val centers = (0 until k)
      .map(r => s"SELECT $r AS rank, vec_id AS cvid, ei FROM c$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${kcenterStageCtes(k)},
       |cents AS ($centers),
       |dist AS (
       |  SELECT d.vec_id, c.rank, c.cvid, ${d2("d.ei", "c.ei")} AS dd
       |  FROM d CROSS JOIN cents c),
       |asg AS (
       |  SELECT * FROM (
       |    SELECT vec_id, rank, dd,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dd, rank) AS rn
       |    FROM dist)
       |  WHERE rn = 1)
       |SELECT a.rank, max(c.cvid) AS vec_id,
       |       CAST(count(*) AS BIGINT) AS n_assigned,
       |       CAST(max(a.dd) AS BIGINT) AS radius2
       |FROM asg a JOIN cents c ON c.rank = a.rank
       |GROUP BY a.rank""".stripMargin
  }

  /** [[kcenterCoreset]] mirrored: the identical greedy unrolled as k−1
    * CTE stages (argmax by `(d DESC, vec_id)`, then `least` with the
    * new center's distance), over the same micro-integer vectors.
    */
  /** The unrolled greedy stage CTEs (d, c0, m0, c1, m1, …) shared by
    * the coreset and assignment oracles. */
  private def kcenterStageCtes(k: Int): String = {
    def d2(a: String, b: String) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(list_zip($a, $b), s -> (s[1] - s[2]) * (s[1] - s[2]))), " +
        s"(acc, x) -> acc + x)"
    val head = Seq(
      s"d AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, " +
        s"list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x * $KmeansScale) AS BIGINT)) AS ei " +
        s"FROM embeddings)",
      "c0 AS (SELECT vec_id, ei FROM d ORDER BY vec_id LIMIT 1)",
      s"m0 AS (SELECT d.vec_id, d.ei, ${d2("d.ei", "c0.ei")} AS md FROM d CROSS JOIN c0)")
    val stages = (1 until k).flatMap { r =>
      Seq(
        s"c$r AS (SELECT vec_id, ei, md FROM m${r - 1} ORDER BY md DESC, vec_id LIMIT 1)",
        s"m$r AS (SELECT m.vec_id, m.ei, least(m.md, ${d2("m.ei", "c.ei")}) AS md " +
          s"FROM m${r - 1} m CROSS JOIN c$r c)")
    }
    (head ++ stages).mkString(",\n")
  }

  def kcenterCoresetSql(k: Int = 8): String = {
    val rows =
      Seq("SELECT 0 AS rank, vec_id, CAST(0 AS BIGINT) AS dist2 FROM c0") ++
        (1 until k).map(r => s"SELECT $r AS rank, vec_id, CAST(md AS BIGINT) AS dist2 FROM c$r") :+
        s"SELECT $k AS rank, CAST(-1 AS BIGINT) AS vec_id, CAST(max(md) AS BIGINT) AS dist2 FROM m${k - 1}"
    s"WITH ${kcenterStageCtes(k)}\n${rows.mkString("\nUNION ALL\n")}"
  }
}
