package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-quality audits: the properties that decide whether a query
  * SURVIVES 100× data growth are visible in the executed plan — filter
  * pushdown and column pruning at the parquet scan, broadcast joins for
  * small dimensions, no all-pairs joins in the bucketed dedup/ANN paths.
  * These tests pin them so a refactor can't silently regress the plan
  * while keeping the answer right.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    df.collect() // force AQE finalization so the executed plan is final
    df.queryExecution.executedPlan.toString
  }

  test("filter + projection push down to the parquet scan") {
    val df = model.table(spark, dir, "lineitem")
      .filter(col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"))
    // pruned read schema: only the two referenced columns reach the scan
    assert(plan.contains("ReadSchema: struct<l_orderkey:") && !plan.contains("l_comment"))
  }

  test("join_revenue broadcasts the small dimensions, shuffles only the fact join") {
    val plan = planOf(SparkEntry.queries("join_revenue")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    // nation/region must not be shuffle-joined
    val shuffles = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 3, s"too many exchanges ($shuffles) in:\n$plan")
  }

  test("window top-k runs as rank-limit, not a global sort of the fact table") {
    val plan = planOf(SparkEntry.queries("window_rank")(spark, dir))
    // Spark 4 plans the rn <= 3 filter as WindowGroupLimit: only the
    // per-partition top rows survive the exchange
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("dedup candidate joins key on bucket columns, never cross joins") {
    Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard", "ann_lsh_topk")
      .foreach { q =>
        val plan = planOf(SparkEntry.queries(q)(spark, dir))
        assert(
          !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
          s"$q plans an all-pairs join:\n$plan")
      }
  }

  test("kmeans/IVF centroid joins broadcast the tiny side, never a raw cartesian") {
    // kmeans_centroids' plan exposes the training iterations: the
    // corpus×centroids cross join must ride a BROADCAST of the k-row
    // centroid table — a non-broadcast cartesian would shuffle the
    // corpus against itself
    val train = planOf(SparkEntry.queries("kmeans_centroids")(spark, dir))
    assert(!train.contains("CartesianProduct"), s"raw cartesian in training:\n$train")
    assert(
      train.contains("BroadcastNestedLoopJoin"),
      s"centroid table not broadcast in training:\n$train")
    // ann_ivf_trained materializes training behind a checkpoint; its
    // visible probe plan must still be cartesian-free
    val probe = planOf(SparkEntry.queries("ann_ivf_trained")(spark, dir))
    assert(!probe.contains("CartesianProduct"), s"raw cartesian in probe:\n$probe")
  }

  test("PQ and IVF-PQ: codebook joins broadcast, LUT join is a broadcast hash join") {
    // training/encoding rides broadcasts of the m×cells codebook; the
    // ADC scoring join must be a BroadcastHashJoin keyed on (m, code)
    // (for ivfpq: (q_id, m, code)) — a shuffle of the code table against
    // the LUT would move the whole corpus encoding per query batch
    Seq("ann_pq_topk", "ann_ivfpq_topk").foreach { q =>
      val plan = planOf(SparkEntry.queries(q)(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"$q raw cartesian:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"$q LUT join not broadcast:\n$plan")
    }
  }

  test("KMV sketch top-k plans as TakeOrdered, not a global sort") {
    val plan = planOf(SparkEntry.queries("sketch_kmv_shingles")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("skew_key_report: heavy hitters ride TakeOrdered + partial count, totals broadcast") {
    val plan = planOf(SparkEntry.queries("skew_key_report")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for top-N in:\n$plan")
    assert(plan.contains("partial_count"), s"no map-side partial in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"totals not broadcast in:\n$plan")
  }

  test("partition-column filter prunes directories, not rows") {
    val staged = sources.TabularIO.partitionedRoundTrip(
      spark,
      model.table(spark, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"), col("lang")),
      "lang")
    val q = staged.filter(col("lang") === "en").select(col("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(q.count() > 0)
  }

  test("AQE splits a skewed partition in the bucket self-join shape") {
    // the dedup/ANN candidate generators self-join on bucket keys
    // (minhash bands, simhash chunks, LSH tables); a hot bucket lands on
    // one shuffle partition, and the scale notes lean on AQE skew-join
    // to split it. This pins (a) the config is on, and (b) with a
    // skewed fixture and test-scale thresholds the split actually
    // happens (`skew=true` on the executed sort-merge join).
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // bucket 0 is hot (5k rows on one shuffle partition); buckets
      // 1..199 carry 5 rows each (the median stays tiny). The payload is
      // a sha2 digest — INCOMPRESSIBLE, so the shuffle-file partition
      // size the skew detector reads reflects the real row width (a
      // constant pad would LZ4-compress below any threshold)
      val df = spark.range(0, 6000).select(
        when(col("id") < 5000, 0L).otherwise(pmod(col("id"), lit(200))).as("bucket"),
        sha2(col("id").cast("string").cast("binary"), 256).as("payload"))
      // max() on both payloads keeps the wide column alive through the
      // exchange (column pruning would otherwise shrink the skewed
      // partition below the split threshold); the aggregate is GLOBAL —
      // an agg keyed on the join key would reuse the join's output
      // partitioning, and AQE (correctly) refuses to split a partition
      // some downstream operator still relies on
      val j = df.alias("a")
        .join(df.alias("b"), col("a.bucket") === col("b.bucket"))
        .agg(count(lit(1)).as("n"), max(col("a.payload")).as("pa"), max(col("b.payload")).as("pb"))
      val plan = planOf(j)
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join in:\n$plan")
      assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("curate canonical selection partial-aggregates before the exchange") {
    // min(doc_id) per text must run as a hash aggregate with a partial
    // (map-side) phase — a window over partitionBy(text) would ship
    // every duplicate row raw to one reducer
    val plan = planOf(SparkEntry.queries("pipeline_curate")(spark, dir))
    assert(plan.contains("partial_min(doc_id"), plan)
  }

  test("bloom_semi_join prefilters the fact side below its exchange") {
    // the sketch probe must run on the fact SCAN side — before the hash
    // exchange feeding the semi join — or it saves no shuffle volume
    val plan = planOf(SparkEntry.queries("bloom_semi_join")(spark, dir))
    assert(plan.contains("might_contain"), s"no Bloom probe in:\n$plan")
    val lines = plan.split("\n")
    val probeAt = lines.indexWhere(_.contains("might_contain"))
    val joinAt = lines.indexWhere(_.contains("LeftSemi"))
    assert(joinAt >= 0 && probeAt > joinAt, // deeper in the tree = printed later
      s"Bloom probe not below the semi join:\n$plan")
  }

  test("Spark auto-injects a runtime Bloom filter when thresholds allow") {
    // the explicit BloomJoin operator has a planner-injected sibling
    // (InjectRuntimeFilter); this pins that the engine-level path is
    // available and fires on the selective-dim shuffle-join shape, with
    // thresholds scaled down to fixture size
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "32MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = model.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = model.table(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000.0) // selective creation side
        .select(col("o_orderkey"))
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(
        optimized.contains("bloom_filter_agg") || optimized.contains("might_contain"),
        s"no injected runtime filter in:\n$optimized")
    } finally prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("chunk fan-out is a pure narrow map — zero exchanges") {
    val df = graft.operators.TextOps.chunk(model.table(spark, dir, "documents"))
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"chunk shuffles:\n$plan")
  }

  test("shuffleShards windows per shard, never through a single partition") {
    val df = graft.operators.TextOps.shuffleShards(model.table(spark, dir, "documents"))
    val plan = planOf(df)
    assert(plan.contains("Window"), plan)
    assert(
      !plan.contains("Exchange SinglePartition"),
      s"global row_number funnel in:\n$plan")
  }

  test("BPE pair counting partial-aggregates the histogram before its exchange") {
    val df = graft.operators.Tokenization.pairCounts(
      graft.operators.Tokenization.initialStates(model.table(spark, dir, "documents")))
    val plan = planOf(df)
    assert(plan.contains("partial_sum(freq"), s"no map-side partial in:\n$plan")
  }

  test("bpe_encode is one narrow pass over the corpus — zero exchanges") {
    // the merge table is driver-local and folded into the projection, so
    // encoding shuffles NOTHING: scan → project. (Training runs its own
    // histogram jobs eagerly at construction; this is the encode plan.)
    val df = graft.operators.Tokenization.bpeEncode(
      spark, model.table(spark, dir, "documents"), nMerges = 2)
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"bpe_encode shuffles:\n$plan")
  }

  test("ann_ivf_recall stays cartesian-free across both probe widths") {
    val plan = planOf(SparkEntry.queries("ann_ivf_recall")(spark, dir))
    assert(
      !plan.contains("CartesianProduct"),
      s"raw cartesian in ivf recall:\n$plan")
  }

  test("pipeline_e2e composes without new exchanges beyond its stages'") {
    // curate+chunk materialize once (behind the checkpoint); the visible
    // plan is pack's lang-window, shuffle's shard-window, the example-id
    // equi-join, and the final order — nothing all-pairs, nothing
    // funneled through one partition, and no exchange count blow-up
    val plan = planOf(SparkEntry.queries("pipeline_e2e")(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition funnel in:\n$plan")
    val shuffles = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 6, s"too many exchanges ($shuffles) in:\n$plan")
  }

  test("doc_weighted_sample plans as TakeOrdered — never a global sort") {
    val plan = planOf(
      graft.operators.TextOps.weightedSample(model.table(spark, dir, "documents"), k = 100))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
    // the sample must not funnel the corpus through one partition to cut k
    assert(!plan.contains("Exchange SinglePartition"), s"single-partition sort in:\n$plan")
  }

  test("text_unigram_lm: no cartesian; totals ride a 1-row broadcast") {
    val plan = planOf(SparkEntry.queries("text_unigram_lm")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"raw cartesian in:\n$plan")
  }

  test("text_bigram_lm: no cartesian; histograms partial-aggregate before their exchange") {
    val plan = planOf(SparkEntry.queries("text_bigram_lm")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"raw cartesian in:\n$plan")
    assert(plan.contains("partial_count"), s"no map-side partial in:\n$plan")
  }

  test("dedup_source_matrix: bucket-keyed candidates, no cartesian, partial final agg") {
    val plan = planOf(SparkEntry.queries("dedup_source_matrix")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"raw cartesian in:\n$plan")
    // the source-pair rollup must partial-aggregate before its exchange
    assert(plan.contains("partial_count"), s"no map-side partial in:\n$plan")
  }

  test("orc round-trip pushes filter + pruning into the ORC scan") {
    val p = model.table(spark, dir, "part").select(
      col("p_partkey").cast("long").as("p_partkey"),
      col("p_brand"),
      col("p_retailprice").cast("double").as("p_retailprice"))
    val df = graft.sources.TabularIO.orcRoundTrip(spark, p)
      .filter(col("p_partkey") > 100)
      .select(col("p_partkey"), col("p_brand"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(p_partkey), GreaterThan(p_partkey"),
      s"no pushdown into orc scan:\n$plan")
    assert(!plan.contains("p_retailprice"), s"unpruned orc read:\n$plan")
  }

  test("dedup_substring_spans: single gram pass, no cartesian") {
    val plan = planOf(SparkEntry.queries("dedup_substring_spans")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // the windowed per-gram count tokenizes the corpus ONCE; the old
    // aggregate-then-join form showed up as a second documents scan.
    // (an executed AQE plan prints final + initial sections — count the
    // final one only)
    val finalSection = plan.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(finalSection).length
    assert(scans === 1, s"expected one documents scan, got $scans in:\n$plan")
  }

  test("sketch_kmv_per_source never funnels through a single partition") {
    val plan = planOf(SparkEntry.queries("sketch_kmv_per_source")(spark, dir))
    assert(!plan.contains("Exchange SinglePartition, ENSURE"),
      s"grouped sketch collapsed to one partition in:\n$plan")
    assert(plan.contains("hashpartitioning(source"), s"no source-keyed exchange in:\n$plan")
    // the k minima come from the bounded KMinAggregator (map-side
    // partial), never a per-group window sort of the distinct hashes
    assert(!plan.contains("Window"), s"per-group sort crept back in:\n$plan")
    assert(plan.contains("partial_kminaggregator"),
      s"k-minima heap lost its map-side partial in:\n$plan")
  }

  test("train_linreg reduces to one scan with map-side partial statistics") {
    val plan = planOf(SparkEntry.queries("train_linreg")(spark, dir))
    val finalSection = plan.split("== Initial Plan ==")(0)
    // the whole training pass is ONE lineitem scan...
    assert("Scan parquet".r.findAllIn(finalSection).length === 1,
      s"expected one lineitem scan in:\n$plan")
    // ...whose 9 sufficient statistics partial-aggregate before the exchange
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"normal-equation sums lost their map-side partial in:\n$plan")
    assert(!plan.contains("Window"), s"window crept into the solve:\n$plan")
  }

  test("sketch_hll_per_source builds registers with no pre-distinct and no window") {
    val plan = planOf(SparkEntry.queries("sketch_hll_per_source")(spark, dir))
    // HLL's whole point vs KMV: max-merge is idempotent, so the register
    // build needs NO distinct of the (source, hash) stream — the only
    // aggregates are the m-cell max and the exact-count verification column
    assert(!plan.contains("Window"), s"window crept into the register build:\n$plan")
    assert(plan.contains("partial_max"),
      s"register max lost its map-side partial in:\n$plan")
    assert(!plan.contains("Exchange SinglePartition, ENSURE"),
      s"register build collapsed to one partition in:\n$plan")
  }

  test("stored-model queries: apply/probe plans contain no training stage") {
    // bpe_apply_stored: the merge table is read from the staged model
    // artifact and folded into the expression — the plan is one corpus
    // scan + projection, with no pair-histogram aggregate anywhere
    val bpePlan = planOf(SparkEntry.queries("bpe_apply_stored")(spark, dir))
    assert(!bpePlan.contains("HashAggregate"),
      s"training aggregate in bpe apply plan:\n$bpePlan")
    // train_logreg_stored: weights + centering means fold into an
    // integer projection — no gradient or mean aggregate in serving
    val lrPlan = planOf(SparkEntry.queries("train_logreg_stored")(spark, dir))
    assert(!lrPlan.contains("HashAggregate"),
      s"training aggregate in logreg apply plan:\n$lrPlan")
    // lm_apply_stored: the vocabulary table is broadcast-joined — the
    // serving plan never exchanges on the term (no histogram rebuild)
    val lmPlan = planOf(SparkEntry.queries("lm_apply_stored")(spark, dir))
    assert(!lmPlan.contains("hashpartitioning(term"),
      s"term-keyed exchange (histogram?) in LM apply plan:\n$lmPlan")
    assert(lmPlan.contains("BroadcastHashJoin"),
      s"LM vocabulary join lost its broadcast in:\n$lmPlan")
    // ann_ivf_stored: the probe's scoring stage is checkpointed (the
    // ranked-cell table feeds both the inverted lists and the probes), so
    // the artifact scan sits behind an ExistingRDD in the final plan —
    // the no-retrain property is pinned behaviorally in ExtensionOpsSpec
    // ("stored-IVF probe follows the artifact"). Here: the probe join
    // stays cartesian-free like every other ANN path.
    val ivfPlan = planOf(SparkEntry.queries("ann_ivf_stored")(spark, dir))
    assert(!ivfPlan.contains("CartesianProduct"), s"cartesian in stored probe:\n$ivfPlan")
    // ann_pq_stored / ann_ivfpq_stored: the codebook artifacts fold in
    // as broadcast scans; no Lloyd feedback loop means no posexplode-fed
    // centroid-mean aggregate anywhere in the serving plan (the
    // no-retrain property itself is pinned behaviorally in
    // ExtensionOpsSpec "stored-PQ ADC follows the artifact")
    val pqPlan = planOf(SparkEntry.queries("ann_pq_stored")(spark, dir))
    assert(!pqPlan.contains("CartesianProduct"), s"cartesian in stored ADC:\n$pqPlan")
    assert(!pqPlan.contains("posexplode"), s"Lloyd centroid-mean stage in stored ADC:\n$pqPlan")
    val ivfpqPlan = planOf(SparkEntry.queries("ann_ivfpq_stored")(spark, dir))
    assert(!ivfpqPlan.contains("CartesianProduct"), s"cartesian in stored IVF-PQ:\n$ivfpqPlan")
    assert(!ivfpqPlan.contains("posexplode"), s"Lloyd centroid-mean stage in stored IVF-PQ:\n$ivfpqPlan")
    // doc_dsir_stored: the 16-row artifact folds into a literal lookup
    // array, so serving is ONE corpus scan and a narrow projection —
    // no join, no aggregate, no target-label second crossing
    val dsirModel = graft.operators.TextOps.writeDsirModel(
      spark, model.table(spark, dir, "documents"))
    val dsirPlan = planOf(
      graft.operators.TextOps.dsirApplyStored(
        spark, model.table(spark, dir, "documents"), dsirModel))
    val dsirScans = "Scan parquet".r.findAllIn(dsirPlan.split("== Initial Plan ==")(0)).length
    assert(dsirScans === 1, s"expected one corpus scan, got $dsirScans:\n$dsirPlan")
    assert(!dsirPlan.contains("HashAggregate"),
      s"training/histogram aggregate in DSIR serving plan:\n$dsirPlan")
    assert(!dsirPlan.contains("Join"), s"join in DSIR serving plan:\n$dsirPlan")
    graft.sources.Staging.cleanup(spark)
  }

  test("dedup_semantic: pair stage joins on the cell id — no corpus all-pairs") {
    val plan = planOf(SparkEntry.queries("dedup_semantic")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"unblocked all-pairs in:\n$plan")
    // the only self-join key is the k-means cell — the SemDeDup blocking
    assert(plan.contains("cid"), s"cell-keyed pair join missing in:\n$plan")
  }

  test("ann_ivfpq_rerank: exact tail reads vectors via a broadcast candidate join") {
    val plan = planOf(SparkEntry.queries("ann_ivfpq_rerank")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"cartesian in re-rank:\n$plan")
    // the nQueries×nCand candidate list must ride a broadcast against the
    // corpus scan — the refinement's vector reads stay candidate-bounded
    assert(plan.contains("BroadcastHashJoin"), s"candidate join lost its broadcast in:\n$plan")
  }

  test("doc_ppl_buckets / doc_budget_select: lang-partitioned windows, totals broadcast") {
    val bPlan = planOf(SparkEntry.queries("doc_ppl_buckets")(spark, dir))
    assert(bPlan.contains("hashpartitioning(lang"), s"no lang-keyed window exchange in:\n$bPlan")
    val sPlan = planOf(SparkEntry.queries("doc_budget_select")(spark, dir))
    assert(sPlan.contains("hashpartitioning(lang"), s"no lang-keyed window exchange in:\n$sPlan")
    assert(sPlan.contains("BroadcastHashJoin"), s"lang totals not broadcast in:\n$sPlan")
  }

  test("source_kl_drift sums integer micro-units — no per-source vocab-sized fold buffer") {
    val plan = planOf(SparkEntry.queries("source_kl_drift")(spark, dir))
    assert(!plan.contains("collect_list"), s"vocab-sized aggregation buffer in:\n$plan")
    assert(plan.contains("partial_sum"), s"KL sum has no map-side partial in:\n$plan")
  }

  test("split_leakage: no cartesian; train-gram distinct partial-aggregates below its exchange") {
    val plan = planOf(SparkEntry.queries("split_leakage")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(h#"), s"no gram-hash exchange in:\n$plan")
  }

  test("doc_quality_filter: per-source counts ride a broadcast, rank keys on source") {
    val plan = planOf(SparkEntry.queries("doc_quality_filter")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"counts not broadcast in:\n$plan")
    assert(plan.contains("hashpartitioning(source"), s"no source-keyed exchange in:\n$plan")
  }

  test("sketch_cms_tokens: cell build partial-aggregates; probe joins on (row, bucket)") {
    val plan = planOf(SparkEntry.queries("sketch_cms_tokens")(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // the d×w cell aggregate must fold map-side before its exchange —
    // this partial IS the O(d·w)-memory property that justifies a CMS
    assert(plan.contains("partial_sum"), s"no map-side partial in cell build:\n$plan")
  }

  test("events_anomaly: fence table rides a broadcast, outlier count partial-aggregates") {
    val plan = planOf(SparkEntry.queries("events_anomaly")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"fences not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("partial_sum"), s"outlier count has no map-side partial:\n$plan")
  }

  test("corpus_scd2 ships each version row exactly once: key exchanges only, no joins") {
    val plan = planOf(SparkEntry.queries("corpus_scd2")(spark, dir))
    assert(!plan.contains("Join"), s"scd2 needs no join:\n$plan")
    // the only hash exchange is the window's, keyed on doc_id (the AQE
    // plan string repeats it across initial/final sections — assert the
    // key, not the count)
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("hashpartitioning(doc_id")),
      s"non-key exchange in:\n${exchanges.mkString("\n")}")
  }

  test("whole-stage codegen spans the relational aggregation path") {
    // (the text operators' higher-order array expressions are interpreted
    // by Spark — no codegen exists for lambda functions — but stay
    // UDF-free: no serialization boundary, and the per-row hot loops that
    // matter [hashing, dot products] are the custom codegen'd
    // PolyHash/DotProduct expressions)
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, dir))
    // the *(n) stage markers are the simple-string form of WholeStageCodegen spans
    assert(plan.contains("*(1) HashAggregate"), plan)
  }

  test("ann_sq_stored serving plan is train-free; bm25 top-k is a TakeOrdered") {
    // stored-SQ serving: the artifact folds in as a broadcast single-row
    // aggregate — no posexplode means no min/max TRAIN stage in the plan
    // (serving-follows-the-artifact is pinned behaviorally in
    // ExtensionOpsSpec "stored-SQ serving follows the artifact")
    val sqPlan = planOf(SparkEntry.queries("ann_sq_stored")(spark, dir))
    assert(!sqPlan.contains("posexplode"), s"train (min/max) stage in stored-SQ serving:\n$sqPlan")
    assert(!sqPlan.contains("CartesianProduct"), s"cartesian in stored-SQ serving:\n$sqPlan")
    // bm25: global top-k must be a TakeOrdered (map-side partial top-k),
    // never a full sort of the scored docs; the query-term and corpus-stat
    // sides must not force a cartesian
    val bmPlan = planOf(SparkEntry.queries("text_bm25_topk")(spark, dir))
    assert(bmPlan.contains("TakeOrderedAndProject"), s"bm25 top-k is a full sort:\n$bmPlan")
    assert(!bmPlan.contains("CartesianProduct"), s"cartesian in bm25:\n$bmPlan")
    // stored-BM25 serving: terms filter to the query list BEFORE the tf
    // aggregate, so the corpus is exploded exactly once and there is no
    // vocabulary-wide df aggregate — pinned as a single Generate node
    // (count in the final plan only — AQE's toString repeats the tree
    // under "== Initial Plan ==")
    val bmsPlan = planOf(SparkEntry.queries("text_bm25_stored")(spark, dir))
      .split("== Initial Plan ==")(0)
    val generates = bmsPlan.split("\n").count(_.contains("Generate"))
    assert(generates === 1, s"stored-BM25 serving must explode the corpus once, saw $generates:\n$bmsPlan")
    // external-query BM25: same single-crossing serving shape — one
    // Generate, the ≤|terms| query list broadcast, top-k a TakeOrdered
    val bmqPlan = planOf(SparkEntry.queries("text_bm25_query")(spark, dir))
      .split("== Initial Plan ==")(0)
    val qGenerates = bmqPlan.split("\n").count(_.contains("Generate"))
    assert(qGenerates === 1, s"query-BM25 serving must explode the corpus once, saw $qGenerates:\n$bmqPlan")
    assert(bmqPlan.contains("TakeOrderedAndProject"), s"query-BM25 top-k is a full sort:\n$bmqPlan")
    graft.sources.Staging.cleanup(spark)
  }

  test("graph_landmark_stored serving plan is sweep-free") {
    // the BFS loop runs inside writeLandmarkModel (before the serving
    // plan exists); the returned plan must be artifact scan + triangle
    // fold only — no checkpointed iteration state (ExistingRDD), no loop
    val plan = planOf(SparkEntry.queries("graph_landmark_stored")(spark, dir))
    assert(!plan.contains("ExistingRDD"), s"iteration state leaked into serving plan:\n$plan")
    assert(plan.contains("Scan parquet"), s"serving must read the stored landmark table:\n$plan")
    graft.sources.Staging.cleanup(spark)
  }

  test("round-9 operators: no cartesians, bounded state, single-scan where promised") {
    // containment shares the capped-inverted-index shape — never all-pairs
    val contPlan = planOf(SparkEntry.queries("dedup_containment")(spark, dir))
    assert(!contPlan.contains("CartesianProduct"), s"cartesian in containment:\n$contPlan")
    // per-doc top terms: bounded per-doc sort, NO corpus window rank
    val ttPlan = planOf(SparkEntry.queries("text_top_terms")(spark, dir))
    assert(!ttPlan.contains("Window"), s"corpus window crept into top-terms:\n$ttPlan")
    // bootstrap CI: ONE corpus scan, no per-resample explode
    val bootPlan = planOf(SparkEntry.queries("metric_bootstrap_ci")(spark, dir))
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(bootPlan).length === 1,
      s"bootstrap must read the corpus once:\n$bootPlan")
    assert(!bootPlan.contains("Generate"), s"per-resample explode in bootstrap:\n$bootPlan")
    // dim stats: one embeddings scan; the only Generate is the 1-row
    // unpivot AFTER the aggregate
    val dsPlan = planOf(SparkEntry.queries("emb_dim_stats")(spark, dir))
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(dsPlan).length === 1,
      s"dim stats must read embeddings once:\n$dsPlan")
    // HITS rounds: edge joins + hash aggregates, never a cartesian
    val hitsPlan = planOf(SparkEntry.queries("graph_hits")(spark, dir))
    assert(!hitsPlan.contains("CartesianProduct"), s"cartesian in HITS:\n$hitsPlan")
    // the composed modern pipeline inherits every stage's shape —
    // in particular no stage degrades to an all-pairs product
    val pmPlan = planOf(SparkEntry.queries("pipeline_modern")(spark, dir))
    assert(!pmPlan.contains("CartesianProduct"), s"cartesian in pipeline_modern:\n$pmPlan")
    // link prediction: wedge join keys on the shared neighbor
    val lpPlan = planOf(SparkEntry.queries("graph_link_pred")(spark, dir))
    assert(!lpPlan.contains("CartesianProduct"), s"cartesian in link prediction:\n$lpPlan")
    assert(lpPlan.contains("TakeOrdered"), s"top-k lost its TakeOrdered:\n$lpPlan")
    graft.sources.Staging.cleanup(spark)
  }

  test("decontam gate: arrival shingles hit the Bloom literal predicate before any join/exchange") {
    import graft.operators.{Phys, TextOps}
    import graft.streaming.StreamOps
    val docs = model.table(spark, dir, "documents")
    val firstNewId = 400L
    val staticSh = StreamOps.decontamShingles(docs.filter(col("doc_id") < firstNewId))
    val bench = staticSh
      .filter(pmod(col("doc_id"), lit(TextOps.BenchmarkMod)) === 0)
      .select(col("g")).distinct()
    val hot = staticSh
      .filter(pmod(col("doc_id"), lit(TextOps.BenchmarkMod)) =!= 0)
      .join(bench, Seq("g"), "left_semi")
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > TextOps.DecontamMaxDf).select(col("g"))
    val store = Phys.materialized(bench.join(hot, Seq("g"), "left_anti"))
    val bloom = graft.operators.BloomJoin.bloomBytes(store, col("g"), 100000L)
    // the same arrival-side builder the streaming micro-batches execute,
    // driven by a batch input so the executed plan is inspectable
    val gated = StreamOps.decontamArrivalPlan(docs, store, bloom, firstNewId)
    val plan = planOf(gated)
    assert(plan.contains("might_contain"), s"Bloom prefilter missing from the plan:\n$plan")
    // printed top-down: the join appears above (before) its child filter,
    // so execution applies might_contain BEFORE the join — and the filter
    // is a literal predicate, never an exchange or a state store
    val joinAt = plan.indexOf("LeftSemi")
    val bloomAt = plan.indexOf("might_contain")
    assert(joinAt >= 0 && bloomAt > joinAt,
      s"prefilter is not below the semi join:\n$plan")
    // exactness: the Bloom-prefiltered gate publishes the identical rows
    // as the plain exact semi join (no false negatives by construction)
    val plain = StreamOps
      .decontamShingles(docs.filter(
        col("doc_id") >= firstNewId && pmod(col("doc_id"), lit(TextOps.BenchmarkMod)) =!= 0))
      .join(store, Seq("g"), "left_semi")
      .groupBy(col("doc_id"), col("source")).agg(count(lit(1)).as("n_hits"))
    val a = gated.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = plain.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a === b, "Bloom prefilter changed the published rows")
    graft.sources.Staging.cleanup(spark)
  }

  test("graph_harmonic / graph_anf_est ship sketch-only: no (u,v) pair join in ANY executed plan") {
    // the exact first-reach side-car advances by a LeftAnti join of the
    // frontier expansion against the reach pair table — the quadratic
    // term the production queries must never execute. Every plan the
    // query runs (the loop's per-round checkpoints included) is captured
    // via a QueryExecutionListener and checked.
    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Seq("graph_harmonic", "graph_anf_est").foreach { q =>
        plans.synchronized(plans.clear())
        val out = SparkEntry.queries(q)(spark, dir)
        out.collect()
        // the listener bus is async — give in-flight callbacks a moment
        Thread.sleep(2000)
        val all = plans.synchronized(plans.toSeq)
        assert(all.nonEmpty, s"$q: listener captured no plans")
        all.foreach { p =>
          assert(!p.contains("LeftAnti"), s"$q executed a pair-table anti join:\n$p")
          assert(!p.contains("CartesianProduct"), s"$q executed a cartesian:\n$p")
        }
        // and the published schema carries no exact column
        assert(!out.columns.contains("harm_exact_micro") && !out.columns.contains("n_pairs_exact"))
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("round-10 operators: blocked/bucketed joins only, no cartesians") {
    // er_blocked_pairs: the pair join must key on the blocking columns
    // (a cartesian would be the |R|² compare blocking exists to avoid);
    // text_pmi_bigrams: word-keyed joins + a broadcast of the 1-row
    // totals — no raw cartesian; events_ks_drift/events_psi: bounded
    // histogram pipelines, no all-pairs anything
    Seq("er_blocked_pairs", "text_pmi_bigrams", "events_psi", "events_ks_drift")
      .foreach { q =>
        val plan = planOf(SparkEntry.queries(q)(spark, dir))
        assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
      }
    val er = planOf(SparkEntry.queries("er_blocked_pairs")(spark, dir))
    assert(
      er.contains("SortMergeJoin") || er.contains("BroadcastHashJoin") ||
        er.contains("ShuffledHashJoin"),
      s"er pair join is not an equi-join:\n$er")
  }

  test("ks drift windows over the compressed histogram, not raw events") {
    // the running-sum window must consume the (type, value) hash
    // aggregate's output — an event-grain window would sort the corpus
    val df = SparkEntry.queries("events_ks_drift")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, s"no window in ks plan:\n$plan")
    // at least one HashAggregate must appear BELOW the window operator
    // in the plan tree (printed after it in the string form)
    assert(
      plan.indexOf("HashAggregate", winIdx) > winIdx,
      s"window not fed by the histogram aggregate:\n$plan")
  }

  test("ivf health: centroid artifact broadcast, no window in the argmax") {
    val embsDf = model.table(spark, dir, "embeddings")
    val modelDir = graft.operators.Similarity.writeIvfModel(spark, embsDf)
    val plan = planOf(graft.operators.Similarity.ivfHealth(spark, embsDf, modelDir))
    assert(!plan.contains("CartesianProduct"), s"raw cartesian in health scan:\n$plan")
    assert(!plan.contains("Window"), s"argmax regressed to a window:\n$plan")
    graft.sources.Staging.cleanup(spark)
  }

  test("late-wave operators: no cartesians; basket pairs join on the order key") {
    Seq(
      "orders_basket_rules", "orders_rfm_segments", "lineitem_abc", "lineitem_gini",
      "orders_cohort_ltv", "events_seasonality", "events_survival_km",
      "events_drift_report", "text_jsd_sources", "tok_vocab_coverage")
      .foreach { q =>
        val plan = planOf(SparkEntry.queries(q)(spark, dir))
        assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
      }
    // the basket pair join must be an equi-join (keyed on the order),
    // not a nested-loop over parts
    val basket = planOf(SparkEntry.queries("orders_basket_rules")(spark, dir))
    assert(
      basket.contains("SortMergeJoin") || basket.contains("ShuffledHashJoin") ||
        basket.contains("BroadcastHashJoin"),
      s"basket pair join is not an equi-join:\n$basket")
  }

  test("round-11 operators: no cartesians outside declared broadcast scalars") {
    // the new analytics/layout/eval wave must stay equi-join/bucketed:
    // a cartesian anywhere here is a scale bug (the only sanctioned
    // nested-loops are broadcasts of 1-row aggregates, which plan as
    // BroadcastNestedLoopJoin, never CartesianProduct)
    Seq(
      "pii_t_closeness", "train_logreg_auc", "events_acf", "events_changepoint",
      "layout_compaction_plan", "layout_prune_report", "docs_domain_cap",
      "sample_neyman_alloc", "events_concurrency", "events_winsorized",
      "events_markov_eval", "dq_functional_deps", "events_attribution",
      "events_ab_test", "pii_sensitivity", "pii_contribution_cap",
      "tok_wordpiece", "join_agg_incremental", "corpus_time_travel",
      "dq_profile_drift", "events_snaive_eval")
      .foreach { q =>
        val plan = planOf(SparkEntry.queries(q)(spark, dir))
        assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
      }
  }

  test("round-12 wave: no cartesians outside declared broadcast scalars") {
    // TextRank, embedding eval, DP release, lattice selection, the
    // TPC-H completions, FS lift, audio landmarks, Yannakakis, nDCG —
    // the only sanctioned nested-loops are broadcast 1-row/k-row
    // scalars (BroadcastNestedLoopJoin), never CartesianProduct
    Seq(
      "text_textrank", "graph_embed_linkpred", "pii_dp_counts", "cube_view_select",
      "q2_min_cost_supplier", "q11_important_stock", "q16_supplier_cnt",
      "q20_excess_suppliers", "er_agreement_lift", "multimodal_audio_match",
      "join_yannakakis", "ann_ndcg")
      .foreach { q =>
        val plan = planOf(SparkEntry.queries(q)(spark, dir))
        assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
      }
  }

  test("round-13 wave: packing single-scan, CDC co-keyed, prefix filter cartesian-free") {
    // packing: ONE documents scan each (a narrow map + windows/fold)
    Seq("docs_seq_pack", "docs_pack_nextfit").foreach { q =>
      val plan = planOf(SparkEntry.queries(q)(spark, dir)).split("== Initial Plan ==")(0)
      assert("Scan parquet".r.findAllIn(plan).length === 1,
        s"$q must read documents once:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in $q:\n$plan")
    }
    // the remaining wave: equi-joins / broadcast scalars only
    Seq(
      "events_cdc_diff", "events_paths", "dedup_prefix_jaccard", "join_size_cms",
      "opt_selectivity_hist", "graph_katz")
      .foreach { q =>
        val plan = planOf(SparkEntry.queries(q)(spark, dir))
        assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
      }
    // KMV cardinality: the k smallest hashes come from a TakeOrdered,
    // never a global sort of the key column
    val kmvPlan = planOf(SparkEntry.queries("opt_groupby_card")(spark, dir))
    assert(kmvPlan.contains("TakeOrdered"), s"KMV lost its TakeOrdered:\n$kmvPlan")
    assert(!kmvPlan.contains("CartesianProduct"), s"cartesian in opt_groupby_card:\n$kmvPlan")
    graft.sources.Staging.cleanup(spark)
  }

  test("TPC-H report shapes + round-11b wave: equi-joins only, Q18 having-filter precedes the dim joins") {
    Seq(
      "q6_forecast", "q5_local_supplier", "q4_priority", "q14_promo", "q18_big_orders",
      "q7_nation_volume", "q8_market_share", "q17_small_qty", "q19_brackets",
      "q13_order_counts", "q15_top_supplier", "q9_profit", "q12_latency_mix",
      "events_gap_sweep", "ann_recall_at_k",
      "q19_brackets", "dedup_minhash_pr", "multimodal_frame_dedup", "er_clusters",
      "text_rake_keywords", "train_logreg_cv", "events_holt_eval", "ann_kmeans_elbow",
      "orders_moving_avg")
      .foreach { q =>
        val plan = planOf(SparkEntry.queries(q)(spark, dir))
        assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
      }
    // Q4's EXISTS must stay a semi-join (one bit per order, never a widening join)
    val q4 = planOf(SparkEntry.queries("q4_priority")(spark, dir))
    assert(q4.contains("LeftSemi"), s"q4 EXISTS lost its semi-join:\n$q4")
    // Q18: the qty aggregate + having must run before orders/customer join —
    // only qualifying orders reach the dimension side
    val q18 = SparkEntry.queries("q18_big_orders")(spark, dir)
    q18.collect()
    val p18 = q18.queryExecution.executedPlan.toString
    val joinIdx = p18.indexOf("Join")
    val aggIdx = p18.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"q18 having-aggregate does not precede the joins:\n$p18")
  }

  test("winsorized/markov eval window over compressed tables, not raw events") {
    // winsorized: the cumulative window must consume the (type, milli)
    // histogram aggregate — an event-grain window would sort the stream
    val w = SparkEntry.queries("events_winsorized")(spark, dir)
    w.collect()
    val wPlan = w.queryExecution.executedPlan.toString
    val winIdx = wPlan.indexOf("Window")
    assert(winIdx >= 0 && wPlan.indexOf("HashAggregate", winIdx) > winIdx,
      s"winsorized window not fed by the histogram:\n$wPlan")
    // markov eval: the argmax window runs over the transition-count
    // aggregate (|types|² rows), and the model joins back as a broadcast
    val m = planOf(SparkEntry.queries("events_markov_eval")(spark, dir))
    assert(m.contains("BroadcastHashJoin"), s"markov model join lost its broadcast:\n$m")
  }

  test("wordpiece runs on the distinct-word histogram: no corpus scan in the encode steps") {
    // the encode fold must consume ONE corpus scan (the histogram);
    // every unrolled step is a narrow projection over |distinct words|
    val df = SparkEntry.queries("tok_wordpiece")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.split("\n").count(_.contains("Scan parquet"))
    assert(scans <= 2, s"wordpiece reads the corpus $scans times:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"wordpiece cartesian:\n$plan")
  }

  test("round-13 wave: no cartesians outside declared broadcast scalars") {
    // bounded-scalar crossJoins (a 1-row model/moment table) plan as
    // BroadcastNestedLoopJoin, never CartesianProduct — the audit that
    // keeps a refactor from silently materializing a pair table.
    // events_mann_kendall is EXCLUDED by declaration: its day-pair
    // inequality join is a C(days,2) cartesian over the retention-
    // bounded daily table (30 rows at any SF) — bounded by design,
    // like the scalar crossJoins, just not broadcast-1-row.
    Seq(
      "eval_pass_at_k", "train_cooks_distance", "emb_cka", "docs_pack_xdoc",
      "events_cuped", "stats_james_stein",
      "dedup_soft_weights").foreach { q =>
      val plan = planOf(SparkEntry.queries(q)(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
    }
  }

  test("bqTopK ranks the Hamming scan with the bounded heap — no window anywhere in its plan") {
    val embsDf = model.table(spark, dir, "embeddings")
    val plan = planOf(graft.operators.Similarity.bqTopK(embsDf, nQueries = 5, k = 3))
    assert(!plan.contains("Window"),
      s"the |q|x|corpus| Hamming scan must never feed a window sort:\n$plan")
  }

  test("graph_msf contracts on equi-joins; stress levels join on node keys") {
    Seq("graph_msf", "graph_stress").foreach { q =>
      val plan = planOf(SparkEntry.queries(q)(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian:\n$plan")
    }
  }

  test("events_did is one fact scan into a 4-cell partial aggregate — no window, no data-scale join") {
    val plan = planOf(SparkEntry.queries("events_did")(spark, dir))
    assert(!plan.contains("Window"), s"DiD needs no window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"the bounds join must broadcast:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"bounds must ride a broadcast:\n$plan")
    // the cells reduce map-side: exactly one hash-partitioned exchange
    // (the 4-cell final aggregate), nothing data-scale after the scan
    val shuffles = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(shuffles === 0, s"cell aggregate must ride the single-partition path:\n$plan")
  }

  test("page-hinkley windows run over the bounded daily series, below the day aggregate") {
    val df = SparkEntry.queries("events_page_hinkley")(spark, dir)
    val plan = planOf(df)
    // the day aggregate must sit BELOW the windows: a window over raw
    // events would single-partition the corpus; over ≤|days| rows it is
    // the documented bounded shape
    val lines = plan.split("\n")
    val firstWindow = lines.indexWhere(_.contains("Window"))
    val lastAgg = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(firstWindow >= 0 && lastAgg > firstWindow,
      s"day aggregate must feed the windows (window@$firstWindow agg@$lastAgg):\n$plan")
  }

  test("tok_unigram_stored serving joins the broadcast artifact — no DP columns in the plan") {
    val docsDf = model.table(spark, dir, "documents")
    val modelDir = graft.operators.Tokenization.writeUnigramModel(spark, docsDf)
    val plan = planOf(
      graft.operators.Tokenization.unigramFertilityStored(spark, docsDf, modelDir))
    assert(plan.contains("BroadcastHashJoin"), s"segment map lost its broadcast:\n$plan")
    assert(!plan.contains("v_16") && !plan.contains("s_16_4"),
      s"trainer DP columns leaked into the serving plan:\n$plan")
    graft.sources.Staging.cleanup(spark)
  }
}
