package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.StreamOps

/** Batch/stream parity for the windowed event aggregation: the streaming
  * query over the same parquet directory must converge to exactly the
  * batch result.
  */
class StreamOpsSpec extends SparkSpec {

  test("stateful streaming sessionizer closes sessions on gap and on timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def at(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L) // 2024-01-01T00:00Z
    val input = MemoryStream[StreamOps.SessionEvent]
    val q = StreamOps
      .sessionizeStream(spark, input.toDS(), gapMinutes = 30, watermarkDelay = "5 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .start()

    // batch 1: two events 10min apart (one open session for user 7)
    input.addData(
      StreamOps.SessionEvent(7L, at(0), 1.0),
      StreamOps.SessionEvent(7L, at(10), 2.0))
    q.processAllAvailable()
    // batch 2: event at +60min → gap 50min > 30min closes session 1 inline
    input.addData(StreamOps.SessionEvent(7L, at(60), 5.0))
    q.processAllAvailable()
    // batch 3: another user far in the future → watermark passes user 7's
    // session-2 timeout → emitted via the timeout path
    input.addData(StreamOps.SessionEvent(8L, at(500), 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_out").as[StreamOps.ClosedSession].collect()
      .map(c => (c.user_id, c.session_start_ms, c.n_events, c.sum_value)).toSet
    assert(out.contains((7L, at(0).getTime, 2L, 3.0))) // gap-closed
    assert(out.contains((7L, at(60).getTime, 1L, 5.0))) // timeout-closed
  }

  test("streaming sliding agg equals batch sliding agg at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventOps
      .sliding(model.eventsTable(spark, dir))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val staged = java.nio.file.Files.createTempDirectory("stream-events-sliding")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val q = EventOps
      .sliding(StreamOps.readEventStream(spark, staged.toString).withWatermark("ts", "20 minutes"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("sliding_parity_test")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sliding_parity_test")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream interval join equals the batch interval join at sf0.001") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ev = model.eventsTable(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(
        c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = StreamOps.intervalJoinOverParquet(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("watermark-bounded streaming dedup equals exact batch distinct at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = model.eventsTable(spark, dir)
      .dropDuplicates("event_type", "user_id", "ts", "value")
      .groupBy("event_type")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSet
    val ww = StreamOps.dedupWithinWatermarkOverParquet(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSet
    assert(ww === batch)
    assert(batch.nonEmpty)
  }

  test("stream-static anti-join dedup equals the batch anti-join at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = model.table(spark, dir, "documents")
    val store = docs
      .filter(col("doc_id") < 400)
      .select(graft.functions.Parity.fp40(col("text")).as("fp"))
      .distinct()
    val batch = docs
      .filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("source"), graft.functions.Parity.fp40(col("text")).as("fp"))
      .join(store, Seq("fp"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_new"), min(col("doc_id")).as("first_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val streamed = StreamOps
      .docDedupOverParquet(spark, dir, firstNewId = 400L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming embedding ingest equals the batch probe of the static IVF index") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val static = embs.filter(col("vec_id") < 400L)
    val cents = Similarity.kmeansFixed(static)
    val lists = Similarity.invertedLists(static, cents)
    val centSeq = cents.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val batch = embs
      .filter(col("vec_id") >= 400L)
      .select(
        col("vec_id"),
        col("embedding").cast("array<double>").as("qe"),
        explode(Similarity.probeCellsExpr(col("embedding"), centSeq, 2)).as("pc"))
      .select(col("vec_id"), col("qe"), col("pc.cid").as("cid"))
      .join(lists, Seq("cid"))
      .select(
        col("vec_id").as("q_id"),
        col("n_id"),
        round(graft.functions.Parity.cosine(col("qe"), col("ne")), 6).as("cos"))
      .groupBy(col("q_id"))
      .agg(max(struct(col("cos"), (-col("n_id")).as("nn"))).as("sel"))
      .select(col("q_id"), (-col("sel.nn")).as("n_id"), col("sel.cos").as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val streamed = StreamOps
      .embIvfIngestOverParquet(spark, dir, firstNewId = 400L, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed === batch)
    assert(streamed.size === 100, "every arriving vector must be matched")
    assert(streamed.forall { case (q, n, _) => q >= 400L && n < 400L },
      "matches must pair an arriving query with a static neighbor")
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming landmark extension equals the batch one-hop extension at sf0.001") {
    import graft.operators.GraphOps
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val firstNew = li.agg(max(col("l_orderkey").cast("long"))).head().getLong(0) * 9L / 10L
    val staticE = li
      .filter(col("l_orderkey").cast("long") < firstNew)
      .select(
        col("l_orderkey").cast("long").as("src"),
        col("l_partkey").cast("long").as("dst"))
    val und = staticE.unionAll(staticE.select(col("dst").as("src"), col("src").as("dst")))
    val lm = GraphOps
      .landmarkDistances(und, nLandmarks = 8, rounds = 4)
      .select(col("id").as("v"), col("landmark"), col("dist").as("dv"))
    val known = staticE
      .select(col("src").as("id"))
      .unionAll(staticE.select(col("dst").as("id")))
      .distinct()
    val batch = li
      .filter(col("l_orderkey").cast("long") >= firstNew)
      .select(
        col("l_orderkey").cast("long").as("id"),
        col("l_partkey").cast("long").as("v"))
      .join(known, Seq("id"), "left_anti")
      .join(lm, Seq("v"))
      .groupBy(col("id"), col("landmark"))
      .agg(min(col("dv") + 1L).as("dist"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val streamed = StreamOps
      .landmarkExtendOverParquet(spark, dir, nLandmarks = 8, rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty, "arriving orders must extend the landmark table")
    assert(
      streamed.forall { case (id, l, d) => id >= firstNew && l >= 1 && l <= 8 && d >= 1 },
      "extensions must be new nodes, valid landmarks, and at least one hop out")
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming quality gate equals the batch stored-classifier rollup at sf0.001") {
    import graft.operators.Training
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // batch formulation: train on the static slice, score arrivals with
    // the stored artifact, roll up accepts per source
    val modelDir = Training.writeFasttextModel(spark, docs.filter(col("doc_id") < 400L))
    val batch = Training
      .fasttextApplyStored(spark, docs.filter(col("doc_id") >= 400L), modelDir)
      .groupBy()
      .agg(count(lit(1)).as("n"), sum(col("pred")).as("acc"))
      .head()
    val streamed = StreamOps
      .docQualityGateOverParquet(spark, dir, firstNewId = 400L)
      .agg(sum(col("n_docs")), sum(col("n_accepted")))
      .head()
    assert(streamed.getLong(0) === batch.getLong(0))
    assert(streamed.getLong(1) === batch.getLong(1))
    graft.sources.Staging.cleanup(spark)
  }

  test("quality-gate file sink equals the memory-sink gate; batch replay is idempotent") {
    val dir = "/root/testdata/sf0.001"
    val viaSink = StreamOps
      .docQualityGateSinkOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaMemory = StreamOps
      .docQualityGateOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaSink === viaMemory, "the durable-table rollup must equal the memory-sink gate")

    // exactly-once: re-running a batch (post-crash replay) rewrites its
    // own partition — the table's contents are IDENTICAL after
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("docgate-sink-spec").toString
    val b0 = Seq((401L, "web", 5L), (402L, "web", -3L)).toDF("doc_id", "source", "score_micro")
    val b1 = Seq((403L, "api", 7L)).toDF("doc_id", "source", "score_micro")
    StreamOps.upsertDocGateBatch(b0, 0L, sink)
    StreamOps.upsertDocGateBatch(b1, 1L, sink)
    // partition-dir values infer as INT on a bare read — normalize
    def tableRows() =
      spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getAs[Number]("batch_id").longValue())).toSet
    val once = tableRows()
    assert(once.size === 3)
    StreamOps.upsertDocGateBatch(b0, 0L, sink) // the replay
    assert(tableRows() === once, "a replayed batch must not duplicate or drop rows")
    // and a replay never touches OTHER batches' partitions
    assert(tableRows().exists(_._4 === 1L))
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming decay state halves per elapsed day: hand-computed fold on crafted events") {
    import spark.implicits._
    val day = 86400L * 1000000L // micros
    val base = 1700000000000000L
    val events = Seq(
      // user 1: v=8 at t0, v=2 one day later, v=4 two more days later
      (1L, new java.sql.Timestamp(base / 1000), 1L, "view", 0.008, "{}"),
      (2L, new java.sql.Timestamp((base + day) / 1000), 1L, "view", 0.002, "{}"),
      (3L, new java.sql.Timestamp((base + 3 * day) / 1000), 1L, "view", 0.004, "{}"),
      // user 2: single event
      (4L, new java.sql.Timestamp(base / 1000), 2L, "view", 0.005, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-decay").toString
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp")
    val f = new java.io.File(s"$dir/tmp").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val out = StreamOps.userDecayOverParquet(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // user 1: ((8/1 → 8)/2 + 2 = 6) / 4 + 4 = 5.5 ; user 2: 5
    assert(out(1L) === ((3L, 5.5)))
    assert(out(2L) === ((1L, 5.0)))
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming DSIR gate equals the batch stored-model selection rollup at sf0.001") {
    import graft.operators.TextOps
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // batch formulation: train on the static slice, serve the arrivals
    // from the stored artifact, count llr>0 selections
    val modelDir = TextOps.writeDsirModel(spark, docs.filter(col("doc_id") < 400L))
    val batch = TextOps
      .dsirApplyStored(spark, docs.filter(col("doc_id") >= 400L), modelDir)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("llr") > 0.0d, 1L).otherwise(0L)).as("sel"))
      .head()
    val streamed = StreamOps
      .docDsirGateOverParquet(spark, dir, firstNewId = 400L)
      .agg(sum(col("n_docs")), sum(col("n_selected")))
      .head()
    assert(streamed.getLong(0) === batch.getLong(0))
    assert(streamed.getLong(1) === batch.getLong(1))
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming anomaly gate equals the batch fence-count at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val out = StreamOps.anomalyIngestOverParquet(spark, dir, firstNewId = 800L).collect()
    assert(out.length === 5) // one row per event type
    out.foreach { r =>
      assert(r.getDouble(1) < r.getDouble(2), "lo_fence < hi_fence")
      assert(r.getLong(4) <= r.getLong(3), "outliers ≤ arrivals")
    }
    // arriving slice is event_id ∈ [800, 1000) → 200 events in total
    assert(out.map(_.getLong(3)).sum === 200L)
    graft.sources.Staging.cleanup(spark)
  }

  test("transformWithState running totals equal the batch group-by") {
    val dir = "/root/testdata/sf0.001"
    val batch = model
      .eventsTable(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val streamed = StreamOps
      .userTotalsOverParquet(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming CDC churn report equals the batch snapshot diff at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = operators.EventOps
      .cdcDiff(model.eventsTable(spark, dir))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val streamed = StreamOps
      .cdcOverParquet(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(streamed.map(_._1) === Set("insert", "update", "unchanged"))
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming next-fit packing equals the batch fold at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = operators.Packing
      .packNextFit(spark.read.parquet(s"$dir/documents.parquet"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .toSet
    val streamed = StreamOps
      .packOverParquet(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming funnel: a late early view retroactively unlocks later steps") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    spark.conf
      .set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Long, String)]
      val ckpt = java.nio.file.Files.createTempDirectory("funnel-ckpt")
      val q = input
        .toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.FunnelProcessor,
          TimeMode.None(),
          OutputMode.Update())
        .toDF("user_id", "furthest_step")
        .writeStream
        .outputMode("update")
        .format("memory")
        .option("checkpointLocation", ckpt.toString)
        .queryName("funnel_out")
        .start()
      try {
        // batch 1: click then purchase but NO view yet → step 0 — the
        // exact case an incremental min-tuple gets permanently wrong
        input.addData((7L, 100L, "click"), (7L, 200L, "purchase"))
        q.processAllAvailable()
        // batch 2: the view arrives LATE with an EARLIER timestamp —
        // the retained log re-derives view@50 → click@100 → purchase@200
        input.addData((7L, 50L, "view"))
        q.processAllAvailable()
        val rows = spark.table("funnel_out").collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.contains((7L, 0L)), "batch 1 must see no funnel entry")
        assert(rows.last === ((7L, 3L)), "the late view must unlock all three steps")
      } finally q.stop()
    } finally spark.conf.set(key, prev)
  }

  test("streaming PSI gate equals the batch drift monitor at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventOps
      .psiDrift(model.eventsTable(spark, dir))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val streamed = StreamOps
      .psiGateOverParquet(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming seasonality equals the batch hour profile at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def canon(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val batch = EventOps.seasonality(model.eventsTable(spark, dir)).collect().map(canon).toSet
    val streamed = StreamOps.seasonalityOverParquet(spark, dir).collect().map(canon).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming CUSUM gate equals the batch changepoint monitor at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def canon(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))
    val batch = EventOps.cusumDrift(model.eventsTable(spark, dir)).collect().map(canon).toSet
    val streamed = StreamOps.cusumGateOverParquet(spark, dir).collect().map(canon).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming tumbling agg equals batch tumbling agg at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventOps
      .tumbling(model.eventsTable(spark, dir))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // file-stream sources need a directory; stage the single parquet file
    val staged = java.nio.file.Files.createTempDirectory("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val streamed = StreamOps
      .runToCompletion(spark, staged.toString, "stream_parity_test")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming decontamination gate equals the batch shingle-overlap rollup at sf0.001") {
    import graft.operators.TextOps
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def sh(d: org.apache.spark.sql.DataFrame) = d.select(
      col("doc_id"),
      col("source"),
      explode(graft.functions.ShingleStrings(split(col("text"), "\\s+"), distinct = true))
        .as("g"))
    val staticSh = sh(docs.filter(col("doc_id") < 400L))
    val bench = staticSh
      .filter(pmod(col("doc_id"), lit(TextOps.BenchmarkMod)) === 0)
      .select(col("g")).distinct()
    val hot = staticSh
      .filter(pmod(col("doc_id"), lit(TextOps.BenchmarkMod)) =!= 0)
      .join(bench, Seq("g"), "left_semi")
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > TextOps.DecontamMaxDf)
      .select(col("g"))
    val store = bench.join(hot, Seq("g"), "left_anti")
    val batch = sh(
      docs.filter(
        col("doc_id") >= 400L && pmod(col("doc_id"), lit(TextOps.BenchmarkMod)) =!= 0))
      .join(store, Seq("g"), "left_semi")
      .groupBy(col("doc_id"), col("source")).agg(count(lit(1)).as("n_hits"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val streamed = StreamOps
      .docDecontamGateOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty, "the sf0.001 corpus must contain contaminated arrivals")
    assert(streamed.forall { case (id, _, n) => id >= 400L && n >= 1L })
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming minhash upsert: static index + extension = re-indexing from scratch") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ext = StreamOps.minhashUpsertOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(ext.forall(_._1 >= 400L), "extension rows must be arrivals only")
    // BATCH PARITY: the static index rows plus the streamed extension
    // rows are exactly what re-indexing the whole corpus produces
    def keyRows(d: org.apache.spark.sql.DataFrame) = Dedup.minhashBandRows(d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val staticRows = keyRows(docs.filter(col("doc_id") < 400L))
    val fullRows = keyRows(docs)
    assert(staticRows ++ ext.map(e => (e._1, e._2, e._3)).toSet === fullRows,
      "index ∪ extension must equal the from-scratch re-index")
    // bucket-occupancy annotation: n_store_hits counts the static docs
    // in the arrival's bucket
    val occupancy = staticRows.toSeq.groupBy(e => (e._2, e._3)).view.mapValues(_.size.toLong).toMap
    ext.foreach { case (id, bi, bv, hits) =>
      assert(hits === occupancy.getOrElse((bi, bv), 0L), s"occupancy wrong for ($id, $bi)")
    }
    // the harness corpus has near-dups across the split: some arrival
    // must land in an occupied bucket
    assert(ext.exists(_._4 > 0L), "no arrival hit an existing bucket")
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming simhash upsert: static index + extension = re-indexing from scratch") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ext = StreamOps.simhashUpsertOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(ext.forall(_._1 >= 400L))
    def keyRows(d: org.apache.spark.sql.DataFrame) = Dedup.simhashChunkRows(d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val staticRows = keyRows(docs.filter(col("doc_id") < 400L))
    assert(staticRows ++ ext.map(e => (e._1, e._2, e._3)).toSet === keyRows(docs),
      "index ∪ extension must equal the from-scratch re-index")
    val occupancy = staticRows.toSeq.groupBy(e => (e._2, e._3)).view.mapValues(_.size.toLong).toMap
    ext.foreach { case (id, ci, cv, hits) =>
      assert(hits === occupancy.getOrElse((ci, cv), 0L), s"occupancy wrong for ($id, $ci)")
    }
    assert(ext.exists(_._4 > 0L), "no arrival hit an existing chunk bucket")
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming pHash upsert: capped static index + extension = re-indexing from scratch") {
    import graft.operators.Multimodal
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bandCols = (0 until Multimodal.PhashBands).map(j => col(s"b$j"))
    def bandRows(d: org.apache.spark.sql.DataFrame) =
      Multimodal.phashBands(d).select(
        col("doc_id") +: bandCols :+
          posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")): _*)
        .collect().map(r => (r.getLong(0), r.getInt(5), r.getLong(6))).toSet
    val ext = StreamOps.phashUpsertOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(ext.forall(_._1 >= 400L), "extension rows must be arrivals only")
    // BATCH PARITY on the uncapped row space: static band rows plus the
    // streamed extension equal the from-scratch explode of the corpus
    val staticRows = bandRows(docs.filter(col("doc_id") < 400L))
    assert(staticRows ++ ext.map(e => (e._1, e._2, e._3)).toSet === bandRows(docs),
      "index ∪ extension must equal the from-scratch re-index")
    // occupancy is measured against the CAPPED store: hot buckets read 0
    val occ = staticRows.toSeq.groupBy(e => (e._2, e._3)).view.mapValues(_.size.toLong).toMap
      .filter(_._2 <= Multimodal.PhashBucketCap)
    ext.foreach { case (id, bi, bv, hits) =>
      assert(hits === occ.getOrElse((bi, bv), 0L), s"occupancy wrong for ($id, $bi)")
    }
    assert(ext.exists(_._4 > 0L), "no arrival hit an existing bucket")
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming IVF upsert: static lists + extension = assigning the corpus with the static quantizer") {
    import graft.operators.{Phys, Similarity}
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val static = embs.filter(col("vec_id") < 400L)
    val cents = Phys.materialized(Similarity.kmeansFixed(static))
    def assigns(d: org.apache.spark.sql.DataFrame) =
      Similarity.invertedLists(d, cents).select(col("n_id"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ext = StreamOps.embIvfUpsertOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ext.forall(_._1 >= 400L), "extension rows must be arrivals only")
    val staticAsn = assigns(static)
    assert(staticAsn ++ ext.map(e => (e._1, e._2)).toSet === assigns(embs),
      "lists ∪ extension must equal the from-scratch assignment under the SAME quantizer")
    // occupancy annotation counts the static list the arrival extends
    val occ = staticAsn.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    ext.foreach { case (id, cid, n) =>
      assert(n === occ.getOrElse(cid, 0L), s"occupancy wrong for ($id, $cid)")
    }
    assert(ext.exists(_._3 > 0L), "no arrival landed in an occupied cell")
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming pHash gate equals the batch banded near-dup probe at sf0.001") {
    import graft.operators.Multimodal
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bandCols = (0 until Multimodal.PhashBands).map(j => col(s"b$j"))
    def explodeBands(sigs: org.apache.spark.sql.DataFrame) = sigs.select(
      col("doc_id") +: bandCols :+
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")): _*)
    val staticBands = explodeBands(Multimodal.phashBands(docs.filter(col("doc_id") < 400L)))
    val hot = staticBands.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("n")).filter(col("n") > Multimodal.PhashBucketCap)
      .select(col("band_idx"), col("band_val"))
    val store = staticBands.join(hot, Seq("band_idx", "band_val"), "left_anti")
      .select(
        col("doc_id").as("s_id") +: col("band_idx") +: col("band_val") +:
          (0 until Multimodal.PhashBands).map(j => col(s"b$j").as(s"sb$j")): _*)
    val hamming = (0 until Multimodal.PhashBands)
      .map(j => bit_count(col(s"b$j").bitwiseXOR(col(s"sb$j"))).cast("long"))
      .reduce(_ + _)
    val batch = explodeBands(Multimodal.phashBands(docs.filter(col("doc_id") >= 400L)))
      .join(store, Seq("band_idx", "band_val"))
      .select(col("doc_id"), col("s_id"), hamming.as("hamming"))
      .filter(col("hamming") <= Multimodal.PhashMaxHamming)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("hamming").as("h"), col("s_id").as("sid"))).as("sel"))
      .select(col("doc_id"), col("sel.h"), col("sel.sid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = StreamOps.docPhashGateOverParquet(spark, dir, firstNewId = 400L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty, "the sf0.001 corpus must contain near-dup arrivals")
    assert(streamed.forall { case (id, h, s) =>
      id >= 400L && h <= Multimodal.PhashMaxHamming && s < 400L
    })
    graft.sources.Staging.cleanup(spark)
  }

  test("streaming domain cap: the admission counter persists ACROSS batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    spark.conf
      .set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Long, Long)] // (source, doc_id, n_chars)
      val ckpt = java.nio.file.Files.createTempDirectory("domcap-ckpt")
      val q = input
        .toDS()
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.DomainCapProcessor(3L),
          TimeMode.None(),
          OutputMode.Update())
        .toDF("source", "n_seen", "n_admitted", "last_admitted", "admitted_chars")
        .writeStream
        .outputMode("update")
        .format("memory")
        .option("checkpointLocation", ckpt.toString)
        .queryName("domcap_out")
        .start()
      try {
        // batch 1 admits 2 of 2 — quota 3 not yet reached
        input.addData(("s", 1L, 10L), ("s", 2L, 20L))
        q.processAllAvailable()
        // batch 2: only ONE more admission is left; the stateless gate
        // would wrongly admit all three
        input.addData(("s", 3L, 30L), ("s", 4L, 40L), ("s", 5L, 50L))
        q.processAllAvailable()
        val rows = spark
          .table("domcap_out")
          .collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        assert(rows.contains((2L, 2L, 2L, 30L)), "batch 1: both admitted")
        assert(rows.last === ((5L, 3L, 3L, 60L)),
          "batch 2: exactly one more admitted (doc 3, the smallest id), quota closed")
      } finally q.stop()
    } finally spark.conf.set(key, prev)
  }
  test("outer stream-stream join equals the batch LEFT JOIN exactly (sentinel-driven flush)") {
    val d = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamOps.intervalJoinOuterOverParquet(spark, d)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    val ev = spark.read.parquet(s"$d/events.parquet")
    val tsCol =
      if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts")
    val base = ev.withColumn("ts", tsCol)
    val p = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = base.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val want = p.join(
        c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet
    assert(got === want, "every purchase exactly once: matched inner rows + null-flushed rest")
    graft.sources.Staging.cleanup(spark)
  }

}
