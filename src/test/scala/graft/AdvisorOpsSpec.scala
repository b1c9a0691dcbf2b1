package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EventOps, GraphOps, Layout, Similarity, Stats, Training}
// (Training.isotonicCalibration trains through the shared ModelCache)

/** Round-12 wave: information-theoretic stats, conformal intervals,
  * lateness audit, CDC chunking, k-center coresets, encoding advisor,
  * filtered vector search — planted-input invariants for each.
  */
class AdvisorOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mutual information: MI >= 0, VI = Hx + Hy - 2*MI, on real events") {
    val r = Stats.mutualInfo(model.eventsTable(spark, dir)).collect()(0)
    val (mi, hx, hy, vi) = (
      r.getAs[Long]("mi_nano"),
      r.getAs[Long]("hx_nano"),
      r.getAs[Long]("hy_nano"),
      r.getAs[Long]("vi_nano"))
    // MI of a finite sample is >= 0 up to per-cell nano rounding
    assert(mi >= -r.getAs[Long]("n_cells"))
    assert(vi === hx + hy - 2 * mi)
    assert(hx > 0 && hy > 0)
  }

  test("conformal on exactly-linear data: zero half-width, full coverage") {
    import spark.implicits._
    // y = 10.000x exactly (price = 10*qty) → every residual is 0, the
    // calibrated interval collapses to q = 0, coverage is 100%
    val rows = (1L to 400L).map(i => (i, (i % 50) + 1, ((i % 50) + 1) * 10.0))
    val li = rows.toDF("l_orderkey", "l_quantity", "l_extendedprice")
    val r = Training.conformalInterval(li).collect()(0)
    assert(r.getAs[Long]("q_mic") === 0L)
    assert(r.getAs[Long]("coverage_ppm") === 1000000L)
    assert(r.getAs[Long]("n_train") > 0 && r.getAs[Long]("n_calib") > 0)
    // the rank index is the exact integer ceil(9(n+1)/10)
    val nc = r.getAs[Long]("n_calib")
    assert(r.getAs[Long]("q_idx") === (9 * (nc + 1) + 9) / 10)
  }

  test("lateness audit: sorted log is all on-time; buckets partition n") {
    import spark.implicits._
    val ev = (0L until 300L)
      .map(i => (i, new Timestamp(1700000000000L + i * 1000L)))
      .toDF("event_id", "ts")
    val out = EventOps.latenessAudit(ev).collect()
    val log = out.find(_.getAs[String]("channel") == "log").get
    assert(log.getAs[Long]("on_time") === 300L)
    assert(log.getAs[Long]("max_late_us") === 0L)
    out.foreach { r =>
      val parts = Seq("on_time", "le_1m", "le_10m", "le_1h", "gt_1h")
        .map(r.getAs[Long](_))
        .sum
      assert(parts === r.getAs[Long]("n"))
    }
  }

  test("CDC chunking: token conservation, full-dup copy, shift resilience") {
    import spark.implicits._
    val words =
      (1 to 120).map(i => s"w${i * 7 % 101}x${i % 13}").mkString(" ")
    val docs = Seq(
      (0L, words, "en", "a", 1L),
      (1L, words, "en", "a", 1L), // exact copy → fully duplicate
      (2L, "prepended " + words, "en", "a", 1L), // shifted copy → suffix chunks still dedup
      (3L, (1 to 50).map(i => s"q${i}z${i * 3}").mkString(" "), "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.cdcChunks(docs).collect().map(r => r.getLong(0) -> r).toMap
    // token conservation: chunks cover every token exactly once
    assert(out(0L).getAs[Long]("n_toks") === 120L)
    assert(out(2L).getAs[Long]("n_toks") === 121L)
    // the exact copy is 100% duplicate tokens
    assert(out(1L).getAs[Long]("dup_ppm") === 1000000L)
    // content-defined cuts survive the one-token prepend: the shifted
    // copy still shares chunks with doc 0 (fixed-width chunking would
    // share none)
    assert(out(2L).getAs[Long]("dup_toks") > 0L)
    // the unrelated doc shares nothing
    assert(out(3L).getAs[Long]("dup_toks") === 0L)
  }

  test("k-center coreset covers planted far-apart clusters, radii non-increasing") {
    import spark.implicits._
    val pts = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(0.01f, 0.0f), 0),
      (2L, Array(0.9f, 0.9f), 1),
      (3L, Array(0.9f, 0.89f), 1),
      (4L, Array(-0.9f, 0.9f), 2),
      (5L, Array(-0.89f, 0.9f), 2))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.kcenterCoreset(pts, k = 3).collect().sortBy(_.getAs[Int]("rank"))
    val chosen = rows.take(3).map(_.getAs[Long]("vec_id")).toSet
    // one exemplar per planted cluster
    assert(chosen.map(id => id / 2).size === 3)
    // selection radii are non-increasing, and the final covering radius
    // is the tiny intra-cluster distance
    val d1 = rows(1).getAs[Long]("dist2")
    val d2 = rows(2).getAs[Long]("dist2")
    val cover = rows(3).getAs[Long]("dist2")
    assert(d1 >= d2 && d2 >= cover)
    assert(cover <= 400000000L) // ≤ (0.02 · 10⁶)²
  }

  test("encoding advisor: constant vs incrementing planted columns") {
    import spark.implicits._
    val rows = (0L until 120L).map { i =>
      (i / 4, (i % 4) + 1, 7L, (i % 4) * 3 + 1, 1.0, "N")
    }
    val li = rows.toDF(
      "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
      "l_extendedprice", "l_returnflag")
    val out = Layout.encodingStats(li).collect().map(r => r.getString(0) -> r).toMap
    // constant column: one run per group, zero deltas, dict of 1 value
    val pk = out("l_partkey")
    assert(pk.getAs[Long]("n_distinct") === 1L)
    assert(pk.getAs[Long]("n_runs") === 30L)
    assert(pk.getAs[Long]("max_delta") === 0L)
    assert(pk.getAs[Long]("dict_bits") === 0L)
    // stepping column: every row a new run inside its group, delta = 3
    val q = out("l_quantity")
    assert(q.getAs[Long]("max_delta") === 3L)
    assert(q.getAs[Long]("n_runs") === 120L)
  }

  test("array-side CDC chunker equals the window form (streaming = batch)") {
    import spark.implicits._
    val docs = model
      .table(spark, dir, "documents")
      .limit(120)
      .unionByName(
        Seq((9001L, "", "en", "x", 0L), (9002L, "one two", "en", "x", 7L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val win = Dedup
      .cdcChunkTable(docs)
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(col("chunk_idx"), col("chash"), col("n_toks"))))
          .as("chunks"))
      .select(col("doc_id"), expr("transform(chunks, c -> struct(c.chash, c.n_toks))").as("cs"))
    val arr = docs
      .select(col("doc_id"), Dedup.cdcChunkStructs(col("text")).as("cs"))
      .filter(size(col("cs")) > 0)
    val both = win
      .withColumnRenamed("cs", "w")
      .join(arr.withColumnRenamed("cs", "a"), Seq("doc_id"))
      .collect()
    assert(both.length === 121) // 120 real docs + "one two"; empty doc in neither
    both.foreach { r =>
      assert(r.getSeq[Any](1) === r.getSeq[Any](2), s"doc ${r.getLong(0)}")
    }
  }

  test("isotonic calibration: monotone fit that conserves the positive mass") {
    val rows = Training
      .isotonicCalibration(spark, model.table(spark, dir, "documents"))
      .collect()
      .sortBy(_.getAs[Long]("bin"))
    val iso = rows.map(_.getAs[Long]("iso_ppm"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // isotonic regression preserves the weighted mean: Σ n·iso = Σ n_pos
    // (up to the 1-ppm per-bin rounding of iso_ppm)
    val n = rows.map(_.getAs[Long]("n"))
    val fitted = rows.zip(n).map { case (r, w) => r.getAs[Long]("iso_ppm") * w }.sum
    val actual = rows.map(r => r.getAs[Long]("n_pos") * 1000000L).sum
    assert(math.abs(fitted - actual) <= n.sum)
  }

  test("k-hop sampling respects the fan-out bound at every hop") {
    val out = GraphOps
      .khopSample(GraphSource.lineitemEdges(spark, dir))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h1 = r.getAs[Long]("n_hop1")
      assert(h1 >= 1L && h1 <= GraphOps.KhopFanout)
      assert(r.getAs[Long]("n_hop2_paths") <= h1 * GraphOps.KhopFanout)
      assert(r.getAs[Long]("n_hop2_distinct") <= r.getAs[Long]("n_hop2_paths"))
    }
  }

  test("Hill estimator: alpha positive, threshold decreasing in k") {
    val rows = EventOps
      .hillTail(model.eventsTable(spark, dir))
      .collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")) === EventOps.HillKs.map(_.toLong).toArray)
    rows.foreach(r => assert(r.getAs[Long]("alpha_milli") > 0L))
    val xs = rows.map(_.getAs[Double]("x_k"))
    assert(xs.zip(xs.tail).forall { case (a, b) => a >= b })
  }

  test("binary quantization: identical vectors are each other's top hit") {
    import spark.implicits._
    // period-101 construction: no accidental duplicates among i < 40
    val vecs = (0L until 40L).map { i =>
      val base = Array.tabulate(64)(j => ((i * 31 + j * 7) % 101 - 50).toFloat / 50f)
      (i, base)
    } :+ (99L, Array.tabulate(64)(j => ((5 * 31 + j * 7) % 101 - 50).toFloat / 50f))
    val embs = vecs.toDF("vec_id", "embedding")
    val top = Similarity
      .bqTopK(embs, nQueries = 10, k = 1)
      .collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_id"))
      .toMap
    // vec 99 is an exact copy of vec 5 → Hamming 0 → exact-cos rerank
    // must return it first
    assert(top(5L) === 99L)
  }

  test("best-fit-decreasing never uses more bins than next-fit, conserves tokens") {
    import graft.operators.Packing
    val docs = model.table(spark, dir, "documents")
    val bf = Packing
      .packBestFit(docs)
      .collect()
      .map(r => r.getAs[Long]("shard") -> r)
      .toMap
    val nf = Packing
      .packNextFit(docs)
      .collect()
      .map(r => r.getAs[Long]("shard") -> r)
      .toMap
    assert(bf.keySet === nf.keySet && bf.nonEmpty)
    bf.foreach { case (shard, b) =>
      assert(b.getAs[Long]("bins_used") <= nf(shard).getAs[Long]("bins_used"))
      assert(
        b.getAs[Long]("n_packed_tokens") + b.getAs[Long]("waste_tokens") ===
          b.getAs[Long]("bins_used") * Packing.Capacity)
    }
  }

  test("filtered vector search: every hit satisfies the predicate, ranks dense") {
    val out = Similarity
      .ivfFilteredTopK(model.table(spark, dir, "embeddings"), nQueries = 6, k = 4)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_id") % 3 === 0L)
    }
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks === (1 to ranks.length).toArray)
    }
  }
  test("Mann-Kendall: monotone daily counts give tau = 1, hand-computed z and Sen slope") {
    import spark.implicits._
    // 3 days with 1, 2, 3 events: S = 3, m = 3, tau = 1e6; all pairwise
    // slopes are +1/day -> Sen = 1e6 mic; z = (3-1)/sqrt(3*2*11/18)
    val rows = for {
      (day, cnt) <- Seq(("01", 1), ("02", 2), ("03", 3))
      i <- 1 to cnt
    } yield (day.toLong * 100 + i, Timestamp.valueOf(s"2024-03-$day 0$i:00:00"), 1L, "t", 1.0, "{}")
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.mannKendall(ev).collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 1000000L)
    assert(r.getLong(3) === math.round(2.0 / math.sqrt(66.0 / 18.0) * 1000))
    assert(r.getLong(4) === 1000000L)
  }

  test("CUPED: y perfectly predicted by x gives reduction 1e6 and zero residual variance") {
    import spark.implicits._
    // two events per user: pre-period value v, post-period value 2v
    // -> Y = 2X exactly -> rho^2 = 1, var_cuped = 0, theta = 2
    val rows = (1 to 8).flatMap { u =>
      Seq(
        (u.toLong * 2, Timestamp.valueOf("2024-01-01 00:00:00"), u.toLong, "t", u * 1.0, "{}"),
        (u.toLong * 2 + 1, Timestamp.valueOf("2024-01-30 00:00:00"), u.toLong, "t", u * 2.0, "{}"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.cuped(ev).collect()(0)
    assert(r.getLong(0) === 8L)
    assert(r.getLong(1) === 2000000L) // theta = 2
    assert(r.getLong(3) === 0L) // var(Y - theta X) = 0
    assert(r.getLong(4) === 1000000L) // rho^2 = 1
  }

  test("James-Stein: the small deviant group shrinks toward the grand mean more than large ones") {
    import spark.implicits._
    // two big groups with many noisy observations around means 10 and 20,
    // one small group at 40: the small group must shrink (b_ppm < 1e6,
    // shrunk strictly between its raw mean and the grand mean)
    val rows =
      (1 to 50).map(i => (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a",
        10.0 + (i % 5) * 0.5, "{}")) ++
      (1 to 50).map(i => (100 + i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "b",
        20.0 + (i % 5) * 0.5, "{}")) ++
      (1 to 3).map(i => (200 + i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "c",
        40.0 + i * 0.5, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Stats.jamesStein(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (rawC, shrunkC, bC) = out("c")
    assert(bC < 1000000L && bC > 0L)
    // grand mean is ~15.8e3 milli; c's shrunk mean moves DOWN from raw
    assert(shrunkC < rawC)
    // the big groups barely move relative to c's shift
    val shiftA = math.abs(out("a")._2 - out("a")._1)
    assert(math.abs(rawC - shrunkC) > shiftA)
  }

  test("mSPRT: a planted mean shift rejects; identical halves never do") {
    import spark.implicits._
    def ev(id: Long, day: String, v: Double) =
      (id, Timestamp.valueOf(s"2024-01-$day 00:00:00"), 1L, "t", v, "{}")
    // shifted: ref half around 10, cur half around 100 -> huge delta
    val shifted = ((1 to 20).map(i => ev(i.toLong, "01", 10.0 + (i % 3))) ++
      (1 to 20).map(i => ev(100 + i.toLong, "30", 100.0 + (i % 3))))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rs = EventOps.msprt(shifted).collect()(0)
    assert(rs.getBoolean(5), s"90-unit shift must reject: $rs")
    assert(rs.getLong(4) > 2996L)
    // identical halves: delta 0 -> ln Lambda = 0.5 ln(V/(V+tau2)) < 0
    val same = ((1 to 20).map(i => ev(i.toLong, "01", 10.0 + (i % 3))) ++
      (1 to 20).map(i => ev(100 + i.toLong, "30", 10.0 + (i % 3))))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rn = EventOps.msprt(same).collect()(0)
    assert(!rn.getBoolean(5) && rn.getLong(4) < 0L && rn.getLong(3) === 0L)
  }

  test("mSPRT: zero pooled variance NULLs the statistic instead of hitting ln(0)") {
    import spark.implicits._
    // a fixed-value event type: both halves constant -> vv = 0. Spark's
    // ln(0) is NULL while DuckDB's errors, so the statistic must be
    // gated to NULL on BOTH sides, never evaluated
    val rows = ((1 to 5).map(i => (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "fix", 7.0, "{}")) ++
      (1 to 5).map(i => (100 + i.toLong, Timestamp.valueOf("2024-01-30 00:00:00"), 1L, "fix", 7.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.msprt(rows).collect()(0)
    assert(r.isNullAt(4), s"ln_lambda must be NULL on zero variance: $r")
    assert(r.isNullAt(5), "reject derives from the NULL statistic")
    assert(r.getLong(3) === 0L, "delta itself is still well-defined")
  }

  test("DiD: a planted treatment effect is recovered net of the common time shock") {
    import spark.implicits._
    def ev(id: Long, day: String, uid: Long, v: Double) =
      (id, Timestamp.valueOf(s"2024-01-$day 00:00:00"), uid, "t", v, "{}")
    // control (even uids): pre ~10, post ~12 (common shock +2);
    // treated (odd uids): pre ~20, post ~25 (+2 shock, +3 effect).
    // jitter +0/+0.1 within each cell for nonzero cell variance
    val rows =
      (0 until 10).map(i => ev(i.toLong, "01", 2L * i, 10.0 + (i % 2) * 0.1)) ++
      (0 until 10).map(i => ev(100 + i.toLong, "30", 2L * i, 12.0 + (i % 2) * 0.1)) ++
      (0 until 10).map(i => ev(200 + i.toLong, "01", 2L * i + 1, 20.0 + (i % 2) * 0.1)) ++
      (0 until 10).map(i => ev(300 + i.toLong, "30", 2L * i + 1, 25.0 + (i % 2) * 0.1))
    val r = EventOps.did(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect()(0)
    assert((0 to 3).forall(i => r.getLong(i) === 10L), "10 events per cell")
    assert(r.getLong(4) === 3000L, s"effect = (25-20)-(12-10) = 3.0 exactly (jitter cancels): $r")
    assert(r.getLong(5) > 0L, "nonzero jitter -> nonzero SE")
    assert(r.getLong(6) > 10000L, "a 3.0 effect against centi-scale noise is a huge t")
    // naive post-only comparison would report 25-12 = 13: DiD nets the
    // baseline gap and the shock; 3.0 is the causal number
  }

  test("DiD: an empty cell NULLs the effect identically instead of crashing the forms") {
    import spark.implicits._
    def ev(id: Long, day: String, uid: Long, v: Double) =
      (id, Timestamp.valueOf(s"2024-01-$day 00:00:00"), uid, "t", v, "{}")
    // no treated-pre cell (odd uids appear only post)
    val rows =
      (0 until 4).map(i => ev(i.toLong, "01", 2L * i, 10.0 + i * 0.1)) ++
      (0 until 4).map(i => ev(100 + i.toLong, "30", 2L * i, 12.0 + i * 0.1)) ++
      (0 until 4).map(i => ev(300 + i.toLong, "30", 2L * i + 1, 25.0 + i * 0.1))
    val r = EventOps.did(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect()(0)
    assert(r.getLong(2) === 0L, "treated-pre cell empty")
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6),
      s"effect/SE/t must NULL when a cell is missing: $r")
  }

  test("Page-Hinkley: a sustained mean shift alarms; a flat series never does") {
    import spark.implicits._
    def ev(id: Long, day: Int, v: Double) =
      (id, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), 1L, "t", v, "{}")
    // 10 flat days at 1.00, then 10 days at 2.00: m climbs ~1e8
    // micro-cents/day after the running mean lags -> crosses 5e7
    val shifted = ((1 to 10).map(d => ev(d.toLong, d, 1.0)) ++
      (11 to 20).map(d => ev(100 + d.toLong, d, 2.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rs = EventOps.pageHinkley(shifted).orderBy(col("d")).collect()
    assert(rs.length === 20)
    assert(!rs.take(10).exists(_.getBoolean(5)), "no alarm on the flat prefix")
    assert(rs.drop(12).forall(_.getBoolean(5)), s"sustained shift must alarm: ${rs.toSeq}")
    // flat series: every term is 0, ph stays 0
    val flat = (1 to 20).map(d => ev(d.toLong, d, 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rf = EventOps.pageHinkley(flat).collect()
    assert(rf.forall(r => r.getLong(4) === 0L && !r.getBoolean(5)))
  }

  test("Page-Hinkley floors (not truncates) on NEGATIVE daily sums — the oracle's // semantics") {
    import spark.implicits._
    def ev(id: Long, day: Int, v: Double) =
      (id, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), 1L, "t", v, "{}")
    // days with negative cent sums and counts that do NOT divide them:
    // truncation (toward zero) and floor differ on every such day, so a
    // div-spelled mean would break cross-engine parity the moment a
    // corpus carries refunds — asserted against Math.floorDiv directly
    val rows = Seq(
      ev(1, 1, -0.07), ev(2, 1, -0.07), ev(3, 1, 0.01), // day sum -13 cents over 3
      ev(4, 2, -0.05), ev(5, 2, 0.02),                  // day sum  -3 cents over 2
      ev(6, 3, 0.07), ev(7, 3, -0.02), ev(8, 3, -0.09)) // day sum  -4 cents over 3
    val out = EventOps.pageHinkley(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy(col("d")).collect()
    val sums = Seq((-13L, 3L), (-3L, 2L), (-4L, 3L))
    val expectMeans = sums.map { case (s, n) => Math.floorDiv(s * 1000000L, n) }
    assert(out.map(_.getLong(2)).toSeq === expectMeans,
      s"mean_micro must be FLOOR division: got ${out.map(_.getLong(2)).toSeq}, want $expectMeans")
    // the running-mean term floors too: m after day i uses floorDiv(csum, i)
    val csums = expectMeans.scanLeft(0L)(_ + _).tail
    val terms = expectMeans.zip(csums).zipWithIndex.map { case ((mu, cs), i) =>
      mu - Math.floorDiv(cs, i + 1L)
    }
    val expectM = terms.scanLeft(0L)(_ + _).tail
    assert(out.map(_.getLong(3)).toSeq === expectM,
      s"m_micro must fold floor-div running means: got ${out.map(_.getLong(3)).toSeq}, want $expectM")
  }

  test("QTE: a tail-only treatment shows at p75 but not at the median") {
    import spark.implicits._
    def ev(id: Long, uid: Long, v: Double) =
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), uid, "t", v, "{}")
    // both arms: 60% of mass at 1.0, 40% at varying upper value —
    // control upper 2.0, treated upper 5.0: p25/p50 identical, p75 moves
    val rows =
      (0 until 60).map(i => ev(i.toLong, 2L * i, 1.0)) ++
      (0 until 40).map(i => ev(100 + i.toLong, 2L * i, 2.0)) ++
      (0 until 60).map(i => ev(200 + i.toLong, 2L * i + 1, 1.0)) ++
      (0 until 40).map(i => ev(300 + i.toLong, 2L * i + 1, 5.0))
    val out = EventOps.qteBinned(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out(25L) === 0.0 && out(50L) === 0.0,
      s"no effect below the tail: $out")
    assert(out(75L) === 3.0, s"tail effect = 5.0 - 2.0 at the bin grid: $out")
  }

  test("James-Stein: zero within-group variance NULLs the shrinkage instead of Inf-casting") {
    import spark.implicits._
    // every group constant -> ssw_c2 = 0: the pooled variance is
    // undefined; Spark would saturate the Inf BIGINT cast where DuckDB
    // errors, so both mirror sides must NULL shrunk/b instead
    val rows = (1 to 10).map(i => (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
      if (i <= 5) "a" else "b", if (i <= 5) 10.0 else 20.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Stats.jamesStein(ev).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(!r.isNullAt(2), "raw mean stays defined")
      assert(r.isNullAt(3) && r.isNullAt(4), s"shrunk/b must NULL on zero pooled variance: $r")
    }
  }

  test("cusumQueryStored follows the artifact — a planted zero target makes max_s the window sum") {
    import spark.implicits._
    val ev = model.eventsTable(spark, dir)
    val modelDir = EventOps.writeCusumModel(spark, ev, corpusKey = dir + "#spec-cusum-plant")
    // plant target_milli = 0 for every type: the CUSUM increments are
    // then all +vm (vm >= 0 on this corpus), so p is nondecreasing,
    // least(0, min p) = 0, and max_s must equal the window's Σvm per
    // type — a statistic no retrained reference could produce
    val types = ev.select("event_type").distinct().as[String].collect()
    types.map(t => (t, 0L, 1L)).toSeq.toDF("event_type", "target_milli", "n_ref")
      .coalesce(1).write.mode("overwrite").parquet(modelDir)
    val lo = EventOps.DriftQueryLoPct
    val hi = EventOps.DriftQueryHiPct
    val served = EventOps.cusumQueryStored(spark, ev, modelDir, lo, hi)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("max_s_milli")).toMap
    // the window Σvm recomputed independently of the operator
    val b = ev.agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
    val expect = ev.join(broadcast(b))
      .withColumn("us", unix_micros(col("ts")))
      .filter(col("us") > expr(s"lo + (hi - lo) * $lo div 100") &&
        col("us") <= expr(s"lo + (hi - lo) * $hi div 100"))
      .groupBy("event_type")
      .agg(sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("sv"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sv")).toMap
    assert(served.nonEmpty)
    served.foreach { case (t, s) =>
      assert(s === expect(t), s"type $t: served max_s $s, planted-target window sum ${expect(t)}")
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("psiQueryStored follows the artifact — a planted single-bin histogram sets n_ref/n_bins") {
    import spark.implicits._
    val ev = model.eventsTable(spark, dir)
    val modelDir = EventOps.writePsiModel(spark, ev, corpusKey = dir + "#spec-psi-plant")
    // plant one far-away bin with nr=7 per type: n_ref must serve as 7
    // and n_bins as 1 + |window bins| (the planted bin can't occur in
    // real data: values are bounded far below bin 999999)
    val types = ev.select("event_type").distinct().as[String].collect()
    types.map(t => (t, 999999L, 7L)).toSeq.toDF("event_type", "bin", "nr")
      .coalesce(1).write.mode("overwrite").parquet(modelDir)
    val lo = EventOps.DriftQueryLoPct
    val hi = EventOps.DriftQueryHiPct
    val served = EventOps.psiQueryStored(spark, ev, modelDir, lo, hi).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      assert(r.getAs[Long]("n_ref") === 7L,
        s"n_ref must come from the planted artifact: $r")
      assert(r.getAs[Long]("n_bins") >= 2L,
        s"bin set must union the planted bin with the window's real bins: $r")
    }
    graft.sources.Staging.cleanup(spark)
  }

}
