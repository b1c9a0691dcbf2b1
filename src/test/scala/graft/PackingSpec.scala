package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Packing, Sketches}

/** Sequence packing, CDC diff, and CMS join-size estimation. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(lens: Seq[Int]) =
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong * Packing.NShards, ("x " * n).trim, "en", "web", n.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  // doc_id multiples of NShards → everything in shard 0, in list order

  test("seqPack: chunk math, straddle count, and tail pad on a hand case") {
    // capacity 8, tokens [4,5,3]: doc2 spans stream [4,9) → straddles
    // the one boundary; total 12 → 2 chunks, tail pad 4
    val out = Packing.seqPack(docsOf(Seq(4, 5, 3)), capacity = 8).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 3)
    assert(r.getAs[Long]("n_tokens") === 12)
    assert(r.getAs[Long]("n_chunks") === 2)
    assert(r.getAs[Long]("n_straddled") === 1)
    assert(r.getAs[Long]("n_cuts") === 1)
    assert(r.getAs[Long]("tail_pad") === 4)
    assert(r.getAs[Long]("fill_ppm") === 12L * 1000000 / 16)
  }

  test("packNextFit: bins and the conservation law packed + waste = bins·capacity") {
    // capacity 8, tokens [4,5,3,8,2]: [4]→bin1(fill 4), 5 doesn't fit →
    // bin2(5), 3 fits (8), 8 → bin3(8), 2 → bin4(2); waste = 4+0+0+6
    val out = Packing.packNextFit(docsOf(Seq(4, 5, 3, 8, 2)), capacity = 8).collect()
    val r = out.head
    assert(r.getAs[Long]("bins_used") === 4)
    assert(r.getAs[Long]("n_packed_tokens") === 22)
    assert(r.getAs[Long]("waste_tokens") === 10)
    assert(
      r.getAs[Long]("n_packed_tokens") + r.getAs[Long]("waste_tokens") ===
        r.getAs[Long]("bins_used") * 8)
  }

  test("packNextFit: oversize docs are counted and skipped, zero-token docs pack free") {
    val out = Packing.packNextFit(docsOf(Seq(12, 0, 3)), capacity = 8).collect()
    val r = out.head
    assert(r.getAs[Long]("n_oversize") === 1)
    assert(r.getAs[Long]("n_docs") === 3)
    assert(r.getAs[Long]("bins_used") === 1)
    assert(r.getAs[Long]("n_packed_tokens") === 3)
  }

  test("cdcDiff classifies insert/update/unchanged off the append log") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(d: Int) = new java.sql.Timestamp(base.getTime + d * 86400000L)
    // key (1,a): updated between t1 and t2; (2,b): untouched; (3,c): new
    val e = Seq(
      (1L, at(0), 1L, "a", 1.0, "{}"),
      (2L, at(4), 1L, "a", 2.0, "{}"),
      (3L, at(1), 2L, "b", 5.0, "{}"),
      (4L, at(3), 3L, "c", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps
      .cdcDiff(e, t1 = "2024-01-03 00:00:00", t2 = "2024-01-06 00:00:00")
      .orderBy(col("op"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("insert", 1L, 3L), ("unchanged", 1L, 2L), ("update", 1L, 1L)))
  }

  test("cdcDiff same-timestamp ties break on event_id, both snapshots") {
    val ts = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val e = Seq(
      (10L, ts, 1L, "a", 1.0, "{}"),
      (11L, ts, 1L, "a", 9.0, "{}")) // higher event_id wins in BOTH states
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps
      .cdcDiff(e, t1 = "2024-01-03 00:00:00", t2 = "2024-01-06 00:00:00")
      .collect()
      .map(r => r.getString(0))
    assert(out.toSeq === Seq("unchanged"))
  }

  test("selectivityHist: uniform data interpolates near-exactly; full range estimates all rows") {
    // 64 rows at prices 100..6400 cents (uniform): the equi-width
    // histogram's uniform-within-bucket assumption holds exactly, so a
    // mid-range predicate lands within one bucket-boundary row of exact
    val o = (1L to 64L).map(i => i * 100.0 / 100.0).toDF("o_totalprice")
    val r = Sketches.selectivityHist(o, loCents = 1600, hiCents = 4800).collect().head
    val est = r.getAs[Long]("est_rows")
    val exact = r.getAs[Long]("exact_rows")
    assert(exact === 33)
    assert(math.abs(est - exact) <= 1, s"est $est vs exact $exact")
    val full = Sketches.selectivityHist(o, loCents = 0, hiCents = 10000).collect().head
    assert(full.getAs[Long]("exact_rows") === 64)
    assert(math.abs(full.getAs[Long]("est_rows") - 64) <= 1)
  }

  test("groupByCardKmv: below-k keys are exact; estimate stays within 2x at 10x k") {
    // 20 distinct keys < k = 64 → the sketch IS the exact answer
    val small = (1L to 100L).map(i => i % 20 + 1).toDF("o_custkey")
    val rs = Sketches.groupByCardKmv(small).collect().head
    assert(rs.getAs[Long]("est_groups") === 20)
    assert(rs.getAs[Long]("exact_groups") === 20)
    assert(rs.getAs[Long]("err_ppm") === 0)
    // 640 distinct keys at k = 64: the (k−1)P/h_(k) estimate has
    // relative error O(1/sqrt(k)) ≈ 12% — assert a generous 2x band
    val big = (1L to 640L).toDF("o_custkey")
    val rb = Sketches.groupByCardKmv(big).collect().head
    val est = rb.getAs[Long]("est_groups")
    assert(est > 320 && est < 1280, s"estimate $est out of band for 640 groups")
  }

  test("joinSizeCms: collision-free keys estimate exactly; estimator never undercounts") {
    val o = Seq(1L, 2L, 3L).toDF("o_orderkey")
    val l = Seq(1L, 1L, 2L, 2L, 2L, 3L, 9L).toDF("l_orderkey")
    val r = Sketches.joinSizeCms(o, l).collect().head
    assert(r.getAs[Long]("exact_rows") === 6)
    // 4 distinct keys into 512 buckets: no collisions, the min-row
    // inner product is exactly Σ f1(k)·f2(k)
    assert(r.getAs[Long]("est_cms") === 6)
    assert(r.getAs[Long]("est_cms") >= r.getAs[Long]("exact_rows"))
  }
  test("packXdoc: hand-computed cross-doc attention mass for both strategies") {
    // tokens [4, 3, 2] at capacity 6, one shard:
    //  next-fit (doc order): bins [4],[3+2] -> pairs 10 + 15 = 25
    //  best-fit-decreasing:  bins [4+2],[3] -> pairs 21 + 6  = 27
    //  within-doc mass: 10 + 6 + 3 = 19 -> xdoc 6 vs 8
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c"),
      (2L, "a b"))
      .toDF("doc_id", "text")
    val out = Packing.packXdoc(docs, capacity = 6, nShards = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("bestfit", 2L, 27L, 8L),
      ("nextfit", 2L, 25L, 6L)))
  }

}
