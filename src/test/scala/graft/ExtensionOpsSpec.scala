package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Parity
import graft.operators.{Dedup, EventOps, Multimodal, Similarity, Sketches, TextOps, Training}

/** Unit tests for the north-star extension operators on tiny in-memory
  * inputs with hand-computed expectations.
  */
class ExtensionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "lang")

  test("exact dedup keeps min doc_id and counts copies") {
    val d = docsDf(Seq((3L, "a b", "en"), (1L, "a b", "en"), (2L, "c", "en")))
    val out = Dedup.exact(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L), (2L, 1L)))
  }

  test("minhash: identical docs get identical signatures and become candidates") {
    val d = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the quick brown fox jumps over the lazy dog", "en"),
      (3L, "completely different words entirely here now", "en")))
    val sigs = Dedup.minhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    assert(sigs(1L).length === Dedup.MinhashK)
    val cands = Dedup.minhashCandidates(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cands.exists(c => c._1 == 1L && c._2 == 2L && c._3 == 1.0))
  }

  test("simhash: identical docs at hamming 0; near docs closer than far docs") {
    val d = docsDf(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota", "en"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "en")))
    val sh = Dedup.simhashes(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(3L))
    val pairs = Dedup.simhashCandidates(d, maxHamming = Parity.SimBits).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 3L)) === 0L)
    assert(pairs((1L, 2L)) > 0L)
  }

  test("ngram jaccard finds overlapping docs within a lang block") {
    val d = docsDf(Seq(
      (1L, "a b c d e", "en"),
      (2L, "a b c d x", "en"),
      (3L, "a b c d e", "fr"))) // other lang → never paired
    val out = Dedup.ngramJaccardPairs(d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // shingles(1) = {abc,bcd,cde}, shingles(2) = {abc,bcd,cdx}: inter 2, union 4
    assert(out === Map((1L, 2L) -> ((2L, 4L))))
  }

  test("embedding near-dups: identical vectors hit cosine 1") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f, 0.0f), 0),
      (4L, Seq(1.0f, 0.0f, 0.0f), 9)) // other label block
      .toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDups(e, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out === Array((1L, 2L, 1.0)))
  }

  test("fasttextApplyStored follows the artifact — a planted weight vector scores as planted") {
    import graft.operators.Training
    val docs = model.table(spark, "/root/testdata/sf0.001", "documents")
    val dir = Training.writeFasttextModel(spark, docs)
    // plant w = (0, 1e6, 0, …), m = 0: the score must become exactly
    // 1e6 · (bucket-0 token count) — a result no retrain could produce
    val planted = Seq((
      0L +: 1000000L +: Seq.fill(Training.FtDim - 1)(0L),
      Seq.fill(Training.FtDim)(0L)))
      .toDF("w", "m")
    planted.coalesce(1).write.mode("overwrite").parquet(dir)
    // recompute bucket-0 counts independently
    val expect = docs
      .select(col("doc_id"), explode(Parity.tokens(col("text"))).as("t"))
      .filter(pmod(Parity.tokenH40(col("t")), lit(Training.FtDim)) === 0)
      .groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Training.fasttextApplyStored(spark, docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    full.foreach { case (id, score, pred) =>
      val x0 = expect.getOrElse(id, 0L)
      assert(score === 1000000L * x0, s"doc $id scored $score, planted model says ${1000000L * x0}")
      assert(pred === (if (x0 > 0) 1L else 0L))
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("splitAssignGrouped: every source lands wholly in one split") {
    val docs = model.table(spark, "/root/testdata/sf0.001", "documents")
    val purity = TextOps.splitAssignGrouped(docs)
      .groupBy(col("source")).agg(countDistinct(col("split")).as("k")).collect()
    assert(purity.nonEmpty && purity.forall(_.getLong(1) === 1L),
      "a source split across partitions would leak near-dups between splits")
  }

  test("topTerms: the doc-unique term wins rank 1; shared terms rank below") {
    val d = docsDf(Seq(
      (1L, "shared shared unique1", "en"),
      (2L, "shared shared unique2", "en"),
      (3L, "shared other other", "en")))
    val out = TextOps.topTerms(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // "shared" has df=3 → idf=0 → tfidf 0; the unique term (df=1) wins
    assert(out((1L, 1L)) === "unique1")
    assert(out((2L, 1L)) === "unique2")
    assert(out((3L, 1L)) === "other")
  }

  test("dimStats: per-dim mean/std match a driver-side recomputation on the milli grid") {
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val vecs = embs.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    def milli(x: Double): Long =
      BigDecimal(x * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val n = vecs.length.toLong
    val out = operators.LinAlg.dimStats(embs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq(1, 17, 64).foreach { dim =>
      val xs = vecs.map(v => milli(v(dim - 1)))
      val (s, q) = (xs.sum, xs.map(x => x * x).sum)
      val expStd = BigDecimal(math.sqrt((q * n - s * s).toDouble) / n / 1000.0)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(dim.toLong) === ((n, s / n, expStd)), s"dim $dim mismatch")
    }
  }

  test("bootstrapTokensCi: the interval brackets the point estimate and is deterministic") {
    val docs = model.table(spark, "/root/testdata/sf0.001", "documents")
    val r1 = operators.Sketches.bootstrapTokensCi(docs).head()
    val r2 = operators.Sketches.bootstrapTokensCi(docs).head()
    assert(r1 === r2, "hash-grid bootstrap must be bit-deterministic")
    val (mean, lo, hi) = (r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket mean $mean")
    assert(hi - lo < mean, "a 500-doc corpus cannot have a degenerate-wide interval")
  }

  test("containmentPairs: a quoted short doc hits cont 1.0 while its Jaccard stays low") {
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (1 to 20).map(i => s"w$i").mkString(" ")
    val d = docsDf(Seq((1L, short, "en"), (2L, long, "en"), (3L, "x y z q r s t", "en")))
    val cont = Dedup.containmentPairs(d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getDouble(4)))).toMap
    // doc 1's 3 shingles all occur in doc 2 → containment of A is exact 1.0
    assert(cont((1L, 2L))._1 === 1.0)
    assert(cont((1L, 2L))._2 < 0.2, "long side must not look contained")
    val jac = Dedup.ngramJaccardPairs(d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(jac((1L, 2L)) < 0.2, "the symmetric score misses this pair by design")
  }

  test("gopherRules: each rule trips on its crafted violator and only that rule") {
    val longOk = ("the of " + Seq.fill(60)("word").mkString(" ")) // 62 words, 2 stopwords
    val d = docsDf(Seq(
      (1L, longOk, "en"), // passes everything
      (2L, "the of short doc", "en"), // wc_ok fails (4 words)
      (3L, ("the of " + Seq.fill(60)("a").mkString(" ")), "en"), // mean word len < 3
      (4L, ("the of # # # # # # # # # # " + Seq.fill(55)("word").mkString(" ")), "en"), // sym ratio > 0.1
      (5L, (Seq.fill(10)("- the of " + Seq.fill(10)("word").mkString(" ")).mkString("\n")), "en"), // all lines bullets
      (6L, (Seq.fill(10)("the of " + Seq.fill(10)("word").mkString(" ") + " ...").mkString("\n")), "en"), // all lines ellipsis-ended
      (7L, ("the of " + Seq.fill(60)("1234").mkString(" ")), "en"), // alpha ratio < 0.8
      (8L, Seq.fill(60)("word").mkString(" "), "en"))) // no stopwords
    val out = TextOps.gopherRules(d).collect()
      .map(r => r.getLong(0) -> (2 to 8).map(r.getBoolean).toVector).toMap
    // columns: wc, mwl, sym, bullet, ell, alpha, stop
    assert(out(1L) === Vector(true, true, true, true, true, true, true))
    assert(!out(2L)(0) && out(2L).drop(1).take(5).forall(identity)) // only wc trips
    assert(!out(3L)(1) && out(3L)(0)) // mwl trips
    assert(!out(4L)(2) && out(4L)(0)) // sym trips
    assert(!out(5L)(3) && out(5L)(2)) // bullet trips
    assert(!out(6L)(4) && out(6L)(3)) // ellipsis trips
    assert(!out(7L)(5) && out(7L)(0)) // alpha trips
    assert(!out(8L)(6) && out(8L)(5)) // stopword trips
  }

  test("dsirWeights: stopword-dense prose outscores gibberish; select is the top of that order") {
    val d = docsDf(Seq(
      (1L, "the of and to in is on for the of", "en"), // target-slice prose
      (2L, "the a an of and to in is on for", "en"), // target-slice prose
      (3L, "zzqx wvnp qqrm ttkl zzqx wvnp qqrm ttkl mmop bbvc", "en"), // gibberish
      (4L, "", "en"))) // token-less → neutral 0
    val w = TextOps.dsirWeights(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // the target distribution is built FROM docs 1-2, so their buckets
    // carry more target mass than the gibberish buckets
    assert(w(1L)._2 > w(3L)._2, s"prose ${w(1L)} must outscore gibberish ${w(3L)}")
    assert(w(2L)._2 > w(3L)._2)
    assert(w(4L) === ((0L, 0.0)), "token-less doc carries the neutral weight")
    // selection keeps k docs and they are a subset of the scored set
    val sel = TextOps.dsirSelect(d, k = 2).collect().map(_.getLong(0)).toSet
    assert(sel.size === 2 && sel.subsetOf(w.keySet))
  }

  test("dsirApplyStored follows the artifact — a planted all-ones llr scores llr = n_tokens") {
    val docs = model.table(spark, "/root/testdata/sf0.001", "documents")
    val dir = graft.sources.Staging.freshDir("dsir-model")
    // plant llr_b = 1.0 for every bucket: the served weight must become
    // exactly n_tokens · 1.0 — a value no retrain could produce
    (0 until TextOps.DsirDim).map(b => (b.toLong, 1.0d)).toDF("b", "llr")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val out = TextOps.dsirApplyStored(spark, docs, dir).collect()
    out.foreach { r =>
      assert(r.getDouble(2) === r.getLong(1).toDouble,
        s"doc ${r.getLong(0)}: served ${r.getDouble(2)}, planted model says ${r.getLong(1)}")
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("pplBuckets: per-lang LM-score terciles; empty doc lands in tail") {
    val d = docsDf(Seq(
      (1L, "a a", "en"), // best LM fit (all high-freq tokens)
      (2L, "a b a", "en"),
      (3L, "z a", "en"), // rare-token-heavy → worst scored non-empty
      (4L, "", "en"), // no tokens → NULL score → tail
      (5L, "x", "fr"))) // own lang partition
    val out = TextOps.pplBuckets(d).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // 4 en docs, ntile(3) → sizes 2,1,1 in score-desc order
    assert(out === Map(1L -> "head", 2L -> "head", 3L -> "middle", 4L -> "tail", 5L -> "head"))
  }

  test("budgetSelect: best-fit-first until the per-lang token budget") {
    val d = docsDf(Seq(
      (1L, "a a", "en"),
      (2L, "a b a", "en"),
      (3L, "z a", "en"),
      (4L, "", "en"),
      (5L, "x", "fr")))
    // en budget = 0.4 * 7 = 2.8 tokens: doc 1 (2 tokens, best score) fits;
    // doc 2 would take the running total to 5 — everything after is out
    val out = TextOps.budgetSelect(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) === ((2L, true)))
    assert(out(2L) === ((5L, false)))
    assert(out(3L) === ((7L, false)))
    assert(out(4L) === ((7L, false)))
    // fr budget = 0.4 * 1: its only doc exceeds it
    assert(out(5L) === ((1L, false)))
  }

  test("lang id heuristic: stopword-heavy text → en") {
    val d = docsDf(Seq((1L, "the cat sat on the mat", "xx"), (2L, "zzz qqq", "xx")))
    val out = TextOps.langId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "other")
  }

  test("quality: token stats are exact on a known doc") {
    val d = docsDf(Seq((1L, "the fast key", "en")))
    val r = TextOps.quality(d).collect()(0)
    assert(r.getLong(1) === 3L) // n_tokens
    assert(r.getDouble(2) === 3.333333) // mean_tok_len, rounded to 6
    assert(r.getDouble(3) === math.rint(1.0 / 3.0 * 1e6) / 1e6) // stop_ratio ("the")
  }

  test("token counts: ws vs regex segmentation") {
    val d = docsDf(Seq((1L, "ab 12 cd", "en")))
    val r = TextOps.tokenCounts(d).collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 3L)
    assert(r.getLong(3) === 8L)
  }

  test("fingerprints are deterministic and distinct per content") {
    val d = docsDf(Seq((1L, "abc", "en"), (2L, "abc", "en"), (3L, "abd", "en")))
    val fp = TextOps.fingerprints(d).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    // hand-check fp_a for "abc": ((0*31+97)*31+98)*31+99 = 96262 % 1000003
    val fa = TextOps.fingerprints(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fa(1L) === ((97L * 31 + 98) * 31 + 99) % Parity.TokP)
  }

  test("eventPaths windows stay inside sessions and respect the tiebreak") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // one 4-event session (paths a>b>c and b>c>b) and, after a > 1-day
    // gap, a 2-event session — too short for a length-3 path
    val e = Seq(
      (1L, at(0), 7L, "a", 1.0, "{}"),
      (2L, at(1), 7L, "b", 1.0, "{}"),
      (3L, at(2), 7L, "c", 1.0, "{}"),
      (4L, at(3), 7L, "b", 1.0, "{}"),
      (5L, at(3000), 7L, "a", 1.0, "{}"),
      (6L, at(3001), 7L, "b", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.eventPaths(e).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a>b>c", 1L), ("b>c>b", 1L)))
  }

  test("sessionize splits on gap > 30 minutes") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val e = Seq(
      (1L, at(0), 7L, "click", 1.0, "{}"),
      (2L, at(10), 7L, "click", 1.0, "{}"),
      (3L, at(50), 7L, "click", 1.0, "{}"), // 40-min gap → new session
      (4L, at(5), 8L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.sessionize(e, 30).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out === Map((7L, 1L) -> 2L, (7L, 2L) -> 1L, (8L, 1L) -> 1L))
  }

  test("er blocking: only within-block pairs compared, levenshtein verify exact") {
    val c = Seq(
      (1L, "Customer#000000001", 1, 0.0, "AUTO"),
      (2L, "Customer#000000002", 1, 0.0, "AUTO"), // dist 1 to #1 → match
      (3L, "Customer#000000999", 1, 0.0, "AUTO"), // dist 3 to both → no match
      (4L, "Customer#000000001", 2, 0.0, "AUTO"), // other block: never compared to #1
      (5L, "Customer#000000011", 1, 0.0, "BUILDING")) // other segment
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Dedup.erBlockedPairs(c).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 1L)))
  }

  test("psi drift: identical halves score ~0; a shifted current half alarms") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // 'click': both halves uniform over the same bin → psi 0
    // 'error': ref mass in bin 0, cur mass in bin 4 → large psi
    val e = (
      (1 to 8).map(i => (i.toLong, at(if (i <= 4) 0 else 100), 1L, "click", 10.0, "{}")) ++
        (1 to 4).map(i => (100L + i, at(0), 2L, "error", 10.0, "{}")) ++
        (1 to 4).map(i => (200L + i, at(100), 2L, "error", 110.0, "{}"))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.psiDrift(e).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val (cn, en) = (out("click"), out("error"))
    assert(cn === ((4L, 4L, 1L, 0L)))
    assert(en._1 === 4L && en._2 === 4L && en._3 === 2L)
    assert(en._4 > 1000000L, s"shifted distribution must alarm, psi_micro=${en._4}")
  }

  test("pmi bigrams: min-count floor applies; collocation outranks chance pair") {
    // "new york" always adjacent (6×); "the cat"/"the dog" split "the"'s
    // mass so each pair's pmi is lower than the pure collocation's
    val docs = (
      (1 to 6).map(i => (i.toLong, "new york", "en", "s1")) ++
        (1 to 3).map(i => (10L + i, "the cat", "en", "s1")) ++
        (1 to 3).map(i => (20L + i, "the dog", "en", "s1")) ++
        Seq((30L, "rare pair", "en", "s1")) // below min count → dropped
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextOps.pmiBigrams(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(5)))).toMap
    assert(out.keySet === Set(("new", "york")))
    val (nAb, pmi) = out(("new", "york"))
    assert(nAb === 6L)
    // p(ab)=6/13 bigram positions, p(a)=p(b)=6/26 token positions
    val expected = math.log(6.0 / 13.0 / ((6.0 / 26.0) * (6.0 / 26.0)))
    assert(math.abs(pmi - expected) < 1e-6)
  }

  test("kaplan-meier: censored users leave the risk set without an event") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hr: Int) = new java.sql.Timestamp(base.getTime + hr * 3600000L)
    val e = Seq(
      // u1, u2 purchase at +1h; u4 at +5h; u3 never (censored at +10h end)
      (1L, at(0), 1L, "view", 1.0, "{}"), (2L, at(1), 1L, "purchase", 1.0, "{}"),
      (3L, at(0), 2L, "view", 1.0, "{}"), (4L, at(1), 2L, "purchase", 1.0, "{}"),
      (5L, at(0), 4L, "view", 1.0, "{}"), (6L, at(5), 4L, "purchase", 1.0, "{}"),
      (7L, at(0), 3L, "view", 1.0, "{}"), (8L, at(10), 3L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.survivalKm(e).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // t=1: 4 at risk, 2 convert → S = 1/2; t=5: u3 still AT RISK (not
    // yet censored) so n=2, 1 converts → S = 1/4. Without censoring
    // handling u3 would either vanish (n=1) or count as an event.
    assert(out.keySet === Set(1L, 5L))
    assert(out(1L) === ((4L, 2L, -693147L, 500000L)))
    assert(out(5L) === ((2L, 1L, -1386294L, 250000L)))
  }

  test("mwu drift: doubled midranks exact — separation 1e6, pure tie 500000") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val e = Seq(
      // 'sep': ref {1,2} all below cur {5,6} → AUC(cur larger) = 1
      (1L, at(0), 1L, "sep", 1.0, "{}"), (2L, at(10), 1L, "sep", 2.0, "{}"),
      (3L, at(60), 1L, "sep", 5.0, "{}"), (4L, at(100), 1L, "sep", 6.0, "{}"),
      // 'tie': identical single values → midrank 1.5 doubled = 3, AUC ½
      (10L, at(0), 1L, "tie", 7.0, "{}"), (11L, at(100), 1L, "tie", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.mwuDrift(e).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("sep") === ((2L, 2L, 0L, 1000000L)))
    assert(out("tie") === ((1L, 1L, 1L, 500000L)))
  }

  test("user entropy: single-behavior scores 0, a 50/50 user scores ln 2") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val e = Seq(
      (1L, base, 1L, "view", 1.0, "{}"), (2L, base, 1L, "view", 1.0, "{}"), // bot-like
      (3L, base, 2L, "view", 1.0, "{}"), (4L, base, 2L, "click", 1.0, "{}")) // diverse
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.userEntropyProfile(e).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // user 1: entropy 0 → bucket 0; user 2: ln2 = 0.693147 → each of
    // two terms round(½·ln2·1e6) = 346574 → 693148 micro → bucket 2
    assert(out(0L) === ((1L, 0L, 0L)))
    assert(out(2L) === ((1L, 693148L, 693148L)))
  }

  test("type mix drift: identical mixes score TV 0; a swapped mix is exact") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // ref: 3 a + 1 b; cur: 1 a + 3 b → TV = ½(|¾−¼| + |¼−¾|) = ½
    val e = (
      (1 to 3).map(i => (i.toLong, at(0), 1L, "a", 1.0, "{}")) ++
        Seq((4L, at(0), 1L, "b", 1.0, "{}")) ++
        Seq((5L, at(100), 1L, "a", 1.0, "{}")) ++
        (6 to 8).map(i => (i.toLong, at(100), 1L, "b", 1.0, "{}"))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.typeMixDrift(e).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 4L, 2L, 500000L)))
    // chi2 for the 2×2-per-type homogeneity: each of 4 cells has e = 2,
    // (o−e)² = 1 → 4·(1/2) = 2.0 exactly
    assert(r.getLong(4) === 2000000L)
  }

  test("burstiness: periodic gaps score -1e6, a single spike pair scores positive") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(base.getTime + s * 1000L)
    val e = (
      // 'per': gaps all exactly 60 s → sigma 0 → B = -1e6
      (0 to 4).map(i => (i.toLong, at(i * 60), 1L, "per", 1.0, "{}")) ++
        // 'bur': gaps 1, 1, 598 s → heavy dispersion → B > 0
        Seq(0, 1, 2, 600).zipWithIndex.map { case (s, i) =>
          (10L + i, at(s), 1L, "bur", 1.0, "{}")
        }
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.burstiness(e).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(("per")) === ((4L, 60000L, -1000000L)))
    val (ng, mean, b) = out("bur")
    assert(ng === 3L && mean === 200000L && b > 0L)
  }

  test("heaps curve: cumulative vocab via first-seen deciles equals a direct scan") {
    val docs = (1 to 10).map { i =>
      // doc i introduces token t$i and repeats t1 → vocab grows by 1
      // per decile, tokens by 2
      (i.toLong, s"t$i t1", "en", "s1")
    }.toDF("doc_id", "text", "lang", "source")
    val out = TextOps.heapsCurve(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1 to 10).foreach { b =>
      assert(out(b.toLong) === ((b.toLong, 2L * b, b.toLong)),
        s"bucket $b: ${out(b.toLong)}")
    }
  }

  test("seasonality: exact ppm hour shares from integer epoch arithmetic") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hr: Int, m: Int) = new java.sql.Timestamp(base.getTime + hr * 3600000L + m * 60000L)
    val e = Seq(
      (1L, at(0, 5), 1L, "x", 1.0, "{}"),
      (2L, at(0, 10), 1L, "x", 1.0, "{}"),
      (3L, at(24, 0), 1L, "x", 1.0, "{}"), // next day, hour 0 again
      (4L, at(1, 0), 1L, "x", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.seasonality(e).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out(("x", 0L)) === ((3L, 750000L)))
    assert(out(("x", 1L)) === ((1L, 250000L)))
  }

  test("cohort ltv: offsets from the first-order month, revenue in exact cents") {
    import graft.operators.Stats
    def o(id: Long, cust: Long, date: String, price: Double) =
      (id, cust, "O", price, java.sql.Timestamp.valueOf(s"$date 00:00:00"), "1-URGENT")
    val orders = Seq(
      o(1L, 1L, "2024-01-05", 10.0), o(2L, 1L, "2024-01-20", 20.0),
      o(3L, 1L, "2024-03-02", 5.0),
      o(4L, 2L, "2024-02-10", 7.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")
    val jan = 2024L * 12 + 1
    val feb = jan + 1
    val out = Stats.cohortLtv(orders).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out((jan, 0L)) === ((1L, 3000L)))
    assert(out((jan, 2L)) === ((1L, 500L)))
    assert(out((feb, 0L)) === ((1L, 700L)))
    assert(out.size === 3)
  }

  test("gini: 0 on perfectly even revenue, near 1 when one part has everything") {
    import graft.operators.Stats
    def li(rows: Seq[(Long, Double)]) = rows.zipWithIndex.map { case ((pk, price), i) =>
      (i.toLong, pk, 1L, 1, 1.0, price, 0.0, 0.0)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax")
    val even = Stats.giniRevenue(li(Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0))))
      .collect()(0)
    assert((even.getLong(0), even.getLong(1), even.getLong(2)) === ((4L, 4000L, 0L)))
    // one of n parts holds all revenue → G = (n−1)/n = 0.75
    val conc = Stats.giniRevenue(li(Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 40.0))))
      .collect()(0)
    assert(conc.getLong(2) === 750000L)
  }

  test("sq distortion: bounded by half a step; degenerate dims reconstruct exactly") {
    import graft.operators.Similarity
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Similarity.writeSqModel(spark, embs)
    val out = Similarity.sqDistortion(spark, embs, dir).collect()
    assert(out.length === 64)
    // per-dim [lo, hi] from the same data to bound the step
    val ranges = spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0).toLong, r.getDouble(2) - r.getDouble(1))).toMap
    out.foreach { r =>
      val (dim, maxErr) = (r.getLong(0), r.getLong(3))
      val stepNano = ranges(dim) / 255.0 * 1e9
      // code = floor (not nearest), so the error bound is one full step
      assert(maxErr <= math.ceil(stepNano) + 1, s"dim $dim: $maxErr vs step $stepNano")
      if (ranges(dim) == 0.0) assert(maxErr === 0L)
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("ivf health: occupancy sums to 1e6-ish and dead cells surface with NULL scores") {
    import graft.operators.Similarity
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Similarity.writeIvfModel(spark, embs)
    val out = Similarity.ivfHealth(spark, embs, dir).collect()
    val n = embs.count()
    assert(out.map(_.getLong(1)).sum === n, "every vector assigned exactly once")
    val occ = out.map(_.getLong(2)).sum
    // integer div floors each cell's ppm: within n_cells of 1e6
    assert(occ <= 1000000L && occ >= 1000000L - out.length)
    out.foreach { r =>
      if (r.getLong(1) == 0L) assert(r.isNullAt(3) && r.isNullAt(4), "dead cell must be NULL")
      else assert(!r.isNullAt(3) && r.getLong(3) >= r.getLong(4),
        "mean must dominate min within a cell")
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("silhouette: two tight far clusters score near 1; cell ids are the IVF assignment") {
    import graft.operators.Similarity
    // 8-dim vectors in two orthogonal tight bundles; vec_id < 8 seeds
    // the quantizer so cells 0..7 exist, clusters land on cells
    val mk = (base: Array[Double], eps: Double) => base.map(_ + eps)
    val a = Array(1.0, 0, 0, 0, 1.0, 0, 0, 0)
    val b = Array(0, 1.0, 0, 0, 0, 1.0, 0, 0)
    val rows = (0 until 8).map { i =>
      (i.toLong, (if (i % 2 == 0) mk(a, 0.01 * i) else mk(b, 0.01 * i)).toSeq, i % 2)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val dir = Similarity.writeIvfModel(spark, embs)
    val out = Similarity.silhouette(spark, embs, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out.values.map(_._1).sum === 8L)
    // every cluster is tight and far from the others → strongly positive
    out.values.foreach { case (_, sil) => assert(sil > 500000L, s"sil=$sil") }
    graft.sources.Staging.cleanup(spark)
  }

  test("phash hamming hist: mass at or below the threshold equals the dedup pair count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hist = Multimodal.phashHammingHist(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nDedup = Multimodal.phashDedup(docs).count()
    val below = hist.filter(_._1 <= Multimodal.PhashMaxHamming).values.sum
    assert(below === nDedup)
    assert(hist.values.sum > below, "histogram must also show the rejected tail")
  }

  test("jsd matrix: 0 on identical distributions, ln2 on disjoint vocabularies") {
    val docs = Seq(
      (1L, "a a b", "en", "s1"),
      (2L, "a a b", "en", "s2"), // identical distribution to s1
      (3L, "x y z", "en", "s3")) // disjoint from both
      .toDF("doc_id", "text", "lang", "source")
    val out = TextOps.jsdSourceMatrix(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("s1", "s2")) === ((2L, 0.0)))
    assert(out(("s1", "s3")) === ((0L, 0.693147)))
    assert(out(("s2", "s3")) === ((0L, 0.693147)))
  }

  test("detector kappa: identical flags = 1e6, chance-level = 0, inverted = -1e6") {
    val v = Seq(
      (1L, true, true, true, false),
      (2L, false, false, true, false),
      (3L, true, true, false, true),
      (4L, false, false, false, true))
      .toDF("doc_id", "exact_dup", "minhash_dup", "simhash_dup", "ngram_dup")
    val out = Dedup.detectorKappa(v).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(out(("exact", "minhash")) === 1000000L)
    assert(out(("exact", "simhash")) === 0L)
    assert(out(("exact", "ngram")) === 0L)
    assert(out(("ngram", "simhash")) === -1000000L)
  }

  test("chi2 independence: hand-computed 2x2 table, micro-unit exact") {
    import graft.operators.Stats
    val rows =
      Seq.fill(10)(("A", 0)) ++ Seq.fill(20)(("A", 1)) ++
        Seq.fill(20)(("B", 0)) ++ Seq.fill(10)(("B", 1))
    val c = rows.zipWithIndex
      .map { case ((seg, nat), i) => (i.toLong, s"c$i", nat, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = Stats.chi2Independence(c).collect()(0)
    // e = 15 per cell; each term (o-e)^2/e = 25/15 → 1666667 micro; 4 cells
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((60L, 4L, 1L, 6666668L)))
  }

  test("corr matrix: exact ±1 on linear columns, NULL on zero variance") {
    import graft.operators.Stats
    val li = (1 to 50).map { i =>
      // p_cents = 2q+1 (r=+1 with q), d_bp = -q (r=-1), t_bp constant (NULL)
      (i.toLong, (2.0 * i + 1) / 100.0, -i / 100.0, 0.07)
    }.toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Stats.corrMatrix(li).collect()
      .map(r => (r.getString(0), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(out("q_p") === 1.0)
    assert(out("q_d") === -1.0)
    assert(out("p_d") === -1.0)
    assert(out("q_t").isNaN && out("p_t").isNaN && out("d_t").isNaN)
  }

  test("benford audit: exact ppm shares and Benford expectation constants") {
    import graft.operators.Stats
    val o = Seq(
      (1L, 1L, "O", 1.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, 1L, "O", 19.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (3L, 1L, "O", 99.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (4L, 1L, "O", 100.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (5L, 1L, "O", 0.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")
    val out = Stats.benfordAudit(o).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // sub-1 amount excluded; digits: 1,1,1 (1.5, 19.0, 100.0), 9 (99.0)
    assert(out.keySet === Set(1L, 9L))
    assert(out(1L) === ((3L, 750000L, 301030L)))
    assert(out(9L) === ((1L, 250000L, 45757L)))
  }

  test("cusum: reset identity holds — negative excursions clear, positives accumulate") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // all types share ref mean 10.0 (target 10000 milli); range 0..100min
    def ref(tpe: String, idBase: Long) =
      Seq((idBase, at(0), 1L, tpe, 10.0, "{}"), (idBase + 1, at(10), 1L, tpe, 10.0, "{}"))
    val e = (
      ref("flat", 1L) ++ Seq( // cur deviations 0 → S pinned at 0
        (3L, at(60), 1L, "flat", 10.0, "{}"),
        (4L, at(100), 1L, "flat", 10.0, "{}")) ++
        ref("shift", 10L) ++ Seq( // +1e6 per event → S = 1e6, 2e6, 3e6
          (13L, at(60), 1L, "shift", 1010.0, "{}"),
          (14L, at(70), 1L, "shift", 1010.0, "{}"),
          (15L, at(100), 1L, "shift", 1010.0, "{}")) ++
        ref("reset", 20L) ++ Seq( // +1.5e6, −3e6, +2.5e6 → S = 1.5e6, 0, 2.5e6
          (23L, at(60), 1L, "reset", 1510.0, "{}"),
          (24L, at(70), 1L, "reset", -2990.0, "{}"),
          (25L, at(100), 1L, "reset", 2510.0, "{}"))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.cusumDrift(e).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(out("flat") === ((2L, 10000L, 0L, 0L, -1L)))
    // S2 = 2e6 is NOT > H; only S3 crosses
    assert(out("shift") === ((3L, 10000L, 3000000L, 1L, 15L)))
    // without the reset the third prefix would be 1e6 and never cross —
    // the reset identity is what makes S3 = 2.5e6
    assert(out("reset") === ((3L, 10000L, 2500000L, 1L, 25L)))
  }

  test("ks drift: integer-exact D, zero on identical halves, full separation = 1e6 ppm") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val e = (
      // 'click': same values both halves → D = 0
      Seq(1.0, 2.0, 3.0).zipWithIndex.flatMap { case (v, i) =>
        Seq((i.toLong, at(0), 1L, "click", v, "{}"),
          (10L + i, at(100), 1L, "click", v, "{}"))
      } ++
        // 'error': ref all below cur → D = 1
        Seq((20L, at(0), 2L, "error", 1.0, "{}"), (21L, at(0), 2L, "error", 2.0, "{}"),
          (22L, at(100), 2L, "error", 5.0, "{}"), (23L, at(100), 2L, "error", 6.0, "{}"))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.ksDrift(e).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("click") === ((3L, 3L, 0L)))
    assert(out("error") === ((2L, 2L, 1000000L)))
  }

  test("funnel requires strict in-order progression; ties and reversals don't count") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val e = Seq(
      // user 1: full ordered funnel
      (1L, at(0), 1L, "view", 1.0, "{}"),
      (2L, at(1), 1L, "click", 1.0, "{}"),
      (3L, at(2), 1L, "purchase", 1.0, "{}"),
      // user 2: click BEFORE view, purchase after → reaches view only
      (4L, at(0), 2L, "click", 1.0, "{}"),
      (5L, at(1), 2L, "view", 1.0, "{}"),
      // user 3: click at the SAME ts as view → tie is not progression
      (6L, at(0), 3L, "view", 1.0, "{}"),
      (7L, at(0), 3L, "click", 1.0, "{}"),
      // user 4: never views → not in the funnel at all
      (8L, at(0), 4L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps
      .funnel(e, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(1 -> (3L, 1000000L), 2 -> (1L, 333333L), 3 -> (1L, 333333L)))
  }

  test("retentionCohorts anchors each user at their first-event week") {
    def at(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      // user 1: first week W0 (Mon 2024-01-01), active W0 and W2
      (1L, at("2024-01-02 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, at("2024-01-16 10:00:00"), 1L, "view", 1.0, "{}"),
      // user 2: joins W1, active W1 only (two events, one active week)
      (3L, at("2024-01-08 09:00:00"), 2L, "view", 1.0, "{}"),
      (4L, at("2024-01-09 09:00:00"), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps
      .retentionCohorts(e)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === Map(
      ("2024-01-01", 0) -> (1L, 1L, 1000000L),
      ("2024-01-01", 2) -> (1L, 1L, 1000000L),
      ("2024-01-08", 0) -> (1L, 1L, 1000000L)))
  }

  test("mixture weights scale each domain's epochs to its target share") {
    val d = docsDf(Seq(
      (1L, "a b c d e f g h i j", "en"), // 10 tokens
      (2L, "k l m n o p q r s t", "es"), // 10 tokens
      (3L, ("x " * 20).trim, "de"))) // 20 tokens; total 40
    val out = TextOps.mixtureWeights(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out("en") === ((1L, 10L, 600000L, 2.4))) // 0.60 · 40/10
    assert(out("es") === ((1L, 10L, 250000L, 1.0))) // 0.25 · 40/10
    assert(out("de") === ((1L, 20L, 150000L, 0.3))) // 0.15 · 40/20
    // a domain of all-empty docs: epochs stays finite (zero-token guard)
    val z = TextOps.mixtureWeights(docsDf(Seq((1L, "a b", "en"), (2L, "   ", "fr"))))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(!z("fr").isNaN && !z("fr").isInfinite)
  }

  test("binned quantiles land within half a bin of the exact percentiles") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // values 1.00 .. 100.00 → exact p50 = 50.5, p95 = 95.05
    val e = (1 to 100).map(i => (i.toLong, base, 1L, "click", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.quantilesBinned(e).collect()(0)
    assert(r.getString(0) === "click" && r.getLong(1) === 100L)
    // rank ceil(100/2)=50 → value 50.0 → bin 200 → est (200+0.5)/4 = 50.125
    assert(r.getDouble(2) === 50.125)
    // rank ceil(19·100/20)=95 → value 95.0 → bin 380 → est 95.125
    assert(r.getDouble(3) === 95.125)
    val exact = EventOps.quantiles(e).collect()(0)
    assert(math.abs(r.getDouble(2) - exact.getDouble(1)) <= 0.5)
    assert(math.abs(r.getDouble(3) - exact.getDouble(2)) <= 0.5)
  }

  test("Tukey-fence anomalies count exactly the planted extremes per type") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 'click': uniform 1..100 (fences ≈ [−49, 150]) + three planted
    // extremes; 'view': uniform only → zero outliers
    val rows =
      (1 to 100).map(i => (i.toLong, base, 1L, "click", i.toDouble, "{}")) ++
        Seq((201L, base, 1L, "click", 200.0, "{}"),
          (202L, base, 1L, "click", 300.0, "{}"),
          (203L, base, 1L, "click", -60.0, "{}")) ++
        (1 to 50).map(i => (300L + i, base, 2L, "view", i.toDouble, "{}"))
    val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps
      .anomalies(e)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got("click") === ((103L, 3L, 300.0)))
    assert(got("view") === ((50L, 0L, 50.0)))
    // fences are robust: the outliers did not drag the upper fence past
    // the largest planted extreme (a mean/3σ rule would have)
    val click = EventOps.anomalies(e).filter(col("event_type") === "click").collect()(0)
    assert(click.getDouble(3) < 200.0)
  }

  test("asOfJoin matches each left row to the latest prior right row") {
    import graft.operators.AsOfJoin
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val left = Seq((1L, 7L, ts(10), 100.0), (2L, 7L, ts(30), 200.0), (3L, 8L, ts(5), 300.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((7L, ts(8), 1.5), (7L, ts(25), 2.5), (9L, ts(1), 9.9))
      .toDF("user_id", "ts", "click_value")
    val out = AsOfJoin
      .asOfLeftWithTs(left, right, "user_id", "ts", Seq("click_value"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Any]("asof_click_value")), Option(r.getAs[Any]("asof___rts"))))
      .toMap
    assert(out(1L)._1 === Some(1.5)) // latest click ≤ t10 is t8
    assert(out(2L)._1 === Some(2.5)) // latest click ≤ t30 is t25
    assert(out(3L)._1 === None) // user 8 has no clicks → null
  }

  test("asOfJoin carries the whole matched right row even when a payload field is NULL") {
    import graft.operators.AsOfJoin
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val left = Seq((1L, 7L, ts(30), 100.0)).toDF("event_id", "user_id", "ts", "value")
    // t8: (a=1.5, b="x"); t25: (a=NULL, b="y") — the matched row is t25,
    // so a MUST come back NULL (a per-column carry would wrongly reach
    // back to t8's 1.5 and stitch a row that never existed).
    val right = Seq(
      (7L, ts(8), Option(1.5), "x"),
      (7L, ts(25), Option.empty[Double], "y"))
      .toDF("user_id", "ts", "a", "b")
    val row = AsOfJoin
      .asOfLeftWithTs(left, right, "user_id", "ts", Seq("a", "b"))
      .collect()
      .head
    assert(Option(row.getAs[Any]("asof_a")) === None)
    assert(row.getAs[String]("asof_b") === "y")
    assert(row.getAs[java.sql.Timestamp]("asof___rts") === ts(25))
  }

  test("saltedCountSum equals direct groupBy on a pathologically skewed key") {
    import graft.operators.SkewOps
    import org.apache.spark.sql.functions.{col, pmod}
    // 10k rows on one hot key, 10 on another
    val rows = (1L to 10000L).map(i => ("hot", i)) ++ (1L to 10L).map(i => ("cold", i))
    val df = rows.toDF("k", "v")
    val salted = SkewOps
      .saltedCountSum(df, col("k"), col("v"), pmod(col("v"), org.apache.spark.sql.functions.lit(16)))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(salted("hot") === ((10000L, 10000L * 10001L / 2)))
    assert(salted("cold") === ((10L, 55L)))
  }

  test("lshTopK recall@3 vs brute force is measured and floored") {
    import graft.operators.Similarity
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val brute = hits(Similarity.bruteForceTopK(embs, nQueries = 50, k = 3))
    val lsh = hits(Similarity.lshTopK(embs, nQueries = 50, k = 3))
    val ivf = hits(Similarity.ivfTopK(embs, nQueries = 50, k = 3, nProbe = 3))
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    info(f"lsh recall@3 = $lshRecall%.3f (${(brute & lsh).size}/${brute.size})")
    info(f"ivf recall@3 = $ivfRecall%.3f (${(brute & ivf).size}/${brute.size})")
    // Recall < 1 by construction (bucket/cell misses); the floors make
    // the scale paths' quality tested numbers instead of doc claims.
    assert(lshRecall >= 0.4)
    assert(ivfRecall >= 0.4)
  }

  test("stored-IVF probe follows the artifact — trains nothing, reads the model") {
    import graft.operators.Similarity
    import spark.implicits._
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    // 1) the persisted model reproduces the trained path bit-for-bit
    val modelDir = Similarity.writeIvfModel(spark, embs)
    val trained = Similarity.ivfTrainedTopK(embs, nQueries = 20, k = 3, nProbe = 2)
      .orderBy(col("q_id"), col("rank")).collect()
    val stored = Similarity.ivfStoredTopK(spark, embs, modelDir, nQueries = 20, k = 3, nProbe = 2)
      .orderBy(col("q_id"), col("rank")).collect()
    assert(stored === trained)
    // 2) overwrite the artifact with a SINGLE degenerate centroid: if the
    // probe read the model (and did not silently retrain), every vector
    // lands in that one cell and the probe degrades to exact brute-force
    // top-k — a result no 8-cell retrain could produce
    val oneCell = Seq((0L, Array.fill(Similarity.Dim)(1L))).toDF("cid", "c")
    oneCell.coalesce(1).write.mode("overwrite").parquet(modelDir)
    val degr = Similarity.ivfStoredTopK(spark, embs, modelDir, nQueries = 20, k = 3, nProbe = 2)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(embs, nQueries = 20, k = 3)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(degr === brute, "single-cell model must degrade the probe to brute force")
    graft.sources.Staging.cleanup(spark)
  }

  test("stored-PQ ADC follows the artifact — trains nothing, reads the codebooks") {
    import graft.operators.Similarity
    import spark.implicits._
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    // 1) the persisted codebooks reproduce the train-inline path bit-for-bit
    val modelDir = Similarity.writePqModel(spark, embs)
    val trained = Similarity.pqTopK(embs, nQueries = 20, k = 3)
      .orderBy(col("q_id"), col("rank")).collect()
    val stored = Similarity.pqStoredTopK(spark, embs, modelDir, nQueries = 20, k = 3)
      .orderBy(col("q_id"), col("rank")).collect()
    assert(stored === trained)
    // 2) overwrite the artifact with ONE degenerate centroid per
    // subspace: if the ADC read the codebooks (and did not silently
    // retrain), every candidate reconstructs identically, every ADC
    // score ties, and ranking collapses to the n_id tie-break — the
    // k smallest non-self ids per query, a result no 128-cell retrain
    // could produce
    val oneCode = (0 until Similarity.PqM)
      .map(m => (m, 0L, Array.fill(Similarity.PqSubDim)(1L)))
      .toDF("m", "cid", "c")
    oneCode.coalesce(1).write.mode("overwrite").parquet(modelDir)
    val degr = Similarity.pqStoredTopK(spark, embs, modelDir, nQueries = 5, k = 3)
      .select(col("q_id"), col("n_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0L until 5L).foreach { q =>
      val expect = (0L until 4L).filter(_ != q).take(3).toSet
      assert(degr(q) === expect, s"query $q should tie-break to the smallest ids")
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("pqTopK: full per-query k, deterministic, and recall floored") {
    import graft.operators.Similarity
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Similarity.pqTopK(embs, nQueries = 50, k = 3).collect()
    val b = Similarity.pqTopK(embs, nQueries = 50, k = 3).collect()
    assert(a.length === 150, "every query gets its full top-3")
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
      b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    val rec = Similarity
      .pqRecall(embs, nQueries = 50, k = 3)
      .agg(org.apache.spark.sql.functions.avg(col("recall")))
      .head()
      .getDouble(0)
    info(f"pq recall@3 = $rec%.3f (8 subspaces x 128 codes, cosine ADC)")
    // 56-bit codes in place of 64 floats; the floor documents a tested
    // minimum, not a quality claim
    assert(rec >= 0.4)
  }

  test("ivfpqTopK: IVF pruning only removes candidates; composition recall floored") {
    import graft.operators.Similarity
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val full = Similarity
      .pqTopK(embs, nQueries = 50, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val composed = Similarity.ivfpqTopK(embs, nQueries = 50, k = 3, nProbe = Similarity.KmeansCells)
    // probing EVERY coarse cell makes IVF a no-op: the composed path must
    // then equal the full ADC scan exactly (same codes, same LUT)
    assert(composed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === full)
    val rec = Similarity
      .ivfpqRecall(embs, nQueries = 50, k = 3, nProbe = 3)
      .agg(org.apache.spark.sql.functions.avg(col("recall")))
      .head()
      .getDouble(0)
    info(f"ivfpq recall@3 = $rec%.3f (nProbe=3 of ${Similarity.KmeansCells} cells)")
    assert(rec >= 0.3)
  }

  test("ivfpqRerankTopK: exact under full probe/cand; per-query recall never below plain ADC") {
    import graft.operators.Similarity
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    // probing every cell with a corpus-wide candidate list makes both
    // approximations no-ops: the exact re-rank must equal brute force
    val full = Similarity
      .ivfpqRerankTopK(embs, nQueries = 20, k = 3, nProbe = Similarity.KmeansCells, nCand = 10000)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(embs, nQueries = 20, k = 3)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === brute, "full-probe full-candidate re-rank must be exact")
    // within the SAME candidate list, the exact tail retains every global
    // top-k member the list contains, while ADC order may drop some —
    // so re-ranked recall dominates plain ADC recall PER QUERY
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("q_id"), col("n_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact3 = byQuery(Similarity.bruteForceTopK(embs, nQueries = 50, k = 3))
    val plain = byQuery(Similarity.ivfpqTopK(embs, nQueries = 50, k = 3, nProbe = 3))
    val rr = byQuery(Similarity.ivfpqRerankTopK(embs, nQueries = 50, k = 3, nProbe = 3, nCand = 10))
    exact3.keys.foreach { q =>
      val hitPlain = (plain.getOrElse(q, Set.empty) & exact3(q)).size
      val hitRr = (rr.getOrElse(q, Set.empty) & exact3(q)).size
      assert(hitRr >= hitPlain, s"query $q: re-rank recall $hitRr below ADC recall $hitPlain")
    }
    val recPlain = plain.map { case (q, s) => (s & exact3(q)).size }.sum / (3.0 * exact3.size)
    val recRr = rr.map { case (q, s) => (s & exact3(q)).size }.sum / (3.0 * exact3.size)
    info(f"ivfpq recall@3 $recPlain%.3f -> rerank $recRr%.3f (nProbe=3, nCand=10)")
  }

  test("semanticDedup: exact duplicates share a cluster and the higher id is marked") {
    val e = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Dedup.semanticDedup(e, minCosine = 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2), r.getDouble(3)))).toMap
    // identical vectors tie on every cell score and tie-break to the same
    // (min-cid) cell; the lower id is the kept representative
    assert(out(0L)._1 === out(1L)._1, "identical vectors must share a cluster")
    assert(!out(0L)._2 && out(1L)._2, "only the higher id of the pair is a dup")
    assert(out(1L)._3 === 1.0)
    assert(!out(2L)._2 && !out(3L)._2, "orthogonal vectors are kept")
    assert(out(2L)._3 === -2.0 && out(3L)._3 === -2.0)
  }

  test("multimodal mapPartitions decode with deterministic fake decoder") {
    val d = docsDf(Seq((1L, "abcd", "en"))).select(col("doc_id"), col("text"))
    val media = Multimodal.asMediaTable(d)
    val feats = Multimodal
      .decodeFeatures(spark, media, Multimodal.BinaryDecoder.DeterministicFake, frameBytes = 2)
      .collect()
    assert(feats.length === 1)
    val f = feats(0)
    assert(f.n_bytes === 4L && f.n_frames === 2L)
    assert(f.features.toSeq === Seq(4.0, (97 + 98 + 99 + 100).toDouble, 97.0, 394 / 4.0))
  }

  test("multimodal real decoder reads PNG payloads end-to-end through mapPartitions") {
    import spark.implicits._
    // 3×2 RGB PNG with known pixels, encoded purely in-JVM
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, rgb)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // solid (16, 32, 48): mean over the 3 bands = (16+32+48)/3
    val direct = Multimodal.BinaryDecoder.RealImageDecoder.decode(png(3, 2, 0x102030))
    assert(direct.toSeq === Seq(3.0, 2.0, 3.0, 32.0))
    // the same decoder through the distributed mapPartitions path
    val p1 = png(3, 2, 0x102030)
    val p2 = png(4, 4, 0x000000)
    val media = Seq(
      (1L, p1, "image/png", p1.length.toLong),
      (2L, p2, "image/png", p2.length.toLong)).toDF("doc_id", "payload", "mime", "n_bytes")
    val feats = Multimodal
      .decodeFeatures(spark, media, Multimodal.BinaryDecoder.RealImageDecoder, frameBytes = 64)
      .collect()
      .sortBy(_.doc_id)
    assert(feats(0).features.toSeq === Seq(3.0, 2.0, 3.0, 32.0))
    assert(feats(1).features.toSeq === Seq(4.0, 4.0, 3.0, 0.0))
    // undecodable bytes fail loudly, never alias as a black frame
    intercept[IllegalArgumentException] {
      Multimodal.BinaryDecoder.RealImageDecoder.decode(Array[Byte](1, 2))
    }
  }

  test("sequence packing: bins fill in doc_id order within a lang shard") {
    val d = docsDf(Seq(
      (1L, "a b c d", "en"), // 4 tokens, cum 0 → bin 0 off 0
      (2L, "e f g", "en"), //   3 tokens, cum 4 → bin 0 off 4
      (3L, "h i", "en"), //     2 tokens, cum 7 → bin 1 off 1
      (4L, "x y z", "fr"))) //  fr shard restarts: cum 0 → bin 0
    val out = TextOps.pack(d, binTokens = 6L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((4L, 0L, 0L)))
    assert(out(2L) === ((3L, 0L, 4L)))
    assert(out(3L) === ((2L, 1L, 1L)))
    assert(out(4L) === ((3L, 0L, 0L)))
  }

  test("stratified sample: per-lang rates applied to the content hash") {
    val d = docsDf(Seq((1L, "aaa", "en"), (2L, "aaa", "de")))
    val out = TextOps.stratifiedSample(d).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    val bucket = java.lang.Math.floorMod(
      ("aaa".foldLeft(0L)((a, c) => (a * 31 + c) % Parity.TokP) * Parity.TokP2 +
        "aaa".foldLeft(0L)((a, c) => (a * 131 + c) % Parity.TokP2)),
      1000L)
    assert(out(1L) === (bucket < 500L)) // en rate
    assert(out(2L) === (bucket < 125L)) // default rate
  }

  test("pii redact: synthetic email and phone are counted and masked") {
    val d = docsDf(Seq((7L, "hello world", "en")))
    val r = TextOps.piiRedact(d).collect()(0)
    // aug = "hello world contact u7@mail.example or call 555-0007"
    assert(r.getLong(1) === 1L) // n_emails
    assert(r.getLong(2) === 1L) // n_phones
    val red = "hello world contact <EMAIL> or call <PHONE>"
    assert(r.getLong(3) === red.length.toLong)
    assert(r.getLong(4) === red.foldLeft(0L)((a, c) => (a * 31 + c) % Parity.TokP))
  }

  test("star-per-bucket candidate pairs cluster identically to clique pairs") {
    // three exact-duplicate groups + singletons: every bucket is a clique
    val d = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the quick brown fox jumps over the lazy dog", "en"),
      (3L, "the quick brown fox jumps over the lazy dog", "en"),
      (4L, "completely different words entirely here now", "en"),
      (5L, "completely different words entirely here now", "en"),
      (6L, "a lone singleton document with its own text", "en")))
    def clusterMap(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.clusters(d, pairs).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val star = clusterMap(Dedup.minhashCandidatePairs(d))
    val clique = clusterMap(Dedup.minhashCandidates(d).select(col("doc_a"), col("doc_b")))
    assert(star === clique)
    assert(star(1L) === ((1L, true)) && star(2L) === ((1L, false)) && star(3L) === ((1L, false)))
    assert(star(4L) === ((4L, true)) && star(5L) === ((4L, false)))
    assert(star(6L) === ((6L, true)))
  }

  test("ngram jaccard DF cap: a ubiquitous shingle generates no pairs") {
    // every doc carries the boilerplate trigram "terms of service";
    // only docs 1 and 2 additionally share a discriminative trigram
    val d = docsDf(Seq(
      (1L, "alpha beta gamma terms of service", "en"),
      (2L, "alpha beta gamma x terms of service", "en"),
      (3L, "unrelated words entirely terms of service", "en"),
      (4L, "different text altogether terms of service", "en"),
      (5L, "nothing shared here at all terms of service", "en")))
    // cap 3 < 5 docs: "terms of service" (and the other boilerplate-
    // spanning trigrams present in all 5 docs) drop out of the index
    val out = Dedup.ngramJaccardPairs(d, maxDf = 3L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // pairs sharing ONLY capped shingles are gone entirely
    assert(out.keySet === Set((1L, 2L)))
    // capped sets: doc1 {abg, bg-terms, g-terms-of} minus DF>3 ones…
    // inter/uni are over the KEPT shingles only — both > 0, inter < uni
    val (inter, uni) = out((1L, 2L))
    assert(inter >= 1L && uni > inter)
    // without the cap the boilerplate shingle pairs everything: 10 pairs
    assert(Dedup.ngramJaccardPairs(d, maxDf = 50L).count() === 10L)
  }

  test("decontamination DF cap: boilerplate trigrams are not leakage evidence") {
    // doc 0 is benchmark; its trigram "terms of service" also appears in
    // every corpus doc (boilerplate), while "secret eval question" is
    // shared only with doc 1 (true leak)
    val d = docsDf(Seq(
      (0L, "secret eval question terms of service", "en"),
      (1L, "the secret eval question terms of service", "en"),
      (2L, "prose one terms of service", "en"),
      (3L, "prose two terms of service", "en"),
      (4L, "prose three terms of service", "en")))
    val out = TextOps.decontaminate(d, maxDf = 2L).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    // docs 2-4 share only the DF-4 boilerplate trigram → NOT contaminated
    assert(out === Map(0L -> false, 1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // without the cap, boilerplate flags the whole corpus
    val uncapped = TextOps.decontaminate(d, maxDf = 50L).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(uncapped === Map(0L -> false, 1L -> true, 2L -> true, 3L -> true, 4L -> true))
  }

  test("decontamination flags only non-benchmark docs sharing a trigram") {
    val d = docsDf(Seq(
      (0L, "secret eval question here", "en"), // benchmark (0 % 97 == 0)
      (1L, "the secret eval question leaked", "en"), // shares "secret eval question"
      (2L, "totally unrelated prose words", "en")))
    val out = TextOps.decontaminate(d).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
    assert(out === Set((0L, true, false), (1L, false, true), (2L, false, false)))
  }

  test("repetition ratio: degenerate loops score high, short docs zero") {
    val d = docsDf(Seq(
      (1L, "spam spam spam spam spam", "en"), // one trigram ×3: ratio 1.0
      (2L, "a b c d", "en"), // 2 distinct trigrams: ratio 0.5
      (3L, "hi", "en"))) // < 3 tokens: no grams
    val out = TextOps.repetition(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out === Set((1L, 3L, 3L, 1.0), (2L, 2L, 1L, 0.5), (3L, 0L, 0L, 0.0)))
  }

  test("fixed-point kmeans recovers well-separated clusters, deterministically") {
    import spark.implicits._
    // two orthogonal clusters in 64-dim: vecs 0,2,4,… near axis e0,
    // vecs 1,3,5,… near axis e1 — init (vec 0, vec 1) seeds one
    // centroid in each cluster
    def vec(axis: Int, bump: Double): Seq[Float] =
      (0 until Similarity.Dim).map(j => if (j == axis) 1.0f else if (j == axis + 2) bump.toFloat else 0.0f)
    val rows = (0L until 10L).map { i =>
      (i, vec((i % 2).toInt, 0.01 * i), (i % 2).toString)
    }
    val embs = rows.toDF("vec_id", "embedding", "label")
    val cents = Similarity.kmeansFixed(embs, kCells = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cents.keySet === Set(0L, 1L))
    // cluster 0's centroid points along axis 0, cluster 1's along axis 1
    assert(cents(0L)(0) === Similarity.KmeansScale)
    assert(cents(1L)(1) === Similarity.KmeansScale)
    assert(cents(0L)(1) === 0L && cents(1L)(0) === 0L)
    // deterministic across runs (integer arithmetic end to end)
    val again = Similarity.kmeansFixed(embs, kCells = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again === cents)
  }

  test("trained IVF returns k ranked neighbors per query at sf0.001") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.ivfTrainedTopK(embs, nQueries = 10, k = 3, nProbe = 2).collect()
    val perQ = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQ.size === 10)
    assert(perQ.values.forall(_ === 3))
  }

  test("KMV sketch: degenerate below k, within ~3·stderr of exact above k") {
    import graft.operators.Sketches
    // tiny corpus (4 distinct trigrams < k): sketch IS the exact count
    val small = docsDf(Seq((1L, "a b c d", "en"), (2L, "a b c x y", "en")))
    val r1 = Sketches.kmvDistinctShingles(small, k = 256).collect()(0)
    assert(r1.getLong(0) === 4L) // {abc, bcd, bcx, cxy} — abc shared
    assert(r1.getLong(3) === r1.getLong(1)) // estimate = n_mins (degenerate)
    // larger universe (sf0.001 docs): estimate within 20% of exact
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r2 = Sketches.kmvDistinctShingles(docs, k = 256).collect()(0)
    val (exact, est) = (r2.getLong(0).toDouble, r2.getLong(3).toDouble)
    assert(est > exact * 0.8 && est < exact * 1.2, s"exact=$exact est=$est")
    // deterministic across runs
    val again = Sketches.kmvDistinctShingles(docs, k = 256).collect()(0)
    assert(again.getLong(3) === r2.getLong(3))
  }

  test("CMS estimates are exact-or-over, tight on the harness vocabulary") {
    import graft.operators.Sketches
    // token frequencies: a×4, b×2, c×1 — top-2 candidates are a and b
    val docs = docsDf(Seq((1L, "a a b c", "en"), (2L, "a a b", "en")))
    val got = Sketches
      .cmsHeavyHitters(docs, topN = 2)
      .orderBy(col("token"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._2)).toSeq === Seq(("a", 4L), ("b", 2L)))
    // min-of-counters NEVER undercounts, and the overcount column is the delta
    got.foreach { case (_, exact, est, over) =>
      assert(est >= exact)
      assert(over === est - exact)
    }
    // real vocabulary: estimates stay exact-or-over and close — with
    // ~1.5k distinct tokens in 4×512 cells, collisions are sparse enough
    // that top-20 overcounts stay under 10% of the true frequency
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rr = Sketches.cmsHeavyHitters(real).collect()
    assert(rr.length === 20)
    rr.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact)
      assert(est - exact <= math.max(1L, exact / 10), s"${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("dup spans: merges consecutive duplicated 3-gram runs, 1-based, inclusive") {
    // docs 1 and 2 share the 5-token prefix "w1 w2 w3 w4 w5" → grams at
    // positions 1..3 in both, merged into one span covering tokens 1..5;
    // their tails are unique. doc 3 shares nothing.
    val d = docsDf(Seq(
      (1L, "w1 w2 w3 w4 w5 u1 u2 u3", "en"),
      (2L, "w1 w2 w3 w4 w5 v1 v2 v3", "en"),
      (3L, "x1 x2 x3 x4 x5 x6", "en")))
    val out = Dedup.dupSpans(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set((1L, 1L, 5L, 3L), (2L, 1L, 5L, 3L)))
  }

  test("dup spans: within-doc repetition splits into separate islands") {
    // "a b c" occurs twice inside doc 1 (positions 1 and 5, gap at 2-4
    // broken by the unique m1 m2 run between) → two 1-gram spans
    val d = docsDf(Seq((1L, "a b c m1 a b c", "en"), (2L, "q r s t", "en")))
    val out = Dedup.dupSpans(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set((1L, 1L, 3L, 1L), (1L, 5L, 7L, 1L)))
  }

  test("dup ratio: overlapping gram windows count each token once") {
    // docs 1, 2 share "w1 w2 w3 w4": duplicated grams at positions 1, 2
    // cover tokens 1..4 (token 2, 3 covered twice — counted once);
    // doc 1 has 6 tokens → 4/6, doc 2 has 4 → 4/4; doc 3 untouched → 0
    val d = docsDf(Seq(
      (1L, "w1 w2 w3 w4 u1 u2", "en"),
      (2L, "w1 w2 w3 w4", "en"),
      (3L, "z1 z2 z3", "en")))
    val out = Dedup.dupTokenRatio(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out === Set(
      (1L, 6L, 4L, 0.666667),
      (2L, 4L, 4L, 1.0),
      (3L, 3L, 0L, 0.0)))
  }

  test("grouped kmv: small universe per source is exact; estimator is deterministic") {
    val d = Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a b d", "en", "s1"),
      (3L, "x y", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val out = Sketches.kmvPerSource(d, k = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    // universes (4 and 2 distinct tokens) are below k → estimate exact
    assert(out === Set(("s1", 4L, 4L, 4L), ("s2", 2L, 2L, 2L)))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val big = Sketches.kmvPerSource(docs, k = 64).collect()
    assert(big.nonEmpty)
    big.foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getLong(4).toDouble)
      assert(est > exact * 0.6 && est < exact * 1.4, s"${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("kmv jaccard matrix: small universes exact; estimate tracks exact on corpus") {
    // universes below k → the sketch IS the set, so est_jaccard == exact
    val d = Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b x y", "en", "s2"),
      (3L, "p q", "en", "s3")).toDF("doc_id", "text", "lang", "source")
    val out = Sketches.kmvJaccardMatrix(d, k = 64).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    out.foreach { case (pair, (est, exact)) =>
      assert(est === exact, s"$pair: est=$est exact=$exact (sub-k regime must be exact)")
    }
    assert(out(("s1", "s2"))._2 === 0.333333) // |{a,b}| / |{a,b,c,d,x,y}|
    assert(out(("s1", "s3"))._2 === 0.0)
    // corpus: estimator bounded-error vs the exact eval column
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val big = Sketches.kmvJaccardMatrix(docs, k = 64).collect()
    assert(big.nonEmpty)
    big.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(est - exact) < 0.25,
        s"${r.getString(0)}/${r.getString(1)}: est=$est exact=$exact")
    }
    // determinism: compare keyed by pair — collect order is not part
    // of the contract (the registered query orders explicitly)
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    val again = Sketches.kmvJaccardMatrix(docs, k = 64).collect()
    assert(keyed(again) === keyed(big))
  }

  test("hll per source: max-merge registers, deterministic, sane error") {
    // tiny corpus: registers still deterministic, zero-register column
    // exposes the small-range regime instead of hiding it
    val d = Seq(
      (1L, "a b c d e", "en", "s1"),
      (2L, "a b c x y", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val r1 = Sketches.hllPerSource(d).collect()
    assert(r1.length === 1)
    assert(r1(0).getLong(1) === 5L) // {abc bcd cde} ∪ {abc bcx cxy} — abc shared
    assert(r1(0).getLong(2) >= 59L) // ≤ 5 of 64 registers hit
    val again = Sketches.hllPerSource(d).collect()
    assert(again(0).getLong(3) === r1(0).getLong(3))
    // real corpus: per-source shingle universes (~1.3k ≫ 2.5·m = 160)
    // are in the raw estimator's design regime — every register hit,
    // errors within a few σ of the 13% standard error for m = 64
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val big = Sketches.hllPerSource(docs).collect()
    assert(big.length >= 10)
    big.foreach { r =>
      assert(r.getLong(2) === 0L, s"${r.getString(0)}: zero registers in raw regime")
      assert(r.getLong(4) < 600L, s"${r.getString(0)}: err ${r.getLong(4)}‰")
    }
    val meanErr = big.map(_.getLong(4)).sum.toDouble / big.length
    info(f"hll mean |err| = ${meanErr / 10}%.1f%%")
    assert(meanErr < 250.0)
  }

  test("profile_table: exact stats right, HLL sane on key columns") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val out = Sketches.profileLineitem(li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet === Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"))
    val n = li.count()
    out.values.foreach { case (rows, nulls, _, _) => assert(rows === n && nulls === 0L) }
    // key columns (cardinality ≫ 2.5·m) must estimate within ~3σ;
    // tiny-cardinality columns are the documented small-range regime
    val (_, _, exact, est) = out("l_orderkey")
    assert(exact > 160L) // sanity: the column really is high-cardinality
    assert(math.abs(est - exact).toDouble / exact < 0.45, s"exact=$exact est=$est")
  }

  test("lsh recall report covers every query and stays within [0,1]") {
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.lshRecall(embs, nQueries = 20, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 20)
    assert(out.forall { case (_, h, rc) => h >= 0 && h <= 3 && rc >= 0.0 && rc <= 1.0 })
    // ties out to the measured-recall floor asserted above
    val mean = out.map(_._2).sum.toDouble / (3.0 * out.length)
    info(f"lshRecall mean recall@3 = $mean%.3f")
    assert(mean >= 0.3)
  }

  test("bm25TopK matches an independently hand-computed corpus") {
    val d = docsDf(Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha alpha beta gamma", "en"),
      (3L, "alpha beta", "en"),
      (4L, "delta epsilon", "en")))
    val out = TextOps.bm25TopK(d, nTerms = 3, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // query = top-3 df terms: alpha(3), beta(3), gamma(2); doc 4 matches none
    assert(!out.exists(_._1 == 4L))
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(1L)._2 === 3L)
    assert(byDoc(2L)._2 === 3L)
    assert(byDoc(3L)._2 === 2L)
    // independent closed-form recomputation (same literals, same rounding)
    val n = 4.0
    val avgdl = (3 + 4 + 2 + 2) / 4.0
    def idf(df: Long) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Long, dl: Long, df: Long) = {
      val raw = idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def doc(scores: Seq[Double]) =
      BigDecimal(scores.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDoc(1L)._3 === doc(Seq(s(1, 3, 3), s(1, 3, 3), s(1, 3, 2))))
    assert(byDoc(2L)._3 === doc(Seq(s(2, 4, 3), s(1, 4, 3), s(1, 4, 2))))
    assert(byDoc(3L)._3 === doc(Seq(s(1, 2, 3), s(1, 2, 3))))
    // output order: bm25 desc (ties broken by doc_id upstream)
    assert(out.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("stored-SQ serving follows the artifact and bounds quantization error") {
    import graft.operators.Similarity
    import spark.implicits._
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val modelDir = Similarity.writeSqModel(spark, embs)
    val out = Similarity.sqStoredTopK(spark, embs, modelDir, nQueries = 3, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 12)
    // every served score within the per-dim quantization error bound of
    // the exact inner product: |err| ≤ Σ_d |q_d|·step_d (residuals ∈ [0, step))
    val vecs = embs.select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val step = spark.read.parquet(modelDir).collect()
      .map(r => (r.getInt(0), (r.getDouble(2) - r.getDouble(1)) / 255.0))
      .sortBy(_._1).map(_._2)
    out.foreach { case (q, nId, score) =>
      val qv = vecs(q)
      val exact = qv.zip(vecs(nId)).map { case (a, b) => a * b }.sum
      val bound = qv.zip(step).map { case (a, st) => math.abs(a) * st }.sum
      assert(
        math.abs(score - exact) <= bound + 1e-6,
        s"q=$q n=$nId score=$score exact=$exact bound=$bound")
    }
    // planted degenerate artifact: lo=hi=0 → every code 0, every score
    // dot(q, lo)=0 — constant per query, so ranking collapses to the
    // n_id tie-break; no silent retrain could produce this
    (1 to 64).map(d => (d, 0.0, 0.0)).toDF("dim", "lo", "hi")
      .coalesce(1).write.mode("overwrite").parquet(modelDir)
    val degr = Similarity.sqStoredTopK(spark, embs, modelDir, nQueries = 3, k = 3)
      .select(col("q_id"), col("n_id"), col("score")).collect()
    assert(degr.forall(_.getDouble(2) === 0.0))
    val byQ = degr.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0L until 3L).foreach { q =>
      assert(byQ(q) === (0L until 4L).filter(_ != q).take(3).toSet)
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("stored-BM25 serving follows the artifact — planted vocabulary steers the query") {
    import spark.implicits._
    val d = docsDf(Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha alpha beta gamma", "en"),
      (3L, "alpha beta", "en"),
      (4L, "delta epsilon", "en")))
    // 1) the persisted model reproduces the self-derived path bit-for-bit
    val modelDir = TextOps.writeBm25Model(spark, d)
    val inline = TextOps.bm25TopK(d, nTerms = 3, k = 10).collect()
    val stored = TextOps.bm25ApplyStored(spark, d, modelDir, nTerms = 3, k = 10).collect()
    assert(stored === inline)
    // 2) plant a vocabulary where 'delta' dominates df: the stored query
    // becomes {delta}, so only doc 4 can score — a silent re-derivation
    // from the corpus (where alpha/beta dominate) could never produce this
    Seq(
      (Some("delta"), Some(100L), Option.empty[Long], Option.empty[Long]),
      (Option.empty[String], Option.empty[Long], Some(4L), Some(11L)))
      .toDF("term", "df", "n_docs", "tot_tokens")
      .coalesce(1).write.mode("overwrite").parquet(modelDir)
    val planted = TextOps.bm25ApplyStored(spark, d, modelDir, nTerms = 1, k = 10).collect()
    assert(planted.map(_.getLong(0)).toSeq === Seq(4L))
    graft.sources.Staging.cleanup(spark)
  }

  test("phashDedup pairs identical prefixes at hamming 0 and drops boilerplate buckets") {
    import graft.operators.Multimodal
    val base = "x" * 64
    // two docs sharing the 64-byte prefix → identical signature → a
    // hamming-0 pair; one unrelated doc with a different byte profile
    val d = docsDf(Seq(
      (1L, base + " tail one", "en"),
      (2L, base + " other tail", "en"),
      (3L, "Z9" * 40, "en")))
    val pairs = Multimodal.phashDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)))
    // 52 docs sharing one prefix: every band bucket exceeds the cap
    // (boilerplate) → the whole clique contributes NO pairs
    val boiler = docsDf((1L to 52L).map(i => (i, base + s" tail $i", "en")))
    assert(Multimodal.phashDedup(boiler).collect().isEmpty)
  }

  test("hard negatives cross labels; label outliers are per-label k") {
    import graft.operators.Similarity
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val hn = Similarity.hardNegatives(embs, nQueries = 10, k = 3).collect()
    assert(hn.length === 30)
    assert(
      hn.forall(r => r.getInt(1) != r.getInt(3)),
      "a hard negative must carry a different label than its query")
    val labels = embs.select(col("label")).distinct().count()
    val out = Similarity.labelOutliers(embs, k = 5).collect()
    assert(out.length === labels * 5)
    // outliers rank ascending by similarity: rank 1 is the farthest
    val byLabel = out.groupBy(_.getInt(0))
    byLabel.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("stored-landmark serving follows the artifact — planted distances fold exactly") {
    import graft.operators.GraphOps
    import spark.implicits._
    // plant a 2-landmark table: u = 9 (the sample-source row),
    // v = 0 (the only id ≡ 0 mod 97); est(9, 0) = min(2+5, 10+1) = 7 —
    // values no sweep over any real edge table would produce
    val dir = graft.sources.Staging.freshDir("landmark-model-test")
    Seq((9L, 1L, 2L), (9L, 2L, 10L), (0L, 1L, 5L), (0L, 2L, 1L))
      .toDF("id", "landmark", "dist")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val out = GraphOps.landmarkEstimateStored(spark, dir, nLandmarks = 8).collect()
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getLong(2)) === ((9L, 0L, 7L)))
    graft.sources.Staging.cleanup(spark)
  }

  test("new-operator edge cases: tiny vocab, short payloads, single-class corpus") {
    import graft.operators.{Multimodal, Training}
    // bm25 with fewer distinct terms than nTerms: the query is just the
    // whole vocabulary — no crash, both docs score
    val tiny = docsDf(Seq((1L, "only two", "en"), (2L, "only", "en")))
    val bm = TextOps.bm25TopK(tiny, nTerms = 3, k = 10).collect()
    assert(bm.length === 2)
    // phash on a corpus with no payload ≥ 64 bytes: no eligible docs, no pairs
    assert(Multimodal.phashDedup(docsDf(Seq((1L, "short", "en")))).collect().isEmpty)
    // naive Bayes on a single-class corpus: prior = ln(1) = 0, every doc
    // predicts the one class, correct everywhere
    val mono = docsDf(Seq((1L, "a b", "en"), (2L, "b c", "en")))
    val nb = Training.naiveBayes(mono).collect()
    assert(nb.length === 2)
    assert(nb.forall(r => r.getString(1) == "en" && r.getBoolean(3)))
  }

  test("stored-pHash index probe follows the artifact") {
    import graft.operators.Multimodal
    val base = "q" * 64
    // index two docs; probe a payload sharing doc 1's 64-byte prefix →
    // flagged at hamming 0 against s_id 1; a too-short probe is ineligible
    val index = Multimodal.writePhashIndex(
      docsDf(Seq((1L, base + " indexed", "en"), (2L, "Z9" * 40, "en"))))
    val probed = Multimodal
      .phashStoredProbe(
        spark,
        docsDf(Seq((100L, base + " probing now", "en"), (101L, "short", "en"))),
        index)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(probed.toSeq === Seq((100L, 0L, 1L)))
    // overwrite the artifact with an EMPTY store (valid schema, no rows):
    // the same probe must now match nothing — the probe reads the
    // artifact, it does not rebuild the index
    Multimodal.phashBandStore(docsDf(Seq((1L, "too short", "en"))))
      .write.mode("overwrite").parquet(index)
    val empty = Multimodal
      .phashStoredProbe(spark, docsDf(Seq((100L, base + " probing now", "en"))), index)
      .collect()
    assert(empty.isEmpty)
    graft.sources.Staging.cleanup(spark)
  }

  test("stored-NB serving follows the artifact — a planted model forces the winner") {
    import graft.operators.Training
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // 1) the persisted model reproduces the train-inline path bit-for-bit
    val modelDir = Training.writeNbModel(spark, docs)
    val inline = Training.naiveBayes(docs).orderBy(col("doc_id")).collect()
    val stored = Training.naiveBayesApplyStored(spark, docs, modelDir)
      .orderBy(col("doc_id")).collect()
    assert(stored === inline)
    assert(inline.length === 500)
    // 2) plant a two-class model with an empty vocabulary: class 'aa'
    // has the dominant prior, both classes share the per-token OOV mass,
    // so every doc must predict 'aa' — no retrain on the real langs
    // (en/es/…) could ever produce that class label
    Seq(
      ("aa", Option.empty[String], -1.0, Some(-1.0)),
      ("zz", Option.empty[String], -1.0, Some(-100.0)))
      .toDF("lang", "term", "lnp", "prior_lnp")
      .coalesce(1).write.mode("overwrite").parquet(modelDir)
    val planted = Training.naiveBayesApplyStored(spark, docs, modelDir).collect()
    assert(planted.length === 500)
    assert(planted.forall(_.getString(1) == "aa"), "planted dominant class must win every doc")
    assert(planted.forall(!_.getBoolean(3)), "planted labels are disjoint from real langs")
    graft.sources.Staging.cleanup(spark)
  }

  test("label drift: metrics bounded on real data; identical snapshots read zero drift") {
    import spark.implicits._
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.labelDrift(embs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0, "both slices populated per label")
      assert(r.getDouble(3) >= 0.0, "L2 shift is a distance")
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9, "cosine bounded")
    }
    // planted: the same vectors mirrored into both slices → exactly no drift
    val v = Seq(0.5, -0.25, 1.0) ++ Seq.fill(61)(0.0)
    val twin = Seq((0L, v.map(_.toFloat), 7), (1L, v.map(_.toFloat), 7))
      .toDF("vec_id", "embedding", "label")
    val z = Similarity.labelDrift(twin).collect()
    assert(z.length === 1)
    assert(z(0).getDouble(3) === 0.0)
    assert(z(0).getDouble(4) === 1.0)
  }

  test("sessionGapSweep: wider gap only merges — sessions/singletons non-increasing, totals fixed") {
    val events = model.eventsTable(spark, "/root/testdata/sf0.001")
    val rows = operators.EventOps.sessionGapSweep(events).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(15L, 30L, 60L, 120L))
    val sessions = rows.map(_.getLong(1))
    val singles = rows.map(_.getLong(5))
    assert(sessions.zip(sessions.tail).forall { case (a, b) => b <= a }, sessions.toSeq)
    assert(singles.zip(singles.tail).forall { case (a, b) => b <= a }, singles.toSeq)
    // the event total and user coverage are gap-invariant
    assert(rows.map(_.getLong(3)).distinct.length === 1)
    assert(rows.map(_.getLong(2)).distinct.length === 1)
  }

  test("bowtie census partitions the node set") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.GraphSource.layeredEdges(spark, dir).select(col("src"), col("dst"))
    val nNodes = e.select(col("src")).union(e.select(col("dst"))).distinct().count()
    val rows = SparkEntry.queries("graph_bowtie")(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === nNodes, "classes partition the nodes")
    val classes = rows.map(_.getString(0)).toSet
    assert(classes.contains("scc"), "pivot class present")
    assert(classes.subsetOf(Set("scc", "upstream", "downstream", "disconnected")))
  }

  test("frameDedup: k-of-n frame voting — full prefix match pairs, one-frame overlap doesn't") {
    import spark.implicits._
    val block = "x" * 64
    val blockB = "y" * 64
    val blockC = "z" * 64
    val docs = Seq(
      (1L, block + blockB + blockC + "tail one"), // frames: x, y, z
      (2L, block + blockB + blockC + "different tail"), // same 3 frames
      (3L, block + blockC + blockB), // shares x aligned; y/z at wrong offsets... same set actually
      (4L, block + ("q" * 128))) // shares only frame 0
      .toDF("doc_id", "text")
    val out = operators.Multimodal.frameDedup(docs)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // 1-2 share {x,y,z}; 1-3 and 2-3 share {x,y,z} too (hashes are a SET
    // per doc — order/offset doesn't matter beyond alignment); 4 shares
    // only {x} with each → below minShared
    assert(out === Map((1L, 2L) -> 3L, (1L, 3L) -> 3L, (2L, 3L) -> 3L))
  }

  test("kmeansElbow: inertia non-increasing in k, every vector scored") {
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val n = embs.count()
    val rows = Similarity.kmeansElbow(embs).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L))
    rows.foreach(r => assert(r.getLong(1) === n))
    val sse = rows.map(_.getLong(2))
    assert(sse.zip(sse.tail).forall { case (a, b) => b <= a },
      s"inertia must not rise with k: ${sse.toSeq}")
  }

  test("erClusters: total partition of the customers, min-id canonical") {
    val cust = model.table(spark, "/root/testdata/sf0.001", "customer")
    val n = cust.count()
    val rows = operators.Dedup.erClusters(cust).collect()
    assert(rows.length === n, "every customer exactly once")
    val byEntity = rows.groupBy(_.getLong(1))
    byEntity.foreach { case (e, ms) =>
      // entity label is the component minimum and a member
      assert(ms.map(_.getLong(0)).min === e)
      // sizes agree, exactly one canonical per entity
      ms.foreach(r => assert(r.getLong(2) === ms.length))
      assert(ms.count(_.getBoolean(3)) === 1)
      ms.foreach(r => assert(r.getBoolean(3) === (r.getLong(0) == e)))
    }
  }

  test("holtEval on a constant hourly series: level = rate, zero trend, zero error") {
    import spark.implicits._
    // one event per hour for 4 days: the gap-free constant series
    val events = (0 until 96)
      .map(i => (i.toLong, new java.sql.Timestamp(i * 3600L * 1000L)))
      .toDF("event_id", "ts")
    val r = operators.EventOps.holtEval(events).collect()(0)
    assert(r.getLong(0) === 72L) // n_train = 3 days
    assert(r.getLong(1) === 24L) // n_eval = the last day
    assert(r.getLong(2) === 1000L) // level = 1 event/hour in milli
    assert(r.getLong(3) === 0L) // trend
    assert(r.getLong(4) === 0L) // mae
    assert(r.getLong(5) === 0L) // smape
  }

  test("rakeKeywords scores a planted phrase by hand-computed deg/freq") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the deep learning of deep models"),
      (2L, "deep learning is great"))
      .toDF("doc_id", "text")
    // nDelims = 0: only the fixed stopword list delimits (tiny corpus)
    val out = TextOps.rakeKeywords(docs, k = 10, maxPhraseWords = 4, nDelims = 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // deg(deep)=6 freq=3 → 2e6; deg(learning)=4 freq=2 → 2e6;
    // deg(models)=2 freq=1 → 2e6; deg(great)=1 freq=1 → 1e6
    assert(out.toSeq === Seq(
      ("deep learning", 2L, 2L, 4000000L),
      ("deep models", 2L, 1L, 4000000L),
      ("great", 1L, 1L, 1000000L)))
  }

  test("textrank ranks the co-occurrence hub above every spoke") {
    import spark.implicits._
    // hub co-occurs with every spoke; spokes see only hub + one
    // distance-2 neighbor — global centrality must rank hub first
    val docs = Seq((1L, "hub aa hub bb hub cc hub dd")).toDF("doc_id", "text")
    val out = TextOps.textrank(docs, iters = 5, window = 2, k = 10).collect()
    val pr = out.map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pr.keySet === Set("hub", "aa", "bb", "cc", "dd"))
    Seq("aa", "bb", "cc", "dd").foreach { s =>
      assert(pr("hub") > pr(s), s"hub not above $s: $pr")
    }
    // first row IS the hub (pr desc, term asc ordering)
    assert(out.head.getString(0) === "hub")
  }

  test("embedLinkPredAuc equals the naive pairwise Mann-Whitney on planted vectors") {
    import spark.implicits._
    val emb = Seq(
      (1L, 50L, 0L, 0L, 0L),
      (2L, 40L, 0L, 0L, 0L),
      (3L, 0L, 30L, 0L, 0L),
      (4L, 0L, 20L, 0L, 0L),
      (5L, 5L, 5L, 0L, 0L),
      (6L, -10L, 3L, 0L, 0L)).toDF("id", "u0", "u1", "u2", "u3")
    val e = Seq((1L, 2L), (3L, 4L), (5L, 6L), (2L, 3L))
    val edges = e.toDF("src", "dst")
    val out = Training.embedLinkPredAuc(emb, edges).collect()(0)
    // independent replay: same hash-corrupted negatives, then the
    // DEFINITION of tie-corrected AUC (all pos-neg pair compares)
    // instead of the operator's histogram prefix-sum form
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val vec = Map(
      1L -> (50L, 0L), 2L -> (40L, 0L), 3L -> (0L, 30L),
      4L -> (0L, 20L), 5L -> (5L, 5L), 6L -> (-10L, 3L))
    def dot(a: Long, b: Long) = vec(a)._1 * vec(b)._1 + vec(a)._2 * vec(b)._2
    val neg = e.map { case (s, d) =>
      (s, ids(((s * 1103515245L + d * 54321L) % 1000000007L % 6L).toInt))
    }
    val pos = e.map(p => dot(p._1, p._2))
    val negs = neg.map(p => dot(p._1, p._2))
    val u2 = (for { p <- pos; n <- negs } yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(out.getLong(0) === pos.length.toLong)
    assert(out.getLong(1) === negs.length.toLong)
    assert(out.getLong(2) === 1000000L * u2 / (2L * pos.length * negs.length))
  }

  test("audioMatches finds an embedded clip at its nonzero alignment offset") {
    import spark.implicits._
    // 16-byte blocks: 'z' runs are quiet (36/sample), space-heavy runs
    // are loud peaks; doc 2 embeds doc 1's track after 2 quiet blocks,
    // so every aligned landmark votes at offset -2
    def block(spaces: Int): String = " " * spaces + "z" * (16 - spaces)
    val peaks = Seq(8, 10, 12, 14, 16)
    val track = peaks.map(k => block(0) + block(k)).mkString + block(0)
    val docs = Seq((1L, track), (2L, block(0) + block(0) + track)).toDF("doc_id", "text")
    val out = Multimodal.audioMatches(docs).collect()
    assert(out.nonEmpty, "no match found")
    val m = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.exists { case (a, b, off, votes) => a == 1L && b == 2L && off == -2L && votes >= 3L },
      s"expected (1, 2, -2, >=3), got ${m.toSeq}")
  }

  test("erAgreementLift flags perfectly correlated fields, zero cross patterns") {
    import spark.implicits._
    // one nation, segment and balance band perfectly correlated:
    // both-agree and both-disagree inflate vs chance, mixed patterns
    // are impossible (observed 0)
    val rows = (0 until 40).map { i =>
      val seg = if (i < 20) "A" else "B"
      val bal = if (i < 20) 500.0 else 1500.0
      (i.toLong, s"name$i", 1L, seg, bal)
    }
    val cust = rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Dedup
      .erAgreementLift(cust)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    assert(out.values.map(_._1).sum === 40L * 39L / 2L)
    assert(out((1L, 1L))._2 > 1500000L, s"both-agree lift not elevated: $out")
    assert(out((1L, 0L))._1 === 0L && out((0L, 1L))._1 === 0L)
  }

  test("knnGraph: ranks bounded, mutual is symmetric, neighbors distinct") {
    val embs = model.table(spark, "/root/testdata/sf0.001", "embeddings")
    val rows = Similarity.knnGraph(embs, k = 3).collect()
    assert(rows.nonEmpty)
    val edges = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    edges.foreach { case (v, n, rk, _) =>
      assert(v != n, "no self edge")
      assert(rk >= 1 && rk <= 3, s"rank out of bounds: $rk")
    }
    // per-vector ranks are distinct and neighbors are distinct
    edges.groupBy(_._1).foreach { case (_, es) =>
      assert(es.map(_._3).distinct.length === es.length)
      assert(es.map(_._2).distinct.length === es.length)
    }
    // mutual ⇔ the flipped directed edge is also a top-k edge
    val dir = edges.map { case (v, n, _, _) => (v, n) }.toSet
    edges.foreach { case (v, n, _, m) =>
      assert(m === dir.contains((n, v)), s"mutual flag wrong for ($v,$n)")
    }
  }

  test("audioEnergy: hand-computed frames, partial tail, empty payload") {
    import spark.implicits._
    // 'A' = 65 → dev −63 → 3969/sample; frame len 256, so a 300-char doc
    // has frames of 256 and 44 samples
    val docs = Seq(
      (1L, "A" * 300),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Multimodal.audioEnergy(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) === 2L) // n_frames
    assert(r1.getLong(2) === 300L * 3969L) // total
    assert(r1.getLong(3) === 256L * 3969L) // peak = full frame
    assert(r1.getLong(4) === 1L) // peak_frame
    // the 44-sample tail frame totals 174636 < 262144: partial frames
    // read quiet against the full-frame bound (the silence-trim
    // behavior a VAD wants at clip edges); frame 1 (1016064) is loud
    assert(r1.getLong(5) === 1L)
    Seq(2L, 3L).foreach { id =>
      val r = out(id)
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
      assert(r.isNullAt(3) && r.getLong(4) === 0L && r.getLong(5) === 0L)
    }
  }
}
