package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Snapshot, TextOps}

class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prefix-filter join is complete: equals brute-force J >= 1/2 pairs, cap-free") {
    import spark.implicits._
    // near-dup pair (0,1), a half-overlap pair (2,3) right at J = 1/2,
    // a disjoint doc 4, and a shingle shared by ALL docs ("the end of")
    // that a df-cap would drop but the prefix order merely deprioritizes
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta the end of", "en"),
      (1L, "alpha beta gamma delta epsilon zeta the end of", "en"),
      (2L, "one two three four five six seven the end of", "en"),
      (3L, "one two three four five nine eight the end of", "en"),
      (4L, "totally different words here entirely now the end of", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Dedup
      .prefixFilterPairs(docs)
      .select(col("doc_a"), col("doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // brute force: uncapped shared-shingle pairs, integer J >= 1/2 test
    val brute = Dedup
      .ngramJaccardPairs(docs, maxDf = 1000000L)
      .filter(lit(2L) * col("inter") >= col("uni"))
      .select(col("doc_a"), col("doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === brute)
    assert(got.contains((0L, 1L)))
    assert(!got.contains((0L, 4L)))
  }

  test("chunk windows reconstruct the original text") {
    // stride-prefixes of all chunks but the last, plus the whole last
    // chunk, concatenate back to the source text — no char lost or
    // duplicated beyond the declared overlap
    val docs = model.table(spark, dir, "documents").limit(50)
    val rebuilt = TextOps
      .chunk(docs)
      .withColumn(
        "piece",
        expr(s"substring(chunk, 1, ${TextOps.ChunkStride})"))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(
          "",
          slice(
            sort_array(collect_list(struct(col("chunk_idx"), col("piece")))).getField("piece"),
            1,
            1000000)).as("head"),
        max_by(col("chunk"), col("chunk_idx")).as("last"),
        max(col("chunk_idx")).as("last_idx"))
      .withColumn(
        "rebuilt",
        concat(
          expr(s"substring(head, 1, cast(last_idx * ${TextOps.ChunkStride} as int))"),
          col("last")))
    val bad = rebuilt
      .join(docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text")), Seq("doc_id"))
      .filter(col("rebuilt") =!= col("text"))
    assert(bad.count() === 0)
  }

  test("chunk edge shapes: empty, short, exact-boundary texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),
      (2L, "x" * 149),
      (3L, "y" * 150), // len-1 = 149 < 150 ⇒ still one chunk
      (4L, "z" * 151), // crosses the stride ⇒ two chunks
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps
      .chunk(docs)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("chunk_chars")).as("chars"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) === ((1L, 0L)))
    assert(got(2L) === ((1L, 149L)))
    assert(got(3L) === ((1L, 150L)))
    // chunk0 = chars 1..151 (size cap 200 ⇒ all 151), chunk1 = char 151 (1-char tail)
    assert(got(4L) === ((2L, 152L)))
    assert(got(5L) === ((1L, 0L)))
  }

  test("shuffleShards emits a dense permutation per shard, stable across runs") {
    val docs = model.table(spark, dir, "documents")
    val a = TextOps.shuffleShards(docs)
    // dense: per shard, positions are exactly 1..n
    val holes = a
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(holes.count() === 0)
    // a doc's (shard, pos) is a pure function of its id: recompute equal
    val b = TextOps.shuffleShards(docs)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // different seed ⇒ different permutation (not a constant mapping)
    val c = TextOps.shuffleShards(docs, seed = 42L)
    assert(a.exceptAll(c).count() > 0)
  }

  test("bpeTrain: greedy merges on a hand-computed corpus, early exhaustion") {
    import graft.operators.Tokenization
    import spark.implicits._
    // corpus: "aaab" ×2, "ab" ×1
    //   round 1: pairs (a,a)=4 [two positions per aaab], (a,b)=3 → merge (a,a)
    //            greedy: a|a|a|b → aa|a|b (NOT aa|aa?b — non-overlapping)
    //   round 2: (aa,a)=2, (a,b)=3 → merge (a,b) → aa|ab, ab
    //   round 3: (aa,ab)=2 → merge
    //   round 4: no pairs left → train stops early
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = Tokenization.bpeTrain(spark, docs, nMerges = 4)
      .orderBy(col("merge_round"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got === Array(
      (1L, "a", "a", 4L),
      (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L)))
  }

  test("bpeTrain merges whole symbols only — no cross-boundary prefix binding") {
    import graft.operators.Tokenization
    import spark.implicits._
    // corpus: aa×5, ba×4, baa×1
    //   round 1: (a,a) = 5 + 1 = 6  →  baa becomes [b, aa]
    //   round 2: (b,a) = 4 (ba only!) — a naive single-separator encoding
    //            would let 'b␁a' bind the 'b␁a…' PREFIX of [b, aa] and
    //            corrupt it to one symbol [baa]
    //   round 3: (b,aa) = 1 — only exists if round 2 left [b, aa] intact
    val docs = Seq("aa aa aa aa aa ba ba ba ba baa").toDF("text")
    val got = Tokenization.bpeTrain(spark, docs, nMerges = 3)
      .orderBy(col("merge_round"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got === Array(
      (1L, "a", "a", 6L),
      (2L, "b", "a", 4L),
      (3L, "b", "aa", 1L)))
  }

  test("BloomJoin.semiJoin equals the plain semi join (false positives removed)") {
    import graft.operators.BloomJoin
    val fact = model.table(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long").as("k"), col("l_quantity"))
    val dim = model.table(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey").cast("long").as("dk"))
    // a tiny sketch (64 expected items for ~hundreds of real keys) forces
    // a HIGH false-positive rate, so this only passes if the exact join
    // really removes them
    val got = BloomJoin.semiJoin(fact, dim, "k", "dk", expectedItems = 64L)
    val want = fact.join(dim, fact("k") === dim("dk"), "left_semi")
    assert(got.count() === want.count() && got.exceptAll(want).isEmpty)
    // and the no-false-negative direction: nothing the plain join keeps
    // is lost to the prefilter
    assert(want.exceptAll(got).isEmpty)
  }

  test("upsert: updates win, inserts appear, untouched rows survive") {
    import spark.implicits._
    val base = Seq(
      (1L, "one", 1L),
      (2L, "two", 1L),
      (3L, "three", 1L)).toDF("k", "v", "version")
    val updates = Seq(
      (2L, "TWO", 2L), // revision
      (9L, "nine", 2L)) // insert
      .toDF("k", "v", "version")
    val got = Snapshot
      .upsert(base, updates, "k", "version")
      .orderBy(col("k"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got === Array((1L, "one", 1L), (2L, "TWO", 2L), (3L, "three", 1L), (9L, "nine", 2L)))
  }

  test("scd2 turns the version log into contiguous validity intervals") {
    import spark.implicits._
    val log = Seq(
      (1L, "v1", 1L), (1L, "v2", 2L), (1L, "v3", 5L), // three states, gap in versions
      (2L, "only", 3L)) // single-version key is current from birth
      .toDF("k", "v", "version")
    val got = Snapshot
      .scd2(log, "k", "version")
      .orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
          r.getString(4)))
    assert(got === Array(
      (1L, 1L, 2L, false, "v1"),
      (1L, 2L, 5L, false, "v2"),
      (1L, 5L, -1L, true, "v3"),
      (2L, 3L, -1L, true, "only")))
    // the SCD2 invariant: exactly one current row per key, and a
    // point-in-time predicate at v=2 selects exactly one state per key
    val cur = Snapshot.scd2(log, "k", "version").filter(col("is_current"))
    assert(cur.groupBy(col("k")).count().collect().forall(_.getLong(1) === 1L))
    val asOf2 = Snapshot
      .scd2(log, "k", "version")
      .filter(col("valid_from") <= 2 && (col("valid_to").isNull || col("valid_to") > 2))
      .collect()
      .map(r => (r.getLong(0), r.getString(4)))
    assert(asOf2.toSet === Set((1L, "v2")))
  }

  test("upsert plans as a partial-aggregating max_by, not a window sort") {
    val docs = model.table(spark, dir, "documents")
    val base = docs.select(col("doc_id"), col("text"), lit(1L).as("version"))
    val upd = docs.limit(10).select(col("doc_id"), col("text"), lit(2L).as("version"))
    val df = Snapshot.upsert(base, upd, "doc_id", "version")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by"), s"no map-side partial in:\n$plan")
    assert(!plan.contains("Window"), s"window formulation leaked in:\n$plan")
  }

  test("unigram LM: uniform corpus scores uniformly; rarer tokens score lower") {
    import spark.implicits._
    // "a a" ×3 docs and one "a b": b is the rare token, so doc 4's mean
    // log-prob must be strictly below the all-'a' docs'; all-'a' docs
    // tie exactly (same tokens, same counts)
    val docs = Seq(
      (1L, "a a"),
      (2L, "a a"),
      (3L, "a a"),
      (4L, "a b"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextOps
      .unigramScore(docs)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(got.map(_._2).toSeq === Seq(2L, 2L, 2L, 2L, 0L))
    assert(got(0)._3 === got(1)._3 && got(1)._3 === got(2)._3)
    assert(got(3)._3 < got(0)._3, "doc with the rare token must score lower")
    assert(got(4)._3.isNaN, "empty doc has no score")
  }

  test("bigram LM: word order matters; short docs have no bigrams") {
    import spark.implicits._
    // corpus: "a b" ×2, "b a" ×1 → c(a,b)=2, c(b,a)=1, ctx counts a:2 b:1,
    // |V|=2. Same unigram profile, different order: the reversed doc must
    // score strictly lower (ln(2/3) < ln(3/4)), which is exactly what the
    // unigram model cannot see.
    val docs = Seq(
      (1L, "a b"),
      (2L, "a b"),
      (3L, "b a"),
      (4L, "a"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextOps
      .bigramScore(docs)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(got.map(_._2).toSeq === Seq(1L, 1L, 1L, 0L, 0L))
    assert(got(0)._3 === got(1)._3)
    assert(math.abs(got(0)._3 - math.log(3.0 / 4.0)) < 1e-5)
    assert(got(2)._3 < got(0)._3, "reversed word order must score lower")
    assert(got(3)._3.isNaN && got(4)._3.isNaN, "sub-bigram docs have no score")
  }

  test("source KL drift: corpus-like source scores near zero, skewed source higher") {
    import spark.implicits._
    // srcEven mirrors the corpus mix; srcSkew is all-'b' — its unigram
    // distribution sits far from the pooled one, so KL(skew) > KL(even).
    val docs = Seq(
      (1L, "a b c d", "en", "srcEven"),
      (2L, "a b c d", "en", "srcEven"),
      (3L, "b b b b", "en", "srcSkew"),
      (4L, "a b c d", "en", "srcEven")).toDF("doc_id", "text", "lang", "source")
    val got = TextOps
      .sourceKlDrift(docs)
      .orderBy(col("source"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq(("srcEven", 12L, 4L), ("srcSkew", 4L, 1L)))
    assert(got(1)._4 > got(0)._4, "skewed source must drift further than the corpus-like one")
    assert(got(0)._4 > -1e-6, "KL over the support of p_s with smoothed q stays ~non-negative here")
  }

  test("source dup matrix: rolls up exactly the candidate clique; identical cross-source docs hit 1.0") {
    import spark.implicits._
    val docs = model.table(spark, dir, "documents")
    val matrix = Dedup.sourceDupMatrix(docs).collect()
    val nPairs = Dedup.minhashCandidates(docs).count()
    assert(matrix.map(_.getLong(2)).sum === nPairs, "matrix must partition the pair clique")
    matrix.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "source pair must be canonicalized")
      val j = r.getDouble(3)
      assert(j >= 0.0 && j <= 1.0 + 1e-9)
    }
    val twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d2 = Seq(
      (1L, twin, "en", "srcA"),
      (2L, twin, "en", "srcB")).toDF("doc_id", "text", "lang", "source")
    val m2 = Dedup.sourceDupMatrix(d2).collect()
    assert(m2.length === 1)
    assert((m2(0).getString(0), m2(0).getString(1), m2(0).getLong(2)) === (("srcA", "srcB", 1L)))
    assert(m2(0).getDouble(3) === 1.0, "identical docs match on every signature position")
  }

  test("multimodal verdict: six flags agree with their family detectors; keep is the conjunction") {
    import graft.operators.Multimodal
    val docs = model.table(spark, dir, "documents")
    val embs = model.table(spark, dir, "embeddings")
    val out = Dedup.verdictMultimodal(docs, embs).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
      .toMap
    assert(out.size === docs.count(), "one row per document")
    // each modality column is exactly its family detector's flag set
    val phExpected = Multimodal.phashDedup(docs)
      .select(col("b_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(out.filter(_._2._5).keySet === phExpected, "phash_dup mismatch")
    val semExpected = Dedup.semanticDedup(embs, minCosine = 0.4)
      .filter(col("is_dup")).collect().map(_.getLong(0)).toSet
    assert(out.filter(_._2._6).keySet === semExpected, "semantic_dup mismatch")
    // the text flags match the text-only verdict, and keep is the NOR
    val textV = Dedup.verdict(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    out.foreach { case (id, (ex, mh, sh, ng, ph, sem, keep)) =>
      assert((ex, mh, sh, ng) === textV(id), s"text flags diverged for doc $id")
      assert(keep === !(ex || mh || sh || ng || ph || sem), s"keep wrong for doc $id")
    }
    // the extra modalities must add information on the harness corpus:
    // some doc is flagged ONLY by phash or semantic
    assert(out.values.exists { case (ex, mh, sh, ng, ph, sem, _) =>
      !(ex || mh || sh || ng) && (ph || sem)
    }, "no document flagged by media/embedding detectors alone — ensemble adds nothing")
  }

  test("incremental dedup: verbatim re-ingest flags exact + near; fresh content flags neither") {
    import spark.implicits._
    val stored = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fresh = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, stored, "en", "s1"),
      (2L, "lambda mu nu xi omicron pi rho sigma tau upsilon", "en", "s1"),
      // incoming batch: 400 is a verbatim copy of store doc 1, 401 is new
      (400L, stored, "en", "s2"),
      (401L, fresh, "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val got = Dedup
      .incremental(docs, firstNewId = 400L)
      .orderBy(col("doc_id"))
      .collect()
      .map(r =>
        (r.getLong(0), r.getBoolean(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.length === 2, "only incoming docs are scored")
    assert(got(0) === ((400L, true, 1L, 1L)), "verbatim copy: exact dup + near match of doc 1")
    assert(got(1)._2 === false && got(1)._3 === 0L, "fresh doc matches nothing in the store")
  }

  test("split leakage: eval doc sharing a train shingle is flagged; clean doc is zero") {
    import spark.implicits._
    val docs = model.table(spark, dir, "documents")
    val out = TextOps.splitLeakage(docs).collect()
    assert(out.nonEmpty)
    // only eval rows, ratio in [0,1], n_leaked <= n_grams
    out.foreach { r =>
      assert(r.getString(1) === "val" || r.getString(1) === "test")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(2))
      val ratio = r.getDouble(4)
      assert(ratio >= 0.0 && ratio <= 1.0 + 1e-6)
    }
    // a synthetic corpus where one eval doc copies a train doc verbatim
    // must flag that doc fully leaked: bucket(fp40) decides the split,
    // so craft texts that land on each side, sharing their prefix
    val train = "alpha beta gamma delta epsilon zeta"
    // find a suffix word that flips the copy into val/test
    val cands = (1 to 200).map(i => s"$train extra$i")
    val probe = TextOps
      .splitAssign(cands.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val trainIdx = probe.collectFirst { case (i, "train") => i }.get
    val evalIdx = probe.collectFirst { case (i, s) if s != "train" => i }.get
    val d2 = Seq(
      (1L, cands(trainIdx.toInt), "en", "s1"),
      (2L, cands(evalIdx.toInt), "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val leak = TextOps.splitLeakage(d2).collect()
    assert(leak.length === 1 && leak(0).getLong(0) === 2L)
    // the two docs share the 4 shingles of the common 6-token prefix
    assert(leak(0).getLong(3) === 4L, s"expected 4 leaked grams, got ${leak(0).getLong(3)}")
  }

  test("quality filter keeps each source's top half, half rounded up") {
    val docs = model.table(spark, dir, "documents")
    val out = TextOps.qualityFilter(docs).collect()
    val perSource = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy(_.getString(0)).map { case (s, rows) => s -> rows.length.toLong }
    assert(kept === perSource.map { case (s, n) => s -> ((n + 1) / 2) })
    // within a source, every kept quality >= every dropped quality
    val keptIds = out.map(_.getLong(1)).toSet
    val qBySource = TextOps.quality(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("doc_id"), col("quality")).collect()
      .groupBy(_.getString(0))
    qBySource.foreach { case (_, rows) =>
      val (k, d) = rows.partition(r => keptIds.contains(r.getLong(1)))
      if (k.nonEmpty && d.nonEmpty)
        assert(k.map(_.getDouble(2)).min >= d.map(_.getDouble(2)).max - 1e-9)
    }
  }

  test("weighted sample is deterministic, exactly k, and favors heavy docs in aggregate") {
    val docs = model.table(spark, dir, "documents")
    val s1 = TextOps.weightedSample(docs, k = 100).orderBy(col("doc_id")).collect()
    val s2 = TextOps.weightedSample(docs, k = 100).orderBy(col("doc_id")).collect()
    assert(s1.toSeq === s2.toSeq, "same seed must select the same set")
    assert(s1.length === 100)
    // size-weighted sampling must pull the sample's mean weight above
    // the corpus mean (token counts vary ~100x across the fixture)
    val corpusMean = docs
      .select(avg(greatest(size(split(col("text"), "\\s+")), lit(1))).as("m"))
      .head()
      .getDouble(0)
    val sampleMean = s1.map(_.getLong(1)).sum.toDouble / s1.length
    assert(
      sampleMean > corpusMean,
      s"sample mean weight $sampleMean not above corpus mean $corpusMean")
    val s3 = TextOps.weightedSample(docs, k = 100, seed = 8L).orderBy(col("doc_id")).collect()
    assert(s3.map(_.getLong(0)).toSeq !== s1.map(_.getLong(0)).toSeq, "seed must matter")
  }

  test("stored LM scores unseen terms with the model's own OOV mass") {
    import spark.implicits._
    val train = Seq(
      (1L, "a a b", "en", "s1"),
      (2L, "a b c", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val model = TextOps.writeLmModel(spark, train)
    // train: N=6 tokens, V=3 → p(a)=(3+1)/9, p(b)=(2+1)/9, p(unseen)=1/9
    val apply = Seq((9L, "a zzz", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val out = TextOps.lmApplyStored(spark, apply, model).collect()(0)
    assert(out.getLong(1) === 2L)
    val expect = (math.rint(math.log(4.0 / 9.0) * 1e9) / 1e9 +
      math.rint(math.log(1.0 / 9.0) * 1e9) / 1e9) / 2.0
    assert(math.abs(out.getDouble(2) - expect) < 1e-6, s"got ${out.getDouble(2)} want $expect")
    // applying to the training corpus reproduces the self-trained scores
    val self = TextOps.unigramScore(train).collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val applied = TextOps.lmApplyStored(spark, train, model).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(applied === self)
    graft.sources.Staging.cleanup(spark)
  }

  test("grouped weighted sample draws exactly k per source, partition-invariant") {
    val docs = model.table(spark, dir, "documents")
    val out = TextOps.weightedSampleGrouped(docs, kPerGroup = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perSource = out.groupBy(_._1)
    perSource.foreach { case (src, rows) =>
      assert(rows.length === 10, s"$src drew ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq === (1L to 10L), s"$src ranks not 1..10")
    }
    // the bounded-heap merge must be arrival-order-invariant
    val again = TextOps.weightedSampleGrouped(docs.repartition(7), kPerGroup = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet === out.toSet)
  }

  test("survivors: one per cluster, quality-argmax with min-id tie-break") {
    val docs = model.table(spark, dir, "documents")
    val out = Dedup.survivors(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cl, rows) =>
      val survs = rows.filter(_._4)
      assert(survs.length === 1, s"cluster $cl has ${survs.length} survivors")
      val s = survs.head
      assert(rows.forall(_._3 == s._1), s"cluster $cl disagrees on survivor_id")
      val maxQ = rows.map(_._5).max
      assert(s._5 === maxQ, s"cluster $cl survivor not max-quality")
      assert(
        s._1 === rows.filter(_._5 == maxQ).map(_._1).min,
        s"cluster $cl tie not broken toward the lower id")
    }
    // cluster assignment is exactly Dedup.clusters' closure
    val cl = Dedup.clusters(docs, Dedup.minhashCandidatePairs(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, c, _, _, _) => assert(cl(id) === c) }
  }

  test("paragraph dedup: planted shared paragraph flags only the later doc") {
    import spark.implicits._
    val p1 = "a" * Dedup.ParaChars
    val p2 = "b" * Dedup.ParaChars
    val p3 = "c" * Dedup.ParaChars
    val docs = Seq(
      (1L, p1 + p2), // both paragraphs first occurrences
      (2L, p1 + p3), // p1 is a dup of doc 1's copy; p3 fresh
      (3L, p3)       // dup of doc 2's p3
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 0L, 2L * Dedup.ParaChars)))
    assert(got(2L) === ((2L, 1L, Dedup.ParaChars.toLong)))
    assert(got(3L) === ((1L, 1L, 0L)))
  }

  test("minhash compact: base ∪ delta audit equals a from-scratch re-index of the full corpus") {
    val docs = model.table(spark, dir, "documents")
    val audit = Dedup.minhashCompact(spark, docs, firstNewId = 400L).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // from-scratch: sign the WHOLE corpus once, group the band rows
    val scratch = Dedup.minhashBandRows(docs)
      .groupBy(col("band_idx"), col("band_val"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("doc_id") >= 400L, 1L).otherwise(0L)).as("nn"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(audit.keySet === scratch.keySet)
    audit.foreach { case (k, (n, nn, kept)) =>
      assert(scratch(k) === ((n, nn)), s"bucket $k occupancy drifted")
      assert(kept === (n <= Dedup.CompactBucketCap))
    }
    graft.sources.Staging.cleanup(spark)
  }

  test("paragraph dedup conservation: kept chars + dup'd paragraph chars cover the corpus") {
    val docs = model.table(spark, dir, "documents")
    val out = Dedup.paragraphDedup(docs)
    // every doc appears; total paragraphs reconstruct the per-doc count
    assert(out.count() === docs.count())
    val chars = out.agg(sum(col("chars_kept"))).collect()(0).getLong(0)
    val total = docs
      .agg(sum(length(coalesce(col("text"), lit(""))))).collect()(0).getLong(0)
    assert(chars <= total)
    // a corpus with duplicated docs must drop a strictly positive share
    val dups = out.agg(sum(col("n_dup_paras"))).collect()(0).getLong(0)
    assert(dups > 0)
  }

  test("minhashProbeOne: exact-copy probe tops the index hits; unrelated docs stay out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "completely different words here entirely"))
      .toDF("doc_id", "text")
    val idx = operators.Dedup.writeMinhashIndex(spark, docs)
    val out = operators.Dedup
      .minhashProbeOne(spark, idx, "alpha beta gamma delta epsilon zeta")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    // both exact copies collide with the full K=16 signature match
    assert(out.take(2) === Seq((1L, 16L), (2L, 16L)))
    // the unrelated doc can only appear via a band collision of distinct
    // signatures — with these fixtures it must not appear at all
    assert(!out.map(_._1).contains(3L))
  }

  test("simhashProbeOne: exact copy at hamming 0 first; cached index never rebuilds") {
    import spark.implicits._
    import graft.operators.ModelCache
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, text),
      (2L, "unrelated totally different content everywhere all new words"))
      .toDF("doc_id", "text")
    val key = s"spec-sh|${java.util.UUID.randomUUID()}"
    val before = ModelCache.builtCount.get()
    val idx = operators.Dedup.simhashIndexCached(spark, docs, key)
    assert(ModelCache.builtCount.get() === before + 1)
    // second resolve: memo hit, no rebuild
    assert(operators.Dedup.simhashIndexCached(spark, docs, key) === idx)
    assert(ModelCache.builtCount.get() === before + 1)
    val out = operators.Dedup.simhashProbeOne(spark, idx, text).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.head === ((1L, 0L)), s"got ${out.toSeq}")
  }
  test("softWeights: a tripled doc contributes exactly one doc of effective mass") {
    import spark.implicits._
    // source s1: "a b c" three times (cluster of 3, 3 tokens each) plus a
    // unique 2-token doc; source s2: one unique 4-token doc
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s1"), (3L, "a b c", "s1"),
      (4L, "x y", "s1"),
      (5L, "p q r s", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.softWeights(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // s1: 4 docs, 3 dup copies, 11 raw tokens; effective milli-tokens =
    // 3*(3*1000/3) + 2000 = 5000 -> 5000/11000 of raw = 454545 ppm
    assert(out("s1") === ((4L, 3L, 11L, 5000L, 454545L)))
    // s2: everything unique -> effective mass = raw mass (1e6 ppm)
    assert(out("s2") === ((1L, 0L, 4L, 4000L, 1000000L)))
  }

}
