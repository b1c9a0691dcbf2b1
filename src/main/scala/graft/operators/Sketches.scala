package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Deterministic cardinality sketches.
  *
  * Engine built-ins (`approx_count_distinct` = HyperLogLog++) can never
  * hash-match a cross-engine oracle — every engine uses its own hash and
  * its own bias tables. A K-minimum-values (KMV) sketch over the shared
  * [[Parity]] 40-bit hash is different: the k smallest distinct hash
  * values are a deterministic function of the input, so the estimate
  * `(k−1) · 2⁴⁰ / h_k` is bit-identical on any engine (integer
  * arithmetic end to end). Same estimator family as HLL (order
  * statistics of hashed values), with ~1/√k relative error.
  *
  * Scale shape: one distinct (shuffle on the value), then a top-k —
  * Spark plans `orderBy(h).limit(k)` as TakeOrdered (per-partition
  * heads, merged on the driver), never a global sort; the sketch row
  * itself is O(k).
  */
object Sketches {

  /** KMV width: 256 minima ≈ 6% standard error. */
  val KmvK = 256

  /** KMV distinct-count sketch over the corpus' word-trigram shingles,
    * next to the exact count it estimates: one row
    * (n_exact, n_mins, kth_hash, kmv_estimate). When the universe is
    * smaller than k the sketch holds every hash and the estimate is the
    * exact hash count.
    */
  def kmvDistinctShingles(docs: DataFrame, k: Int = KmvK): DataFrame = {
    // the ACTUAL range of tokenH40 (fpA * TokP2 + fpB < TokP * TokP2),
    // not 2^40 — using the nominal bit width would bias every estimate
    // ~+4.6% high (hashes never reach the top of the 40-bit space)
    val space = Parity.TokP * Parity.TokP2
    val distinctShingles = docs
      .select(
        explode(graft.functions.ShingleStrings(split(col("text"), "\\s+"), distinct = true))
          .as("g"))
      .distinct()
    val hashes = distinctShingles.select(Parity.tokenH40(col("g")).as("h")).distinct()
    val mins = hashes.orderBy(col("h")).limit(k)
    val a = mins.agg(count(lit(1)).as("n_mins"), max(col("h")).as("kth_hash"))
    val e = distinctShingles.agg(count(lit(1)).as("n_exact"))
    e.crossJoin(a)
      .select(
        col("n_exact"),
        col("n_mins"),
        col("kth_hash"),
        when(col("n_mins") < k, col("n_mins"))
          .otherwise(expr(s"(${k - 1} * ${space}L) div kth_hash"))
          .as("kmv_estimate"))
  }

  /** GROUPED KMV: distinct-token estimate per `source` — the per-split
    * vocabulary report a curation dashboard shows, one sketch row per
    * group next to the exact count it estimates.
    *
    * Scale shape: the (source, hash) pre-distinct collapses duplicate
    * tokens with a map-side partial before its exchange; the per-group
    * k minima then come from a typed bounded-heap
    * [[graft.functions.KMinAggregator]] whose buffer also carries the
    * exact count — ONE aggregate with a map-side partial, so at most k
    * hashes (plus one counter) per source cross the final exchange. A
    * hot source never concentrates its whole distinct-hash set on one
    * task, and there is no per-group sort anywhere. The oracle keeps
    * the equivalent rank formulation (the k smallest of a set are the
    * same set however you find them), so the row is bit-identical.
    */
  def kmvPerSource(docs: DataFrame, k: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val space = Parity.TokP * Parity.TokP2
    val pairs = docs
      .select(col("source"), explode(Parity.tokens(col("text"))).as("t"))
      .select(col("source"), Parity.tokenH40(col("t")).as("h"))
      .distinct()
    val agg = new graft.functions.KMinAggregator(k)
    pairs
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .map { case (source, (nExact, nMins, kth)) => (source, nExact, nMins, kth) }
      .toDF("source", "n_exact", "n_mins", "kth_hash")
      .select(
        col("source"),
        col("n_exact"),
        col("n_mins"),
        col("kth_hash"),
        when(col("n_mins") < k, col("n_mins"))
          .otherwise(expr(s"(${k - 1} * ${space}L) div kth_hash"))
          .as("kmv_estimate"))
  }

  // ---- Count-min sketch ----------------------------------------------------

  /** CMS geometry: depth 4 × width 512 = 2048 counter cells. Width sets
    * the overestimate bound (ε ≈ e/w of the total mass lands on each
    * cell in expectation); depth sets the failure probability of that
    * bound (δ = e^−d). 4×512 on the harness vocabulary keeps top-20
    * estimates within a few percent while the sketch is ~16 KB.
    */
  val CmsDepth = 4
  val CmsWidth = 512L

  /** Row-j CMS bucket of a 40-bit token hash: an affine permutation mod
    * [[Parity.BigP]] folded to the width. `h` is reduced mod BigP FIRST
    * so the product stays < 2^62 — the same overflow discipline as
    * [[graft.operators.TextOps]]' shard hash; DuckDB BIGINT arithmetic
    * is then bit-identical.
    */
  private def cmsBucket(j: Int, h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(Parity.permA(j)) * (h % lit(Parity.BigP)) + lit(Parity.permB(j))) % lit(Parity.BigP) % lit(
      CmsWidth)

  private def cmsBucketSql(j: Int, h: String): String =
    s"((${Parity.permA(j)} * ($h % ${Parity.BigP}) + ${Parity.permB(j)}) % ${Parity.BigP}) % $CmsWidth"

  /** Count-min sketch frequency estimation (Cormode & Muthukrishnan
    * 2005, J. Algorithms 55): every token increments one counter per
    * hash row; a point estimate is the MIN over its d counters —
    * overestimates only (collisions add, never subtract). Emitted next
    * to the exact frequencies it approximates: the exact top-`topN`
    * tokens with their CMS estimates and the overestimate delta, so the
    * sketch's error is a measured column, not a claim.
    *
    * Scale shape at 100 TB: the sketch build is ONE hash aggregate into
    * d·w = 2048 cells with a map-side partial (each task folds its
    * tokens into a 16 KB array before the exchange — this is why CMS
    * exists: the full histogram needs memory ∝ vocabulary, the sketch
    * O(d·w)). Here the build goes through the word histogram the probe
    * side needs anyway, which is count-identical (sum of per-token
    * freqs = token stream length). The probe is a broadcast-sized join
    * of topN·d rows against the 2048-cell table.
    */
  def cmsHeavyHitters(docs: DataFrame, topN: Int = 20): DataFrame = {
    val hist = docs
      .select(explode(Parity.tokens(col("text"))).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("freq"))
    def withBuckets(df: DataFrame): DataFrame =
      df.withColumn("h", Parity.tokenH40(col("t")))
        .select(
          df.columns.map(col) :+
            posexplode(array((0 until CmsDepth).map(j => cmsBucket(j, col("h"))): _*))
              .as(Seq("j", "bucket")): _*)
    val cells = withBuckets(hist)
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("freq")).as("cell"))
    val top = hist.orderBy(desc("freq"), col("t")).limit(topN)
    withBuckets(top)
      .join(cells, Seq("j", "bucket"))
      .groupBy(col("t"), col("freq"))
      .agg(min(col("cell")).as("cms_estimate"))
      .select(
        col("t").as("token"),
        col("freq").as("exact_freq"),
        col("cms_estimate"),
        (col("cms_estimate") - col("freq")).as("overcount"))
  }

  /** [[cmsHeavyHitters]] mirrored cell-for-cell. */
  def cmsHeavyHittersSql(topN: Int = 20): String = {
    val h = Parity.tokenH40Sql("t")
    val bucketRows = (0 until CmsDepth)
      .map(j => s"SELECT t, freq, $j AS j, ${cmsBucketSql(j, "h")} AS bucket FROM hh")
      .mkString("\nUNION ALL\n")
    s"""WITH hist AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(${Parity.tokensSql("text")}) AS t FROM documents)
       |  GROUP BY t),
       |hh AS (SELECT t, freq, $h AS h FROM hist),
       |buck AS (
       |$bucketRows),
       |cells AS (
       |  SELECT j, bucket, CAST(sum(freq) AS BIGINT) AS cell FROM buck GROUP BY j, bucket),
       |top AS (SELECT t, freq FROM hist ORDER BY freq DESC, t LIMIT $topN),
       |probe AS (
       |  SELECT b.t, b.freq, c.cell
       |  FROM (SELECT t, freq, j, bucket FROM buck WHERE t IN (SELECT t FROM top)) b
       |  JOIN cells c ON c.j = b.j AND c.bucket = b.bucket)
       |SELECT t AS token, freq AS exact_freq,
       |       min(cell) AS cms_estimate, min(cell) - freq AS overcount
       |FROM probe GROUP BY t, freq
       |ORDER BY token""".stripMargin
  }

  /** [[kmvPerSource]], mirrored on the same hash and estimator. */
  def kmvPerSourceSql(k: Int = 64): String = {
    val space = Parity.TokP * Parity.TokP2
    val h = Parity.tokenH40Sql("t")
    s"""WITH tok AS (
       |  SELECT source, unnest(${Parity.tokensSql("text")}) AS t FROM documents),
       |pair AS (SELECT DISTINCT source, $h AS h FROM tok),
       |ranked AS (
       |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM pair),
       |mins AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_mins, max(h) AS kth_hash
       |  FROM ranked WHERE rn <= $k GROUP BY source),
       |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM pair GROUP BY source)
       |SELECT source, n_exact, n_mins, kth_hash,
       |       CASE WHEN n_mins < $k THEN n_mins
       |            ELSE (${k - 1} * $space) // kth_hash END AS kmv_estimate
       |FROM mins JOIN ex USING (source)""".stripMargin
  }
}
