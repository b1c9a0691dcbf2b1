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
}
