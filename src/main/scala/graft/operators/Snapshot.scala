package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance: latest-wins upsert (MERGE) of an update batch
  * into a keyed base table — the incremental-refresh step of a corpus
  * that is re-crawled or re-scored between training runs.
  *
  * Physical shape at 100 TB: ONE hash aggregate on the key with a
  * map-side partial (`max_by` folds each partition's rows to one
  * candidate per key before the exchange), so the shuffle carries at
  * most one row per distinct key per partition. The window-function
  * formulation (`row_number() OVER (PARTITION BY key ORDER BY version
  * DESC)` then `rn = 1`) computes the same answer but ships EVERY
  * version of every key raw to its reducer and sorts it there — the
  * same partial-vs-window trade pinned for curate in PlanAuditSpec.
  *
  * No reference counterpart (north-star extension per BASELINE.json).
  */
object Snapshot {

  /** Latest-wins merge of `updates` into `base`: one row per key, the
    * row with the highest `version` wins. Both inputs must share a
    * schema containing `key` and `version`. Version ties are resolved
    * arbitrarily — callers own version uniqueness per key (a real
    * pipeline uses an ingest timestamp or monotonic batch id).
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String, version: String): DataFrame = {
    val all = base.unionByName(updates)
    val payload = all.columns.filterNot(_ == key)
    all
      .groupBy(col(key))
      .agg(max_by(struct(payload.map(col): _*), col(version)).as("__winner"))
      .select(col(key) +: payload.map(c => col(s"__winner.$c").as(c)): _*)
  }

  /** SCD type-2 history (Kimball's slowly-changing dimension): the full
    * version log turned into VALIDITY INTERVALS — every (key, version)
    * state row kept, with `valid_from` = its version, `valid_to` = the
    * key's next version (null while current) and an `is_current` flag.
    * [[upsert]] answers "what is true now"; this answers "what was true
    * at version v" with a plain `valid_from <= v AND (valid_to IS NULL
    * OR v < valid_to)` predicate — the time-travel surface of a corpus
    * that is re-crawled between training runs.
    *
    * Scale shape: one exchange on the key and a per-key sort for the
    * `lead` — keys are independent, so the window never concentrates
    * (per-key version-chain length is the partition bound, typically a
    * handful of re-crawls). Unlike the upsert there is no partial-agg
    * alternative: every version row IS output, so shipping each exactly
    * once is already minimal.
    *
    * Precondition: `version` is UNIQUE per key (the same contract a
    * version log must satisfy for "the state at version v" to be
    * well-defined at all). Duplicate (key, version) rows would make the
    * lead-based interval chaining nondeterministic — two rows sharing a
    * valid_from with arbitrary valid_to assignment; dedupe the log (e.g.
    * [[upsert]] against itself) before deriving history.
    */
  def scd2(log: DataFrame, key: String, version: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(version))
    val payload = log.columns.filterNot(c => c == key || c == version)
    log.select(
      (col(key) +:
        col(version).as("valid_from") +:
        lead(col(version), 1).over(w).as("valid_to") +:
        lead(col(version), 1).over(w).isNull.as("is_current") +:
        payload.map(col)): _*)
  }

  /** Time travel: the table state AS OF version `v`, read from the
    * [[scd2]] interval table with the one predicate the intervals
    * exist for — `valid_from <= v < valid_to` (open-ended rows are
    * current). The oracle REPLAYS latest-wins over the raw log
    * restricted to `version <= v`, so parity proves the interval
    * lookup and the replay are the same function — the identity that
    * lets a 100 TB warehouse answer historical reads from one stored
    * history table instead of re-merging logs per query.
    */
  def asOf(history: DataFrame, v: Long): DataFrame =
    history.filter(
      col("valid_from") <= v && (col("valid_to").isNull || col("valid_to") > v))

  /** Incremental maintenance of an AGGREGATED JOIN VIEW — the delta
    * identity every materialized revenue rollup at 100 TB refreshes
    * by:
    *
    *   Δ(A ⋈ B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB
    *
    * The stored artifact is the aggregate partials of A_old⋈B_old
    * (per-customer item counts and revenue cents); a refresh tick
    * joins ONLY the delta terms — each bounded by |Δ|·fanout, never a
    * rescan of the base join — and sum-merges into the stored rows.
    * The oracle computes the same rollup over the FULL join, so parity
    * proves the three-term identity, not just the aggregate. Revenue
    * is exact integer cents (`round(extprice·(1−disc)·100)`), so the
    * merged and recomputed views are bit-identical.
    *
    * Output: `(o_custkey, n_items, rev_cents)`.
    */
  def joinAggIncremental(
      spark: org.apache.spark.sql.SparkSession,
      orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val o = orders.select(
      col("o_orderkey").cast("long").as("okey"),
      col("o_custkey").cast("long").as("o_custkey"))
    val l = lineitem.select(
      col("l_orderkey").cast("long").as("okey"),
      expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
        .as("cents"))
    val (oOld, dO) = (o.filter(col("okey") % 10L =!= 0L), o.filter(col("okey") % 10L === 0L))
    val (lOld, dL) =
      (l.filter(col("cents") % 7L =!= 0L), l.filter(col("cents") % 7L === 0L))
    def rollup(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, Seq("okey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("rev_cents"))
    val dir = graft.sources.Staging.freshDir("joinview-partials")
    rollup(oOld, lOld).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    stored
      .unionByName(rollup(dO, lOld))
      .unionByName(rollup(oOld, dL))
      .unionByName(rollup(dO, dL))
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_items")).as("n_items"), sum(col("rev_cents")).as("rev_cents"))
  }

  /** [[joinAggIncremental]]'s oracle: the full-join rollup the
    * maintained view must equal.
    */
  def joinAggIncrementalSql(): String =
    s"""SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       |       CAST(count(*) AS BIGINT) AS n_items,
       |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
       |                     AS BIGINT)) AS BIGINT) AS rev_cents
       |FROM orders JOIN lineitem ON CAST(l_orderkey AS BIGINT) = CAST(o_orderkey AS BIGINT)
       |GROUP BY 1""".stripMargin
}
