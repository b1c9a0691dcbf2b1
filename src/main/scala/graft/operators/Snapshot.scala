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
}
