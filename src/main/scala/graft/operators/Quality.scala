package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit layer — the checks a warehouse or curation
  * pipeline runs on every snapshot BEFORE anything downstream trusts
  * it: referential integrity across the star-schema foreign keys, a
  * declarative expectation suite (null / range / domain / uniqueness),
  * l-diversity next to the k-anonymity re-identification screen, and
  * the incremental-maintenance identity for the partial-aggregate
  * artifacts the other reports are built from.
  *
  * Determinism discipline (shared with [[Stats]]): all counts are exact
  * 64-bit integers; every rate is an exact integer ppm
  * (`viol·1 000 000 div n`), never a float division.
  */
object Quality {

  /** One foreign-key edge of the star schema. */
  private case class FkRel(
      rel: String,
      child: String, fk: String,
      parent: String, pk: String,
      broadcastParent: Boolean)

  /** The seven FK edges of the TPC-H-ish schema. `broadcastParent`
    * marks the dims that stay broadcast-sized at ANY corpus scale
    * (nation/region are fixed-cardinality); the big-big edges
    * (lineitem→orders, orders→customer) shuffle on the key — the
    * unavoidable cost of verifying a fact-to-fact reference.
    */
  private val fkRels = Seq(
    FkRel("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", broadcastParent = false),
    FkRel("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", broadcastParent = false),
    FkRel("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", broadcastParent = false),
    FkRel("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", broadcastParent = false),
    FkRel("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", broadcastParent = true),
    FkRel("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey", broadcastParent = true),
    FkRel("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey", broadcastParent = true))

  /** Referential-integrity audit over every FK edge of the schema:
    * per relationship, the child cardinality, the orphan count (child
    * rows whose key matches NO parent — the dangling references that
    * silently drop rows from every inner join downstream), and the
    * orphan rate in exact ppm. The "can I inner-join without losing
    * data" certificate.
    *
    * Scale shape: one left join + one ONE-ROW aggregate per edge —
    * the parent side is first collapsed to its DISTINCT keys (a
    * key-only aggregate, so the join build side carries one bigint
    * column, never the parent payload), fixed dims broadcast, fact
    * edges shuffle on the key with map-side-partial counting. The
    * seven one-row results union to a 7-row report.
    *
    * Output: `(rel, n_child, n_orphan, orphan_ppm)`, one row per edge.
    */
  def referentialAudit(tables: Map[String, DataFrame]): DataFrame = {
    val perRel = fkRels.map { r =>
      val parentKeys = tables(r.parent).select(col(r.pk).cast("long").as("__pk")).distinct()
      val build = if (r.broadcastParent) broadcast(parentKeys) else parentKeys
      tables(r.child)
        .select(col(r.fk).cast("long").as("__fk"))
        .join(build, col("__fk") === col("__pk"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_orphan"))
        .select(
          lit(r.rel).as("rel"),
          col("n_child"),
          col("n_orphan"),
          expr("n_orphan * 1000000 div n_child").as("orphan_ppm"))
    }
    perRel.reduce(_.unionByName(_))
  }

  /** [[referentialAudit]] mirrored. */
  def referentialAuditSql(): String =
    fkRels.map { r =>
      s"""SELECT '${r.rel}' AS rel,
         |       CAST(count(*) AS BIGINT) AS n_child,
         |       CAST(count(*) FILTER (p.__pk IS NULL) AS BIGINT) AS n_orphan,
         |       CAST(count(*) FILTER (p.__pk IS NULL) AS BIGINT) * 1000000
         |         // CAST(count(*) AS BIGINT) AS orphan_ppm
         |FROM ${r.child} c
         |LEFT JOIN (SELECT DISTINCT CAST(${r.pk} AS BIGINT) AS __pk FROM ${r.parent}) p
         |  ON CAST(c.${r.fk} AS BIGINT) = p.__pk""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** One declarative expectation over a table scan: a name and the
    * violation predicate (true = this row violates).
    */
  private case class Expectation(name: String, viol: Column)

  /** Declarative expectation suite — the Great-Expectations-shape
    * contract check: per expectation, rows checked, rows violating,
    * violation rate in exact ppm. Null / domain / range expectations
    * are per-row predicates; key-uniqueness rides a window count over
    * the key (every row of a duplicated key is a violation, so the
    * count is stable under re-ordering).
    *
    * Scale shape: ONE scan per table for all its per-row expectations
    * (the violation flags fan out in-row via an explode of a literal
    * struct array, then one ≤|expectations|-group aggregate with
    * map-side partials); the uniqueness expectation adds one hash
    * aggregate on the key. Nothing is driver-side; the report is
    * ≤ 11 rows.
    *
    * Output: `(expectation, n_checked, n_viol, viol_ppm)`.
    */
  def expectationsAudit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def suite(df: DataFrame, exps: Seq[Expectation]): DataFrame =
      df.select(explode(array(exps.map { e =>
          struct(lit(e.name).as("expectation"),
            when(e.viol, 1L).otherwise(0L).as("v"))
        }: _*)).as("s"))
        .groupBy(col("s.expectation").as("expectation"))
        .agg(count(lit(1)).as("n_checked"), sum(col("s.v")).as("n_viol"))

    val ordersExps = Seq(
      Expectation("orders.o_custkey_not_null", col("o_custkey").isNull),
      Expectation("orders.o_orderstatus_domain", !col("o_orderstatus").isin("O", "F", "P")),
      Expectation("orders.o_totalprice_range",
        col("o_totalprice") <= 0.0d || col("o_totalprice") > 600000.0d),
      Expectation("orders.o_orderdate_range",
        col("o_orderdate") < to_timestamp(lit("1992-01-01 00:00:00")) ||
          col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00"))))
    val lineExps = Seq(
      Expectation("lineitem.l_quantity_range",
        col("l_quantity") < 1.0d || col("l_quantity") > 50.0d),
      Expectation("lineitem.l_discount_range",
        col("l_discount") < 0.0d || col("l_discount") > 0.1d),
      Expectation("lineitem.l_tax_range", col("l_tax") < 0.0d || col("l_tax") > 0.1d),
      Expectation("lineitem.l_extendedprice_positive", col("l_extendedprice") <= 0.0d))

    // key-uniqueness: every row of a key that occurs >1 times violates
    val orderKeyUnique = orders
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
      .agg(
        lit("orders.o_orderkey_unique").as("expectation"),
        sum(col("c")).as("n_checked"),
        sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("n_viol"))
    val lineKeyUnique = lineitem
      .groupBy(col("l_orderkey"), col("l_linenumber")).agg(count(lit(1)).as("c"))
      .agg(
        lit("lineitem.pk_unique").as("expectation"),
        sum(col("c")).as("n_checked"),
        sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("n_viol"))

    suite(orders, ordersExps)
      .unionByName(suite(lineitem, lineExps))
      .unionByName(orderKeyUnique)
      .unionByName(lineKeyUnique)
      .withColumn("viol_ppm", expr("n_viol * 1000000 div n_checked"))
  }

  /** [[expectationsAudit]] mirrored. */
  def expectationsAuditSql(): String =
    s"""WITH raw AS (
       |  SELECT 'orders.o_custkey_not_null' AS expectation,
       |         CAST(count(*) AS BIGINT) AS n_checked,
       |         CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS n_viol
       |  FROM orders
       |  UNION ALL
       |  SELECT 'orders.o_orderstatus_domain', CAST(count(*) AS BIGINT),
       |         CAST(count(*) FILTER (o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
       |  FROM orders
       |  UNION ALL
       |  SELECT 'orders.o_totalprice_range', CAST(count(*) AS BIGINT),
       |         CAST(count(*) FILTER (o_totalprice <= 0 OR o_totalprice > 600000) AS BIGINT)
       |  FROM orders
       |  UNION ALL
       |  SELECT 'orders.o_orderdate_range', CAST(count(*) AS BIGINT),
       |         CAST(count(*) FILTER (o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
       |                OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') AS BIGINT)
       |  FROM orders
       |  UNION ALL
       |  SELECT 'lineitem.l_quantity_range', CAST(count(*) AS BIGINT),
       |         CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS BIGINT)
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'lineitem.l_discount_range', CAST(count(*) AS BIGINT),
       |         CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS BIGINT)
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'lineitem.l_tax_range', CAST(count(*) AS BIGINT),
       |         CAST(count(*) FILTER (l_tax < 0 OR l_tax > 0.1) AS BIGINT)
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'lineitem.l_extendedprice_positive', CAST(count(*) AS BIGINT),
       |         CAST(count(*) FILTER (l_extendedprice <= 0) AS BIGINT)
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'orders.o_orderkey_unique', CAST(sum(c) AS BIGINT),
       |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
       |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
       |  UNION ALL
       |  SELECT 'lineitem.pk_unique', CAST(sum(c) AS BIGINT),
       |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
       |  FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber))
       |SELECT expectation, n_checked, n_viol,
       |       n_viol * 1000000 // n_checked AS viol_ppm
       |FROM raw""".stripMargin

  /** l-diversity audit — the companion to the k-anonymity screen
    * (`pii_k_anonymity`): a QI group can be large (k-anonymous) yet
    * still leak if every member shares the SAME sensitive value, so
    * per quasi-identifier group (nation × account-balance band) we
    * report the group size k, the number of DISTINCT sensitive values
    * l (market segment as the sensitive attribute), and the l < 2
    * homogeneity-attack flag. A releasable table needs both k ≥ t AND
    * l ≥ 2.
    *
    * Scale shape: one (QI, sensitive) hash aggregate, then one QI
    * rollup — output bounded by the QI domain product, never |rows|.
    *
    * Output: `(c_nationkey, bal_band, k, l, at_risk)`.
    */
  def lDiversity(customer: DataFrame): DataFrame =
    customer
      .groupBy(
        col("c_nationkey").cast("long").as("c_nationkey"),
        floor(col("c_acctbal") / 1000.0d).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(sum(col("n")).as("k"), count(lit(1)).as("l"))
      .withColumn("at_risk", col("l") < 2L)

  /** [[lDiversity]] mirrored. */
  def lDiversitySql(): String =
    s"""WITH g AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       |         c_mktsegment, CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1, 2, 3)
       |SELECT c_nationkey, bal_band, CAST(sum(n) AS BIGINT) AS k,
       |       CAST(count(*) AS BIGINT) AS l,
       |       count(*) < 2 AS at_risk
       |FROM g GROUP BY 1, 2""".stripMargin

  // ---- differentially-private release -------------------------------------

  /** Two-sided-geometric inverse-CDF thresholds for the ε-DP geometric
    * mechanism, support clamped to [−b, b] (tail mass ~α^b folded into
    * the endpoints) and scaled to [0, 2^31): `noise(u)` = first k with
    * `u < T(k)`. Computed ONCE here and folded as LITERALS into both
    * engines' plans — cross-engine parity is exact by construction, no
    * floating point crosses an engine boundary.
    */
  private[graft] def dpThresholds(eps: Double = 1.0, b: Int = 15): Seq[(Int, Long)] = {
    val a = math.exp(-eps)
    val ks = -b to b
    val ps = ks.map(k => math.pow(a, math.abs(k)))
    val total = ps.sum
    var cum = 0.0
    ks.zip(ps).map { case (k, p) =>
      cum += p / total
      (k, math.min(math.round(cum * 2147483648.0), 2147483648L))
    }
  }

  /** The shared CASE chain over [[dpThresholds]] — identical text is
    * valid Spark SQL and DuckDB SQL, so both engines fold the same
    * literal table.
    */
  private def dpNoiseCase(u: String, eps: Double, b: Int): String = {
    val th = dpThresholds(eps, b)
    val whens = th.init.map { case (k, t) => s"WHEN $u < ${t}L THEN (${k})" }.mkString(" ")
    s"(CASE $whens ELSE (${th.last._1}) END)"
  }

  /** ε-differentially-private per-nation customer counts via the
    * geometric mechanism (Ghosh, Roughgarden & Sundararajan 2009 — the
    * discrete, utility-optimal analog of Laplace noise for
    * sensitivity-1 counting queries): each group's count is released
    * as `max(0, n + Z)` with Z two-sided geometric, α = e^(−ε).
    *
    * The noise draw is deterministic and engine-portable: an LCG draw
    * u ∈ [0, 2^31) seeded by the group key, pushed through the
    * [[dpThresholds]] literal inverse-CDF table — the privacy
    * *accounting* is real (the mechanism is exactly ε-DP w.r.t. the
    * count if Z were drawn fresh); the deterministic seed is the
    * test-harness replay convention used by every sampled operator in
    * this engine (a production run would key the LCG by a secret
    * release nonce).
    *
    * Scale shape: one hash aggregate over the grouping key, then a
    * narrow codegen'd map (the CASE chain) — output bounded by the
    * group domain, never |rows|.
    *
    * Output: `(c_nationkey, n_true, noise, n_dp)`.
    */
  def dpCounts(customer: DataFrame, eps: Double = 1.0, b: Int = 15): DataFrame =
    customer
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("u", expr("(c_nationkey * 1103515245 + 12345) % 2147483648"))
      .withColumn("noise", expr(dpNoiseCase("u", eps, b)).cast("long"))
      .select(
        col("c_nationkey"),
        col("n_true"),
        col("noise"),
        greatest(lit(0L), col("n_true") + col("noise")).as("n_dp"))

  /** [[dpCounts]] mirrored: the identical literal threshold table (the
    * CASE text is shared verbatim between the two dialects).
    */
  def dpCountsSql(eps: Double = 1.0, b: Int = 15): String = {
    val c = dpNoiseCase("u", eps, b).replace("L THEN", " THEN")
    s"""WITH g AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       |         CAST(count(*) AS BIGINT) AS n_true
       |  FROM customer GROUP BY 1),
       |u AS (SELECT c_nationkey, n_true,
       |             (c_nationkey * 1103515245 + 12345) % 2147483648 AS u FROM g)
       |SELECT c_nationkey, n_true, CAST($c AS BIGINT) AS noise,
       |       greatest(0, n_true + CAST($c AS BIGINT)) AS n_dp
       |FROM u""".stripMargin
  }

  /** Candidate functional dependencies the audit screens, as
    * (name, table, lhs, rhs) — a mix of true FDs (violations must be 0:
    * the regression canaries) and plausible-but-false ones (the
    * violation counts are the discovery signal).
    */
  private val fdCandidates = Seq(
    ("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
    ("nation.n_nationkey->n_regionkey", "nation", "n_nationkey", "n_regionkey"),
    ("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
    ("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("lineitem.l_orderkey->l_shipdate", "lineitem", "l_orderkey", "l_shipdate"))

  /** Functional-dependency audit — the schema-discovery complement of
    * the expectation suite: for each candidate `LHS → RHS`, count the
    * LHS groups that map to MORE than one RHS value. True dependencies
    * (key → attribute) must report zero violating groups — a non-zero
    * count there is a corruption canary; for merely-plausible
    * candidates the violation rate is the discovery signal (how far
    * the column pair is from determinable). One
    * `(LHS, count distinct RHS)` hash aggregate per candidate — the
    * same shape profilers run at any scale; output is |candidates|
    * rows.
    *
    * Output: `(fd, n_groups, n_viol, viol_ppm)`.
    */
  def functionalDeps(tables: Map[String, DataFrame]): DataFrame =
    fdCandidates.map { case (name, tbl, lhs, rhs) =>
      tables(tbl)
        .groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("nd"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1L, 1L).otherwise(0L)).as("n_viol"))
        .select(
          lit(name).as("fd"),
          col("n_groups"),
          col("n_viol"),
          expr("n_viol * 1000000 div n_groups").as("viol_ppm"))
    }.reduce(_ unionAll _)

  /** [[functionalDeps]] mirrored. */
  def functionalDepsSql(): String =
    fdCandidates
      .map { case (name, tbl, lhs, rhs) =>
        s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS n_groups,
           |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol,
           |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
           |            AS BIGINT) AS viol_ppm
           |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd FROM $tbl GROUP BY $lhs)""".stripMargin
      }
      .mkString("\nUNION ALL\n")

  /** Contribution-sensitivity audit — the pre-flight every
    * differential-privacy release needs: for each published statistic
    * (here the per-type event counts), the largest single-user
    * contribution IS the statistic's L1 sensitivity under user-level
    * adjacency, and the noise a DP mechanism must add scales with it.
    * A statistic one heavy user dominates (high max_share_ppm) is
    * un-releasable without contribution capping — this report is how
    * the cap is chosen. Deterministic (no noise is sampled — that
    * can't be oracle-checked; the sensitivity analysis can).
    *
    * One (type, user) hash aggregate then a per-type rollup — map-side
    * partial all the way, |types| output rows.
    *
    * Output: `(event_type, n_events, n_users, max_user_n,
    * max_share_ppm)`.
    */
  def sensitivityReport(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("c")).as("n_events"),
        count(lit(1)).as("n_users"),
        max(col("c")).as("max_user_n"),
        expr("max(c) * 1000000 div sum(c)").as("max_share_ppm"))

  /** [[sensitivityReport]] mirrored. */
  def sensitivityReportSql(): String =
    s"""WITH uc AS (
       |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
       |       CAST(count(*) AS BIGINT) AS n_users,
       |       CAST(max(c) AS BIGINT) AS max_user_n,
       |       CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS max_share_ppm
       |FROM uc GROUP BY event_type""".stripMargin

  /** Per-user contribution cap for [[sensitivityReport]]. */
  val ContributionCap = 3L

  /** Contribution capping — the DP pre-processing step the
    * sensitivity report motivates: clamp every user's contribution to
    * each statistic at [[ContributionCap]], so the released count's
    * user-level L1 sensitivity is exactly the cap (not one heavy
    * user's whole history). Reports the capped count next to the raw
    * one and the clipped mass — the bias/privacy trade the analyst
    * reads before choosing the cap. Same two-level aggregate shape as
    * the sensitivity report.
    *
    * Output: `(event_type, n_raw, n_capped, n_clipped,
    * n_users_clipped)`.
    */
  def contributionCap(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("c")).as("n_raw"),
        sum(least(col("c"), lit(ContributionCap))).as("n_capped"),
        sum(greatest(col("c") - ContributionCap, lit(0L))).as("n_clipped"),
        sum(when(col("c") > ContributionCap, 1L).otherwise(0L)).as("n_users_clipped"))

  /** [[contributionCap]] mirrored. */
  def contributionCapSql(): String =
    s"""WITH uc AS (
       |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_raw,
       |       CAST(sum(least(c, $ContributionCap)) AS BIGINT) AS n_capped,
       |       CAST(sum(greatest(c - $ContributionCap, 0)) AS BIGINT) AS n_clipped,
       |       CAST(sum(CASE WHEN c > $ContributionCap THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_users_clipped
       |FROM uc GROUP BY event_type""".stripMargin

  /** Schema/profile drift between two corpus versions — the
    * column-level diff a warehouse runs when a re-crawl lands: per
    * column of the versioned corpus log, null rate, distinct count and
    * mean length at v1 vs v2-current, with deltas in exact ppm/milli.
    * The operator takes the two snapshots as DataFrames (any two
    * versions of any table); the harness feeds it the shared
    * [[graft.SparkEntry]] version log. |columns| output rows — a
    * metadata-scale report off two single scans.
    *
    * Output: `(column, null_ppm_v1, null_ppm_v2, n_distinct_v1,
    * n_distinct_v2, mean_len_milli_v1, mean_len_milli_v2)`.
    */
  def profileDrift(v1: DataFrame, v2: DataFrame, cols: Seq[String]): DataFrame = {
    def profile(df: DataFrame, tag: String): DataFrame =
      cols
        .map { c =>
          df.agg(
              count(lit(1)).as("n"),
              sum(when(col(c).isNull, 1L).otherwise(0L)).as("nulls"),
              countDistinct(col(c)).as("nd"),
              sum(length(col(c).cast("string")).cast("long")).as("len"))
            .select(
              lit(c).as("column"),
              expr("nulls * 1000000 div n").as(s"null_ppm_$tag"),
              col("nd").as(s"n_distinct_$tag"),
              expr("len * 1000 div greatest(n - nulls, 1)").as(s"mean_len_milli_$tag"))
        }
        .reduce(_ unionAll _)
    profile(v1, "v1").join(profile(v2, "v2"), Seq("column"))
  }

  /** [[profileDrift]] mirrored over the shared version-log SQL. */
  def profileDriftSql(v1Sql: String, v2Sql: String, cols: Seq[String]): String = {
    def profile(src: String, tag: String): String =
      cols
        .map(c => s"""SELECT '$c' AS "column",
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) * 1000000
           |            // count(*) AS BIGINT) AS null_ppm_$tag,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct_$tag,
           |       CAST(sum(length(CAST($c AS VARCHAR))) * 1000
           |            // greatest(count(*) - sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 1)
           |            AS BIGINT) AS mean_len_milli_$tag
           |FROM ($src)""".stripMargin)
        .mkString("\nUNION ALL\n")
    s"""SELECT * FROM (${profile(v1Sql, "v1")}) p1
       |JOIN (${profile(v2Sql, "v2")}) p2 USING ("column")""".stripMargin
  }

  /** t-closeness audit — the third privacy screen after k-anonymity
    * (group size) and l-diversity (distinct sensitive values): a group
    * can be large AND diverse yet still leak if its sensitive-value
    * DISTRIBUTION differs sharply from the table's global distribution
    * (skewness attack — Li, Li & Venkatasubramanian, ICDE 2007). Per
    * quasi-identifier group we report the total-variation distance
    * between the group's market-segment distribution and the global
    * one, in exact integer ppm:
    *
    *   tvd_ppm = floor( Σ_s |n_gs·N − n_s·k_g| · 500000 / (k_g·N) )
    *
    * computed entirely in 64-bit integer cross-multiplication — no
    * float division anywhere, so both engines agree bit-for-bit.
    * Segments ABSENT from a group still contribute (|0 − n_s·k_g|),
    * which is why the group list is crossed with the (bounded,
    * broadcast) global segment histogram before the left join.
    *
    * Scale shape: one (QI, sensitive) hash aggregate over the table,
    * then all further work is on tables bounded by |QI domain| ×
    * |sensitive domain| — never |rows|. At 100 TB the integer products
    * would move to decimal(38); at any test sf they fit int64 with
    * >10^4 headroom.
    *
    * Output: `(c_nationkey, bal_band, k, tvd_ppm, at_risk)` with
    * `at_risk = tvd_ppm > 300000` (t = 0.3).
    */
  def tCloseness(customer: DataFrame): DataFrame = {
    val qi = Seq(
      col("c_nationkey").cast("long").as("c_nationkey"),
      floor(col("c_acctbal") / 1000.0d).cast("long").as("bal_band"))
    val gs = customer
      .groupBy(qi :+ col("c_mktsegment").as("seg"): _*)
      .agg(count(lit(1)).as("n_gs"))
    val g = gs.groupBy(col("c_nationkey"), col("bal_band")).agg(sum(col("n_gs")).as("k"))
    val segTotals = customer.groupBy(col("c_mktsegment").as("seg")).agg(count(lit(1)).as("n_s"))
    val globalN = customer.agg(count(lit(1)).as("n_total"))
    val grid = g
      .crossJoin(broadcast(segTotals))
      .crossJoin(broadcast(globalN))
      .join(gs, Seq("c_nationkey", "bal_band", "seg"), "left_outer")
      .withColumn("n_gs", coalesce(col("n_gs"), lit(0L)))
    grid
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(
        first(col("k")).as("k"),
        expr("sum(abs(n_gs * n_total - n_s * k)) * 500000 div (first(k) * first(n_total))")
          .as("tvd_ppm"))
      .withColumn("at_risk", col("tvd_ppm") > 300000L)
  }

  /** [[tCloseness]] mirrored. */
  def tClosenessSql(): String =
    s"""WITH gs AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       |         c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_gs
       |  FROM customer GROUP BY 1, 2, 3),
       |g AS (SELECT c_nationkey, bal_band, CAST(sum(n_gs) AS BIGINT) AS k
       |      FROM gs GROUP BY 1, 2),
       |st AS (SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_s
       |       FROM customer GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM customer),
       |grid AS (
       |  SELECT g.c_nationkey, g.bal_band, g.k, st.seg, st.n_s, nn.n_total,
       |         coalesce(gs.n_gs, 0) AS n_gs
       |  FROM g CROSS JOIN st CROSS JOIN nn
       |  LEFT JOIN gs ON gs.c_nationkey = g.c_nationkey
       |             AND gs.bal_band = g.bal_band AND gs.seg = st.seg)
       |SELECT c_nationkey, bal_band, k,
       |       CAST(sum(abs(n_gs * n_total - n_s * k)) * 500000 // (k * n_total)
       |            AS BIGINT) AS tvd_ppm,
       |       (sum(abs(n_gs * n_total - n_s * k)) * 500000 // (k * n_total)) > 300000 AS at_risk
       |FROM grid GROUP BY c_nationkey, bal_band, k, n_total""".stripMargin

  /** Incremental aggregate maintenance — the identity every
    * materialized per-source rollup relies on at 100 TB: the corpus
    * splits into a BASE (already summarized into a stored
    * partial-aggregate artifact; here `doc_id % 10 != 0`) and an
    * arriving DELTA, and the maintained view is
    * `merge(stored_partials, partials(delta))` — sum merges with sum,
    * min with min, max with max — WITHOUT rescanning the base. The
    * oracle computes the same rollup over the FULL corpus directly,
    * so parity proves the maintenance identity, not just the
    * aggregate.
    *
    * Scale shape: the base is touched once ever (artifact build); each
    * maintenance tick costs one delta-sized aggregate plus a merge
    * over |sources| stored rows. This is the batch twin of the
    * streaming upsert family (`docs_stream_minhash_upsert` et al.).
    *
    * Output: `(source, n_docs, sum_chars, min_doc, max_doc)`.
    */
  def aggIncremental(spark: SparkSession, docs: DataFrame): DataFrame = {
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    val dir = graft.sources.Staging.freshDir("agg-partials")
    partials(docs.filter(col("doc_id") % 10 =!= 0L)).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    stored.unionByName(partials(docs.filter(col("doc_id") % 10 === 0L)))
      .groupBy(col("source"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        min(col("min_doc")).as("min_doc"),
        max(col("max_doc")).as("max_doc"))
  }

  /** [[aggIncremental]]'s oracle: the FULL-corpus rollup the
    * maintained view must equal.
    */
  def aggIncrementalSql(): String =
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(min(doc_id) AS BIGINT) AS min_doc,
       |       CAST(max(doc_id) AS BIGINT) AS max_doc
       |FROM documents GROUP BY source""".stripMargin
}
