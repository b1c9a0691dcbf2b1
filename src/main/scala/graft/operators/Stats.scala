package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classical statistical tests as distributed one-pass aggregates — the
  * inferential layer over the drift monitors ([[EventOps.psiDrift]] /
  * [[EventOps.ksDrift]] flag a change; these quantify association and
  * conformance). Cross-engine determinism disciplines: all counts and
  * sums are exact integers (64-bit, or decimal/HUGEINT where products
  * can pass 2^63); every floating term that feeds a cross-row SUM is
  * rounded to integer micro-units FIRST (the KL/PSI discipline) so the
  * aggregate is order-free; floating expressions that stay within one
  * row are written in ONE fixed form both engines evaluate identically.
  */
object Stats {

  /** Pearson chi-squared test of independence between two categorical
    * columns (market segment × nation over customers): observed cell
    * counts vs the margin-product expectation `e = row·col/N`, each
    * cell's `(o − e)²/e` rounded to integer micro-units before the
    * cross-cell sum. The classic "are these two dimensions actually
    * independent" screen a warehouse runs before trusting a stratified
    * sample or a segmented model.
    *
    * Scale shape: one hash aggregate to the contingency table (≤
    * |segs|·|nations| rows — bounded by category cardinalities, not
    * data), margins as two more aggregates OVER THE CELL TABLE, one
    * broadcast-sized join back. The corpus is scanned once.
    *
    * Output: one row `(n, n_cells, dof, chi2_micro)`.
    */
  def chi2Independence(customer: DataFrame): DataFrame = {
    val cells = customer
      .groupBy(col("c_mktsegment").as("seg"), col("c_nationkey").cast("long").as("nat"))
      .agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy(col("seg")).agg(sum(col("o")).as("row_tot"))
    val colM = cells.groupBy(col("nat")).agg(sum(col("o")).as("col_tot"))
    val tot = cells.agg(sum(col("o")).as("n"))
    cells
      .join(broadcast(rowM), Seq("seg"))
      .join(broadcast(colM), Seq("nat"))
      .crossJoin(broadcast(tot))
      .withColumn(
        "e",
        col("row_tot").cast("double") * col("col_tot").cast("double") / col("n").cast("double"))
      .withColumn(
        "term_micro",
        expr("CAST(round((o - e) * (o - e) / e * 1000000) AS BIGINT)"))
      .agg(
        max(col("n")).as("n"),
        count(lit(1)).as("n_cells"),
        ((countDistinct(col("seg")) - 1) * (countDistinct(col("nat")) - 1)).as("dof"),
        sum(col("term_micro")).as("chi2_micro"))
  }

  /** [[chi2Independence]] mirrored. */
  def chi2IndependenceSql(): String =
    s"""WITH cells AS (
       |  SELECT c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat,
       |         CAST(count(*) AS BIGINT) AS o
       |  FROM customer GROUP BY 1, 2),
       |rm AS (SELECT seg, CAST(sum(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
       |cm AS (SELECT nat, CAST(sum(o) AS BIGINT) AS col_tot FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |x AS (
       |  SELECT c.o, t.n, c.seg, c.nat,
       |         CAST(rm.row_tot AS DOUBLE) * CAST(cm.col_tot AS DOUBLE)
       |           / CAST(t.n AS DOUBLE) AS e
       |  FROM cells c JOIN rm USING (seg) JOIN cm USING (nat) CROSS JOIN t)
       |SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
       |       CAST((count(DISTINCT seg) - 1) * (count(DISTINCT nat) - 1) AS BIGINT) AS dof,
       |       CAST(sum(CAST(round((o - e) * (o - e) / e * 1000000) AS BIGINT)) AS BIGINT)
       |         AS chi2_micro
       |FROM x""".stripMargin

  /** Pairwise Pearson correlation matrix over lineitem's numeric
    * measures, in EXACT integer sums: quantity, price cents, discount
    * and tax basis points are integers; Σx, Σx², Σxy accumulate in
    * 38-digit decimals (Spark) / HUGEINT (DuckDB) — `Σ price_cents²`
    * alone passes 2^63 around 10⁶ rows, the silent-wraparound trap a
    * 64-bit sum would hit — and only the final Pearson expression
    * (one fixed form, the [[GraphOps.assortativity]] shape) touches
    * doubles. Degenerate (zero-variance) pairs yield NULL, not NaN.
    *
    * Scale shape: the corpus is scanned ONCE — the 4 measures fan out
    * to 6 (pair, x, y) rows per input row (a narrow in-row explode,
    * no shuffle of anything wide), then one 6-group hash aggregate
    * with map-side partials.
    *
    * Output: 6 rows `(pair, n, r)`.
    */
  def corrMatrix(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      col("l_quantity").cast("long").as("q"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("p"),
      expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"),
      expr("CAST(round(l_tax * 100) AS BIGINT)").as("t"))
    val pairs = Seq(("q_p", "q", "p"), ("q_d", "q", "d"), ("q_t", "q", "t"),
      ("p_d", "p", "d"), ("p_t", "p", "t"), ("d_t", "d", "t"))
    val longForm = base.select(
      explode(array(pairs.map { case (name, x, y) =>
        struct(lit(name).as("pair"), col(x).as("x"), col(y).as("y"))
      }: _*)).as("s"))
      .select(col("s.pair"), col("s.x"), col("s.y"))
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)")).cast("double")
    longForm
      .groupBy(col("pair"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("x")).as("sx"),
        dsum(col("y")).as("sy"),
        dsum(col("x") * col("y")).as("sxy"),
        dsum(col("x") * col("x")).as("sxx"),
        dsum(col("y") * col("y")).as("syy"))
      .select(
        col("pair"),
        col("n"),
        when(
          col("n") * col("sxx") - col("sx") * col("sx") === 0.0d ||
            col("n") * col("syy") - col("sy") * col("sy") === 0.0d,
          lit(null).cast("double"))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))),
            6))
          .as("r"))
  }

  /** [[corrMatrix]] mirrored (DuckDB integer sums promote to HUGEINT —
    * exact — and cast to DOUBLE only at the Pearson expression). */
  def corrMatrixSql(): String =
    s"""WITH base AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS q,
       |         CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
       |         CAST(round(l_discount * 100) AS BIGINT) AS d,
       |         CAST(round(l_tax * 100) AS BIGINT) AS t
       |  FROM lineitem),
       |lf AS (
       |  SELECT unnest([
       |    {'pair': 'q_p', 'x': q, 'y': p}, {'pair': 'q_d', 'x': q, 'y': d},
       |    {'pair': 'q_t', 'x': q, 'y': t}, {'pair': 'p_d', 'x': p, 'y': d},
       |    {'pair': 'p_t', 'x': p, 'y': t}, {'pair': 'd_t', 'x': d, 'y': t}], recursive := true)
       |  FROM base),
       |a AS (
       |  SELECT pair, CAST(count(*) AS DOUBLE) AS n_d, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |         CAST(sum(x * y) AS DOUBLE) AS sxy,
       |         CAST(sum(x * x) AS DOUBLE) AS sxx,
       |         CAST(sum(y * y) AS DOUBLE) AS syy
       |  FROM lf GROUP BY pair)
       |SELECT pair, n,
       |       CASE WHEN n_d * sxx - sx * sx = 0 OR n_d * syy - sy * sy = 0 THEN NULL
       |            ELSE round((n_d * sxy - sx * sy) /
       |                       (sqrt(n_d * sxx - sx * sx) * sqrt(n_d * syy - sy * sy)), 6)
       |       END AS r
       |FROM a""".stripMargin

  /** Benford first-digit conformance audit over order totals — the
    * fraud/data-quality screen: observed first-digit shares vs the
    * Benford expectation `log10(1 + 1/d)`, both in exact ppm. Synthetic
    * or fabricated amounts light this up (uniform generators put ~11%
    * mass on every digit where Benford puts 30.1% on 1) — which is
    * precisely what it reports on the harness's synthetic prices, and
    * why a curation pipeline runs it on ingested numeric columns.
    *
    * Scale shape: one narrow map to the first digit, one 9-group hash
    * aggregate, one 1-row total broadcast back.
    *
    * Output: 9 rows `(digit, n_obs, obs_ppm, exp_ppm, dev_ppm)`.
    */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val digits = orders
      .filter(col("o_totalprice") >= 1.0d)
      .select(substring(expr("CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING)"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n_total"))
    digits
      .crossJoin(broadcast(tot))
      .select(
        col("digit"),
        col("n_obs"),
        expr("n_obs * 1000000 div n_total").as("obs_ppm"),
        expr("CAST(round(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)").as("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
  }

  /** [[benfordAudit]] mirrored. */
  def benfordAuditSql(): String =
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
       |              AS BIGINT) AS digit,
       |         CAST(count(*) AS BIGINT) AS n_obs
       |  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
       |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM d)
       |SELECT d.digit, d.n_obs,
       |       d.n_obs * 1000000 // t.n_total AS obs_ppm,
       |       CAST(round(log10(1.0 + 1.0 / d.digit) * 1000000) AS BIGINT) AS exp_ppm,
       |       abs(d.n_obs * 1000000 // t.n_total
       |           - CAST(round(log10(1.0 + 1.0 / d.digit) * 1000000) AS BIGINT)) AS dev_ppm
       |FROM d CROSS JOIN t""".stripMargin
}
