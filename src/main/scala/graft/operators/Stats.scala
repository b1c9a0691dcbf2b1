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

  /** RFM customer segmentation (recency / frequency / monetary — the
    * classic CRM cube): per customer, days since last order, order
    * count, and lifetime cents (all exact integers), each scored into
    * quintiles by `ntile(5)` with the customer key as the
    * deterministic tiebreak (both engines distribute ntile remainders
    * to the leading buckets — standard SQL), rolled up to segment
    * counts. Recency ranks DESC so score 5 = most recent, matching F
    * and M where 5 = best.
    *
    * Scale shape: the fact table compresses to one row per customer
    * first (hash aggregate, map-side partials); the ntile windows run
    * over that compressed table. At 100 TB the global ntile swaps for
    * quantile boundaries off [[EventOps.quantilesBinned]]'s histogram
    * — the scores are unchanged up to boundary ties.
    *
    * Output: `(r_score, f_score, m_score, n_customers)` per non-empty
    * segment.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val oe = orders.agg(max(col("o_orderdate")).as("e"))
    val rfm = orders
      .crossJoin(broadcast(oe))
      .groupBy(col("o_custkey").as("cust"))
      .agg(
        // CAST TIMESTAMP: the parquet ships NTZ micros; value-identical
        // under the pinned UTC session (the eventsTable discipline)
        expr("(unix_micros(max(CAST(e AS TIMESTAMP)))" +
          " - unix_micros(max(CAST(o_orderdate AS TIMESTAMP)))) div 86400000000")
          .as("rec_days"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("mon_cents"))
    rfm
      .select(
        ntile(5).over(Window.orderBy(col("rec_days").desc, col("cust"))).as("r_score"),
        ntile(5).over(Window.orderBy(col("freq"), col("cust"))).as("f_score"),
        ntile(5).over(Window.orderBy(col("mon_cents"), col("cust"))).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** [[rfmSegments]] mirrored. */
  def rfmSegmentsSql(): String =
    s"""WITH oe AS (SELECT max(o_orderdate) AS e FROM orders),
       |rfm AS (
       |  SELECT o_custkey AS cust,
       |         (epoch_us(oe.e) - epoch_us(max(o_orderdate))) // 86400000000 AS rec_days,
       |         CAST(count(*) AS BIGINT) AS freq,
       |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon_cents
       |  FROM orders CROSS JOIN oe GROUP BY o_custkey, oe.e),
       |sc AS (
       |  SELECT CAST(ntile(5) OVER (ORDER BY rec_days DESC, cust) AS INT) AS r_score,
       |         CAST(ntile(5) OVER (ORDER BY freq, cust) AS INT) AS f_score,
       |         CAST(ntile(5) OVER (ORDER BY mon_cents, cust) AS INT) AS m_score
       |  FROM rfm)
       |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers
       |FROM sc GROUP BY 1, 2, 3""".stripMargin

  /** ABC (Pareto) revenue classification of parts: parts ranked by
    * exact-cents revenue, classified by CUMULATIVE share — A carries
    * the first 80% of revenue, B to 95%, C the tail (the 80/20 rule
    * as a query). Ties break on the part key so the running sum, and
    * therefore the class boundary, is fully deterministic; shares are
    * exact integer ppm of exact integer cents.
    *
    * Scale shape: the fact table compresses to one row per part; the
    * single-series running sum windows over that compressed table
    * (|parts| rows, not |lineitems|).
    *
    * Output: 3 rows `(cls, n_parts, cents, share_ppm)`.
    */
  def abcAnalysis(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pr = lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val tot = pr.agg(sum(col("cents")).as("tot"))
    val ord = Window
      .orderBy(col("cents").desc, col("pk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pr.withColumn("cum", sum(col("cents")).over(ord))
      .crossJoin(broadcast(tot))
      .withColumn(
        "cls",
        when(expr("cum * 1000000 div tot") <= 800000L, "A")
          .when(expr("cum * 1000000 div tot") <= 950000L, "B")
          .otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
      .crossJoin(broadcast(tot))
      .select(
        col("cls"),
        col("n_parts"),
        col("cents"),
        expr("cents * 1000000 div tot").as("share_ppm"))
  }

  /** [[abcAnalysis]] mirrored. */
  def abcAnalysisSql(): String =
    s"""WITH pr AS (
       |  SELECT l_partkey AS pk,
       |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM pr),
       |c AS (SELECT pk, cents,
       |             CAST(sum(cents) OVER (ORDER BY cents DESC, pk
       |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |      FROM pr),
       |cl AS (SELECT pk, cents,
       |              CASE WHEN cum * 1000000 // t.tot <= 800000 THEN 'A'
       |                   WHEN cum * 1000000 // t.tot <= 950000 THEN 'B'
       |                   ELSE 'C' END AS cls
       |       FROM c CROSS JOIN t),
       |agg AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
       |               CAST(sum(cents) AS BIGINT) AS cents
       |        FROM cl GROUP BY 1)
       |SELECT a.cls, a.n_parts, a.cents, a.cents * 1000000 // t.tot AS share_ppm
       |FROM agg a CROSS JOIN t""".stripMargin

  /** Basket-size distribution: distinct items per order → how many
    * orders have that size, with exact ppm share — the table that
    * justifies (or retunes) [[BasketCap]] and sizes the pair
    * generation's |items|² cost before [[basketRules]] runs. One
    * (order, part) dedup, one size aggregate, one ≤ |sizes|-row
    * rollup.
    *
    * Output: `(basket_size, n_orders, share_ppm)`.
    */
  def basketSizeDist(lineitem: DataFrame): DataFrame = {
    val sizes = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .groupBy(col("o"))
      .agg(count(lit(1)).as("basket_size"))
      .groupBy(col("basket_size"))
      .agg(count(lit(1)).as("n_orders"))
    sizes
      .crossJoin(broadcast(sizes.agg(sum(col("n_orders")).as("t"))))
      .select(
        col("basket_size"),
        col("n_orders"),
        expr("n_orders * 1000000 div t").as("share_ppm"))
  }

  /** [[basketSizeDist]] mirrored. */
  def basketSizeDistSql(): String =
    s"""WITH i AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |sz AS (SELECT o, CAST(count(*) AS BIGINT) AS basket_size FROM i GROUP BY 1),
       |h AS (SELECT basket_size, CAST(count(*) AS BIGINT) AS n_orders FROM sz GROUP BY 1),
       |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t FROM h)
       |SELECT h.basket_size, h.n_orders, h.n_orders * 1000000 // t.t AS share_ppm
       |FROM h CROSS JOIN t""".stripMargin

  /** Cohort lifetime-value matrix over orders: customers cohorted by
    * the month of their FIRST order, revenue accumulated per
    * (cohort, month offset) in exact cents with the active-customer
    * count alongside — the LTV triangle every subscription/commerce
    * dashboard renders (read down a column for "how do cohorts age",
    * across a row for "is the new cohort better"). Months are integer
    * `year·12 + month` indices under the pinned UTC session — no
    * date formatting or interval arithmetic to diverge on.
    *
    * Scale shape: one per-customer first-order aggregate joined back
    * (broadcast-sized relative to the fact side at any scale where
    * customers ≪ orders), one hash aggregate to the ≤
    * |cohorts|·|offsets| matrix.
    *
    * Output: `(cohort_month, month_offset, n_customers, cents)`.
    */
  def cohortLtv(orders: DataFrame): DataFrame = {
    val o = orders.select(
      col("o_custkey").as("cust"),
      expr("CAST(year(CAST(o_orderdate AS TIMESTAMP)) * 12" +
        " + month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)").as("midx"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val first = o.groupBy(col("cust")).agg(min(col("midx")).as("cohort"))
    o.join(first, Seq("cust"))
      .groupBy(col("cohort").as("cohort_month"), (col("midx") - col("cohort")).as("month_offset"))
      .agg(countDistinct(col("cust")).as("n_customers"), sum(col("cents")).as("cents"))
  }

  /** [[cohortLtv]] mirrored. */
  def cohortLtvSql(): String =
    s"""WITH o AS (
       |  SELECT o_custkey AS cust,
       |         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
       |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |f AS (SELECT cust, min(midx) AS cohort FROM o GROUP BY 1)
       |SELECT CAST(f.cohort AS BIGINT) AS cohort_month,
       |       CAST(o.midx - f.cohort AS BIGINT) AS month_offset,
       |       CAST(count(DISTINCT o.cust) AS BIGINT) AS n_customers,
       |       CAST(sum(o.cents) AS BIGINT) AS cents
       |FROM o JOIN f USING (cust)
       |GROUP BY 1, 2""".stripMargin

  /** Gini concentration coefficient of per-part revenue — the scalar
    * companion of [[abcAnalysis]]'s three classes: 0 = perfectly even,
    * → 1 = all revenue on one part. Computed by the exact rank formula
    * `G = Σ (2i − n − 1)·xᵢ / (n·Σx)` over parts ranked ascending by
    * (cents, part key) — every term a 64-bit integer, the result one
    * integer ppm division. What a mixture/curation planner reads to
    * decide whether a head-heavy source needs reweighting.
    *
    * Scale shape: fact table → per-part aggregate; the rank window
    * runs on the |parts|-row compressed table; one 1-row output.
    *
    * Output: one row `(n_parts, total_cents, gini_ppm)`.
    */
  def giniRevenue(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pr = lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    pr.withColumn("i", row_number().over(Window.orderBy(col("cents"), col("pk"))).cast("long"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("cents")).as("total_cents"),
        sum((lit(2L) * col("i") - lit(1L)) * col("cents")).as("wsum"))
      .select(
        col("n_parts"),
        col("total_cents"),
        // Σ(2i−n−1)x = wsum − n·Σx ; G in ppm. The numerator × 10⁶
        // overflows int64 once n·Σx passes ~9.2·10¹², so past 4·10¹²
        // the 10⁶ moves to the denominator — same branch, same integer
        // ops, both engines
        expr("""CASE WHEN n_parts * total_cents <= 4000000000000
                |     THEN (wsum - n_parts * total_cents) * 1000000
                |          div (n_parts * total_cents)
                |     ELSE (wsum - n_parts * total_cents)
                |          div ((n_parts * total_cents) div 1000000) END""".stripMargin)
          .as("gini_ppm"))
  }

  /** [[giniRevenue]] mirrored. */
  def giniRevenueSql(): String =
    s"""WITH pr AS (
       |  SELECT l_partkey AS pk,
       |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM lineitem GROUP BY 1),
       |r AS (SELECT cents,
       |             CAST(row_number() OVER (ORDER BY cents, pk) AS BIGINT) AS i
       |      FROM pr),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
       |             CAST(sum(cents) AS BIGINT) AS total_cents,
       |             CAST(sum((2 * i - 1) * cents) AS BIGINT) AS wsum
       |      FROM r)
       |SELECT n_parts, total_cents,
       |       CASE WHEN n_parts * total_cents <= 4000000000000
       |            THEN (wsum - n_parts * total_cents) * 1000000
       |                 // (n_parts * total_cents)
       |            ELSE (wsum - n_parts * total_cents)
       |                 // ((n_parts * total_cents) // 1000000) END AS gini_ppm
       |FROM a""".stripMargin

  /** Minimum pair support for [[basketRules]] — pairs seen fewer times
    * are coincidence, the classic Apriori floor. */
  val BasketMinSup = 3L

  /** Basket-size cap for [[basketRules]]: an order with more distinct
    * items than this is dropped before pair generation (its pairs cost
    * |items|² and carry no signal — the ER-block-cap discipline). */
  val BasketCap = 64L

  /** Market-basket association rules over order line items (Agrawal &
    * Srikant's Apriori at the pair level): for every part pair
    * co-bought in ≥ [[BasketMinSup]] orders — support, both
    * directional confidences, and lift, all exact integer ppm/micro
    * rationals (`lift = n_ab·N / (n_a·n_b)` — lift > 1 means the pair
    * attracts, < 1 repels). The cross-sell / co-retrieval primitive.
    *
    * Scale shape: baskets dedup to (order, part) first; pair
    * generation is an equi-join ON THE ORDER KEY (per-order fan-out ≤
    * [[BasketCap]]², orders above the cap dropped) — never an
    * all-pairs product over parts; then one hash aggregate per pair,
    * two bounded support joins, a 1-row total broadcast.
    *
    * Output: `(part_a, part_b, n_a, n_b, n_ab, support_ppm,
    * conf_ab_ppm, conf_ba_ppm, lift_micro)`.
    */
  def basketRules(lineitem: DataFrame, minSup: Long = BasketMinSup): DataFrame = {
    val i = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val ok = i
      .join(
        broadcast(
          i.groupBy(col("o")).agg(count(lit(1)).as("sz"))
            .filter(col("sz") <= BasketCap)
            .select(col("o"))),
        Seq("o"))
    val tot = ok.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
    val sup = ok.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val a = ok.alias("a")
    val b = ok.alias("b")
    a.join(b, col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSup)
      .join(sup.select(col("p").as("part_a"), col("n").as("n_a")), Seq("part_a"))
      .join(sup.select(col("p").as("part_b"), col("n").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(tot))
      .select(
        col("part_a"),
        col("part_b"),
        col("n_a"),
        col("n_b"),
        col("n_ab"),
        expr("n_ab * 1000000 div n_orders").as("support_ppm"),
        expr("n_ab * 1000000 div n_a").as("conf_ab_ppm"),
        expr("n_ab * 1000000 div n_b").as("conf_ba_ppm"),
        expr("n_ab * n_orders * 1000000 div (n_a * n_b)").as("lift_micro"))
  }

  /** [[basketRules]] mirrored. */
  def basketRulesSql(minSup: Long = BasketMinSup): String =
    s"""WITH i AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |okk AS (SELECT i.* FROM i
       |        JOIN (SELECT o FROM i GROUP BY o HAVING count(*) <= $BasketCap) g
       |        USING (o)),
       |t AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM okk),
       |sup AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM okk GROUP BY p),
       |pc AS (SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
       |       FROM okk a JOIN okk b ON a.o = b.o AND a.p < b.p
       |       GROUP BY 1, 2 HAVING count(*) >= $minSup)
       |SELECT pc.part_a, pc.part_b, sa.n AS n_a, sb.n AS n_b, pc.n_ab,
       |       pc.n_ab * 1000000 // t.n_orders AS support_ppm,
       |       pc.n_ab * 1000000 // sa.n AS conf_ab_ppm,
       |       pc.n_ab * 1000000 // sb.n AS conf_ba_ppm,
       |       pc.n_ab * t.n_orders * 1000000 // (sa.n * sb.n) AS lift_micro
       |FROM pc JOIN sup sa ON sa.p = pc.part_a JOIN sup sb ON sb.p = pc.part_b
       |CROSS JOIN t""".stripMargin

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

  /** Mutual information I(X;Y) between event type and hour-of-day, with
    * the marginal entropies and the variation of information
    * VI = H(X) + H(Y) − 2·I — the information-theoretic association
    * read next to [[chi2Independence]]'s frequentist one (chi² asks
    * "is the deviation from independence surprising?"; MI asks "how
    * many nats does knowing the hour buy about the type?"). VI is the
    * metric form (a true distance between the two partitions), the
    * number a feature-selection or schema-advisor pass ranks column
    * pairs by.
    *
    * Exactness discipline: each cell's `p·ln(p/(px·py))` is one fixed
    * double expression (identical text both engines) rounded to
    * integer NANO-nats before the cross-cell sum, so the aggregate is
    * order-free; VI is then pure integer arithmetic on the three
    * rounded sums.
    *
    * Scale shape: one corpus scan to the contingency table (≤
    * |types|·24 rows), margins re-aggregated from the cell table,
    * everything after is broadcast-sized.
    *
    * Output: one row `(n, n_cells, mi_nano, hx_nano, hy_nano, vi_nano)`.
    */
  def mutualInfo(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type").as("x"), expr("(unix_micros(ts) div 3600000000) % 24").as("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy(col("x")).agg(sum(col("o")).as("rt"))
    val colM = cells.groupBy(col("y")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val mi = cells
      .join(broadcast(rowM), Seq("x"))
      .join(broadcast(colM), Seq("y"))
      .crossJoin(broadcast(tot))
      .agg(
        max(col("n")).as("n"),
        count(lit(1)).as("n_cells"),
        sum(expr(
          "CAST(round(CAST(o AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE) / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))) * 1000000000) AS BIGINT)"))
          .as("mi_nano"))
    val hx = rowM
      .crossJoin(broadcast(tot))
      .agg(sum(expr(
        "CAST(round(-(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000) AS BIGINT)"))
        .as("hx_nano"))
    val hy = colM
      .crossJoin(broadcast(tot))
      .agg(sum(expr(
        "CAST(round(-(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000) AS BIGINT)"))
        .as("hy_nano"))
    mi.crossJoin(broadcast(hx))
      .crossJoin(broadcast(hy))
      .withColumn("vi_nano", col("hx_nano") + col("hy_nano") - lit(2L) * col("mi_nano"))
  }

  /** One-way ANOVA of event value across event types — the
    * numeric-across-groups association test completing the battery's
    * matrix ([[chi2Independence]]: categorical×categorical,
    * [[corrMatrix]]: numeric×numeric, [[mutualInfo]]:
    * information-theoretic): F = (SSB/(k−1)) / (SSW/(n−k)), with η² =
    * SSB/(SSB+SSW) as the effect size a dashboard actually thresholds
    * (F alone grows with n).
    *
    * Exactness: values enter as exact integer cents; per-group sums are
    * exact BIGINT and sums of squares exact 38-digit decimals (HUGEINT
    * in the mirror — a Long Σv² would wrap silently where DuckDB
    * errors); each group's SSW/SSB term is ONE
    * fixed double expression rounded to integer cents² before the
    * (bounded, k-row) cross-group sum; F and η² are fixed double forms
    * over the rounded sums.
    *
    * Scale shape: one corpus scan to k per-group integer triples,
    * everything after is k-row arithmetic.
    *
    * Output: one row `(n, k, ssb_c2, ssw_c2, f_milli, eta2_ppm)`.
    */
  def anovaOneWay(events: DataFrame): DataFrame = {
    val g = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("ng"),
        sum(col("v")).as("sg"),
        // Σv² in 38-digit decimals (the cuped discipline): a Long sum
        // silently wraps where DuckDB's HUGEINT mirror would not
        sum(col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
          .cast("double").as("ssg"))
    val tot = g.agg(
      sum(col("ng")).as("n"),
      count(lit(1)).as("k"),
      sum(col("sg")).as("s"))
    g.crossJoin(broadcast(tot))
      .select(
        col("n"),
        col("k"),
        expr(
          "CAST(round(CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) AS BIGINT)")
          .as("ssw_term"),
        expr(
          "CAST(round(CAST(ng AS DOUBLE) * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)")
          .as("ssb_term"))
      .groupBy(col("n"), col("k"))
      .agg(sum(col("ssb_term")).as("ssb_c2"), sum(col("ssw_term")).as("ssw_c2"))
      .select(
        col("n"),
        col("k"),
        col("ssb_c2"),
        col("ssw_c2"),
        // degenerate inputs (single group k=1, or zero within-group
        // variance) make F undefined: NULL in both engines — the double
        // form would otherwise hit Inf/NaN whose BIGINT cast DIVERGES
        // between Spark (saturates) and DuckDB (errors)
        expr(
          "CAST(round(CAST(ssb_c2 AS DOUBLE) * CAST(n - k AS DOUBLE) / nullif(CAST(ssw_c2 AS DOUBLE) * CAST(k - 1 AS DOUBLE), CAST(0 AS DOUBLE)) * 1000) AS BIGINT)")
          .as("f_milli"),
        expr("ssb_c2 * 1000000 div nullif(ssb_c2 + ssw_c2, 0)").as("eta2_ppm"))
  }

  /** [[anovaOneWay]] mirrored. */
  def anovaOneWaySql(): String =
    s"""WITH g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
       |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sg,
       |         CAST(sum(CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS ssg
       |  FROM events GROUP BY 1),
       |t AS (
       |  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
       |         CAST(sum(sg) AS BIGINT) AS s
       |  FROM g),
       |terms AS (
       |  SELECT t.n, t.k,
       |         CAST(round(CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) AS BIGINT) AS ssw_term,
       |         CAST(round(CAST(ng AS DOUBLE) * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT) AS ssb_term
       |  FROM g CROSS JOIN t),
       |a AS (
       |  SELECT n, k, CAST(sum(ssb_term) AS BIGINT) AS ssb_c2,
       |         CAST(sum(ssw_term) AS BIGINT) AS ssw_c2
       |  FROM terms GROUP BY 1, 2)
       |SELECT n, k, ssb_c2, ssw_c2,
       |       CAST(round(CAST(ssb_c2 AS DOUBLE) * CAST(n - k AS DOUBLE) / nullif(CAST(ssw_c2 AS DOUBLE) * CAST(k - 1 AS DOUBLE), CAST(0 AS DOUBLE)) * 1000) AS BIGINT) AS f_milli,
       |       ssb_c2 * 1000000 // nullif(ssb_c2 + ssw_c2, 0) AS eta2_ppm
       |FROM a""".stripMargin

  /** [[mutualInfo]] mirrored. */
  def mutualInfoSql(): String =
    s"""WITH cells AS (
       |  SELECT event_type AS x, (epoch_us(ts) // 3600000000) % 24 AS y,
       |         CAST(count(*) AS BIGINT) AS o
       |  FROM events GROUP BY 1, 2),
       |rm AS (SELECT x, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
       |cm AS (SELECT y, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |mi AS (
       |  SELECT max(t.n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
       |         CAST(sum(CAST(round(CAST(o AS DOUBLE) / CAST(t.n AS DOUBLE)
       |           * ln(CAST(o AS DOUBLE) * CAST(t.n AS DOUBLE)
       |                / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))
       |           * 1000000000) AS BIGINT)) AS BIGINT) AS mi_nano
       |  FROM cells c JOIN rm USING (x) JOIN cm USING (y) CROSS JOIN t),
       |hx AS (
       |  SELECT CAST(sum(CAST(round(-(CAST(rt AS DOUBLE) / CAST(t.n AS DOUBLE))
       |           * ln(CAST(rt AS DOUBLE) / CAST(t.n AS DOUBLE))
       |           * 1000000000) AS BIGINT)) AS BIGINT) AS hx_nano
       |  FROM rm CROSS JOIN t),
       |hy AS (
       |  SELECT CAST(sum(CAST(round(-(CAST(ct AS DOUBLE) / CAST(t.n AS DOUBLE))
       |           * ln(CAST(ct AS DOUBLE) / CAST(t.n AS DOUBLE))
       |           * 1000000000) AS BIGINT)) AS BIGINT) AS hy_nano
       |  FROM cm CROSS JOIN t)
       |SELECT mi.n, mi.n_cells, mi.mi_nano, hx.hx_nano, hy.hy_nano,
       |       hx.hx_nano + hy.hy_nano - 2 * mi.mi_nano AS vi_nano
       |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin
  // ---- empirical-Bayes (James–Stein) shrinkage -------------------------------

  /** Empirical-Bayes shrinkage of the per-type mean value toward the
    * grand mean — the James–Stein / random-effects estimator a metrics
    * platform applies before ranking small groups (Efron & Morris 1975;
    * τ² by the DerSimonian–Laird method of moments with weights
    * wᵢ = nᵢ/s²): each group's posterior mean is
    * g + (τ²/(τ² + s²/nᵢ))·(mᵢ − g), so a noisy small group collapses
    * toward the grand mean while a well-measured one keeps its own.
    *
    * Exactness: per-group sufficient statistics are exact integer cents
    * (n, Σv exact BIGINT; Σv² a 38-digit decimal / HUGEINT — the cuped
    * overflow discipline); the pooled-variance and Q terms round to integer
    * grids BEFORE their (bounded, k-row) sums (the [[anovaOneWay]]
    * discipline — a k-row double sum would still be order-sensitive);
    * τ², Bᵢ, and the shrunk means are fixed double forms on the
    * aggregated integers. Degenerate inputs (k = 1, zero within-group
    * variance) NULL out identically in both engines.
    *
    * Scale shape: one corpus scan to k integer triples; k-row
    * arithmetic after (one broadcast of the 1-row scalars).
    *
    * Output: per type `(event_type, n, mean_milli, shrunk_milli,
    * b_ppm)` — b_ppm is the shrinkage factor τ²/(τ²+vᵢ) in ppm.
    */
  def jamesStein(events: DataFrame): DataFrame = {
    val g = events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("ng"),
        sum(col("v")).as("sg"),
        // Σv² in 38-digit decimals (the cuped discipline): a Long sum
        // silently wraps where DuckDB's HUGEINT mirror would not
        sum(col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
          .cast("double").as("ssg"))
    val gP = Phys.materialized(g)
    val tot = Phys.materialized(
      gP.select(
          col("ng"), col("sg"),
          expr(
            "CAST(round(CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) AS BIGINT)")
            .as("ssw_term"))
        .agg(
          sum(col("ng")).as("n"),
          count(lit(1)).as("k"),
          sum(col("sg")).as("s"),
          sum(col("ssw_term")).as("ssw_c2")))
    // Q = Σ wᵢ(mᵢ − g)² with wᵢ = nᵢ/s²; per-group term rounded to a
    // 1e-9 grid before the exact k-row sum
    val qTerm =
      "CAST(round(CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) " +
        "* (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "* (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "* 1000000000) AS BIGINT)"
    val wTerm =
      "CAST(round(CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) * 1000000000) AS BIGINT)"
    val w2Term =
      "CAST(round(CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) " +
        "* CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) * 1000000000) AS BIGINT)"
    val qs = Phys.materialized(
      gP.crossJoin(broadcast(tot))
        .select(expr(qTerm).as("q9"), expr(wTerm).as("w9"), expr(w2Term).as("w29"))
        .agg(sum(col("q9")).as("q9"), sum(col("w9")).as("w9"), sum(col("w29")).as("w29")))
    // τ² = max(0, (Q − (k−1)) / (Σw − Σw²/Σw)), all from the 1e-9 grids
    val tau2 =
      "greatest(CAST(0 AS DOUBLE), (CAST(q9 AS DOUBLE) / 1e9 - CAST(k - 1 AS DOUBLE)) " +
        "/ nullif(CAST(w9 AS DOUBLE) / 1e9 - (CAST(w29 AS DOUBLE) / 1e9) / nullif(CAST(w9 AS DOUBLE) / 1e9, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)))"
    val vi =
      "(nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE)) / CAST(ng AS DOUBLE))"
    gP.crossJoin(broadcast(tot))
      .crossJoin(broadcast(qs))
      .select(
        col("event_type"),
        col("ng").as("n"),
        expr("CAST(round(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) * 10) AS BIGINT)")
          .as("mean_milli"),
        expr(
          s"""CAST(round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             | + ($tau2 / nullif($tau2 + $vi, CAST(0 AS DOUBLE)))
             |   * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) * 10) AS BIGINT)""".stripMargin)
          .as("shrunk_milli"),
        expr(s"CAST(round(($tau2 / nullif($tau2 + $vi, CAST(0 AS DOUBLE))) * 1000000) AS BIGINT)")
          .as("b_ppm"))
  }

  /** [[jamesStein]] mirrored: the same grids, the same τ²/B/posterior
    * text.
    */
  def jamesSteinSql(): String = {
    val qTerm =
      "CAST(round(CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) " +
        "* (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "* (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "* 1000000000) AS BIGINT)"
    val wTerm =
      "CAST(round(CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) * 1000000000) AS BIGINT)"
    val w2Term =
      "CAST(round(CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) " +
        "* CAST(ng AS DOUBLE) / (nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE))) * 1000000000) AS BIGINT)"
    val tau2 =
      "greatest(CAST(0 AS DOUBLE), (CAST(q9 AS DOUBLE) / 1e9 - CAST(k - 1 AS DOUBLE)) " +
        "/ nullif(CAST(w9 AS DOUBLE) / 1e9 - (CAST(w29 AS DOUBLE) / 1e9) / nullif(CAST(w9 AS DOUBLE) / 1e9, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)))"
    val vi =
      "(nullif(CAST(ssw_c2 AS DOUBLE), CAST(0 AS DOUBLE)) / nullif(CAST(n - k AS DOUBLE), CAST(0 AS DOUBLE)) / CAST(ng AS DOUBLE))"
    s"""WITH g AS MATERIALIZED (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
       |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sg,
       |         CAST(sum(CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS ssg
       |  FROM events GROUP BY 1),
       |t AS MATERIALIZED (
       |  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
       |         CAST(sum(sg) AS BIGINT) AS s,
       |         CAST(sum(CAST(round(CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) AS BIGINT)) AS BIGINT) AS ssw_c2
       |  FROM g),
       |q AS MATERIALIZED (
       |  SELECT CAST(sum($qTerm) AS BIGINT) AS q9,
       |         CAST(sum($wTerm) AS BIGINT) AS w9,
       |         CAST(sum($w2Term) AS BIGINT) AS w29
       |  FROM g CROSS JOIN t)
       |SELECT event_type, ng AS n,
       |       CAST(round(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) * 10) AS BIGINT) AS mean_milli,
       |       CAST(round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
       |         + ($tau2 / nullif($tau2 + $vi, CAST(0 AS DOUBLE)))
       |           * (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) * 10) AS BIGINT) AS shrunk_milli,
       |       CAST(round(($tau2 / nullif($tau2 + $vi, CAST(0 AS DOUBLE))) * 1000000) AS BIGINT) AS b_ppm
       |FROM g CROSS JOIN t CROSS JOIN q""".stripMargin
  }

}
