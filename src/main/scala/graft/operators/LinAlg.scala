package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed linear algebra over the embedding corpus: second-moment
  * (covariance) accumulation and power-iteration PCA.
  *
  * The scale contract: the DATA pass is one typed aggregation whose
  * buffer is the d + d(d+1)/2 + 1 sufficient statistics (n, Σx,
  * upper-triangular Σx·xᵀ) — ~17 KB at d = 64, merged elementwise with
  * a map-side partial, so row count never touches memory. Everything
  * AFTER the pass operates on that O(d²) row: the eigensolve is
  * driver-side by design (the same legitimacy as the SSSP convergence
  * scalar — the collected object does not grow with the data).
  *
  * Determinism: components are fixed-pointed to milli-units BEFORE
  * aggregation, so the statistics are exact integer sums (any
  * aggregation order); the covariance and the power iteration then run
  * in double arithmetic on identical inputs with an identical fold
  * order (ascending index, seeded 0.0) in Scala and in the DuckDB
  * oracle's `list_reduce` — IEEE +,·,/,√ are exactly specified, so the
  * loadings are bit-identical before the final display rounding.
  */
object LinAlg {

  /** Embedding dimensionality of the harness table. */
  val Dim = 64

  /** Upper-triangle flat index of (i, j), 0-based, requires i ≤ j. */
  private def tri(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  /** One-pass second-moment accumulator: (n, Σc, upper-tri Σc·cᵀ). */
  class MomentsAggregator(d: Int)
      extends Aggregator[Seq[Long], (Long, Array[Long], Array[Long]), (Long, Seq[Long], Seq[Long])] {

    override def zero: (Long, Array[Long], Array[Long]) =
      (0L, new Array[Long](d), new Array[Long](d * (d + 1) / 2))

    override def reduce(
        b: (Long, Array[Long], Array[Long]),
        c: Seq[Long]): (Long, Array[Long], Array[Long]) = {
      val (n, s, p) = b
      val arr = c.toArray
      var i = 0
      while (i < d) {
        s(i) += arr(i)
        var j = i
        while (j < d) {
          p(tri(i, j, d)) += arr(i) * arr(j)
          j += 1
        }
        i += 1
      }
      (n + 1L, s, p)
    }

    override def merge(
        a: (Long, Array[Long], Array[Long]),
        b: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = {
      var i = 0
      while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      i = 0
      while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }

    override def finish(b: (Long, Array[Long], Array[Long])): (Long, Seq[Long], Seq[Long]) =
      (b._1, b._2.toSeq, b._3.toSeq)

    override def bufferEncoder: Encoder[(Long, Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Long], Array[Long])]()

    override def outputEncoder: Encoder[(Long, Seq[Long], Seq[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long], Seq[Long])]()
  }

  /** The single distributed pass: milli fixed-point components, one
    * typed aggregate, O(d²) result on the driver.
    */
  private def moments(embs: DataFrame, d: Int): (Long, Array[Long], Array[Long]) = {
    val spark = embs.sparkSession
    import spark.implicits._
    val c = embs
      .select(
        graft.functions.MicroInts(col("embedding").cast("array<double>"), 1000L).as("c"))
      .as[Seq[Long]]
    val (n, s, p) = c.select(new MomentsAggregator(d).toColumn).head()
    (n, s.toArray, p.toArray)
  }

  /** The covariance entry as dialect-neutral double arithmetic over the
    * integer statistics — shared text with the oracle. Columns in
    * scope: n, p (Σ c_i·c_j), si, sj.
    */
  private val covExpr: String =
    "(CAST(n AS DOUBLE) * CAST(p AS DOUBLE) - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1000000.0)"

  /** Per-dimension standardization statistics — the μ/σ table a
    * whitening / feature-scaling stage broadcasts before training:
    * for each of the [[Dim]] components, the vector count, integer
    * milli-unit mean (`Σx div n`, exact and engine-identical — both
    * engines truncate integer division toward zero), and the
    * population standard deviation
    * `σ = √(n·Σx² − (Σx)²) / (n · 1000)` on the 9 dp grid.
    *
    * Scale shape: ONE corpus scan with 2·[[Dim]]+1 integer sums
    * (map-side partial, no explode — the per-dim row multiplication a
    * posexplode would cost at 100 TB is avoided); the 64-row output is
    * unpivoted from the single aggregate row.
    */
  def dimStats(embs: DataFrame): DataFrame = {
    val d = Dim
    val base = embs.select(
      graft.functions.MicroInts(col("embedding").cast("array<double>"), 1000L).as("m"))
    val aggs = count(lit(1)).as("n") +:
      ((0 until d).map(i => sum(element_at(col("m"), i + 1)).as(s"s$i")) ++
        (0 until d).map(i =>
          sum(element_at(col("m"), i + 1) * element_at(col("m"), i + 1)).as(s"q$i")))
    val packed = array((0 until d).map(i =>
      struct(lit((i + 1).toLong).as("dim"), col(s"s$i").as("s"), col(s"q$i").as("q"))): _*)
    base
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n"), explode(packed).as("e"))
      .select(
        col("e.dim").as("dim"),
        col("n").as("n_vecs"),
        expr("e.s div n").as("mean_milli"),
        round(
          sqrt((col("e.q") * col("n") - col("e.s") * col("e.s")).cast("double")) /
            col("n").cast("double") / lit(1000.0d),
          9).as("std"))
  }

  /** [[dimStats]] mirrored: the same 129 sums off the same milli grid,
    * unpivoted by a generated per-dimension UNION ALL.
    */
  def dimStatsSql(): String = {
    val d = Dim
    val milli =
      "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x * 1000) AS BIGINT))"
    val sums = ((0 until d).map(i => s"CAST(sum(m[${i + 1}]) AS BIGINT) AS s$i") ++
      (0 until d).map(i => s"CAST(sum(m[${i + 1}] * m[${i + 1}]) AS BIGINT) AS q$i"))
      .mkString(",\n         ")
    val branches = (0 until d)
      .map(i => s"SELECT CAST(${i + 1} AS BIGINT) AS dim, n, s$i AS s, q$i AS q FROM a")
      .mkString("\n  UNION ALL ")
    s"""WITH m AS (SELECT $milli AS m FROM embeddings),
       |a AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         $sums
       |  FROM m),
       |u AS (
       |  $branches)
       |SELECT dim, n AS n_vecs, s // n AS mean_milli,
       |       round(sqrt(CAST(q * n - s * s AS DOUBLE)) / CAST(n AS DOUBLE) / 1000.0, 9) AS std
       |FROM u ORDER BY dim""".stripMargin
  }

  /** Upper-triangular covariance of the embedding components:
    * `cov(i, j) = (n·Σc_i c_j − Σc_i · Σc_j) / (n² · 10⁶)` (milli² →
    * unit scale), one row per 1-based (i ≤ j) pair next to the raw
    * integer second moment. The d(d+1)/2-row result is assembled from
    * the driver-side statistics; the final arithmetic and rounding run
    * as Spark expressions so they are textually the oracle's.
    */
  def covariance(embs: DataFrame, d: Int = Dim): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val (n, s, p) = moments(embs, d)
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield (i + 1L, j + 1L, n, p(tri(i, j, d)), s(i), s(j))
    rows
      .toDF("i", "j", "n", "p", "si", "sj")
      .select(
        col("i"),
        col("j"),
        col("p").as("s_xy"),
        expr(s"round($covExpr + 1e-11, 8)").as("cov"))
  }

  /** [[covariance]] mirrored: the same milli fixed point, the same
    * integer moments (via an index cross join instead of the
    * aggregator), the same covariance text.
    */
  def covarianceSql(d: Int = Dim): String =
    s"""WITH c AS (
       |  SELECT [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS c
       |  FROM embeddings),
       |dims AS (SELECT unnest(range(1, ${d + 1})) AS i),
       |m AS (
       |  SELECT di.i AS i, dj.i AS j,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(c.c[di.i] * c.c[dj.i]) AS BIGINT) AS p
       |  FROM c, dims di, dims dj WHERE di.i <= dj.i GROUP BY di.i, dj.i),
       |sv AS (SELECT d.i AS i, CAST(sum(c.c[d.i]) AS BIGINT) AS s FROM c, dims d GROUP BY d.i)
       |SELECT m.i, m.j, m.p AS s_xy,
       |       round($covExpr + 1e-11, 8) AS cov
       |FROM (SELECT m.i, m.j, m.n AS n, m.p, a.s AS si, b.s AS sj
       |      FROM m JOIN sv a ON a.i = m.i JOIN sv b ON b.i = m.j) m
       |ORDER BY i, j""".stripMargin

  /** Power-iteration start value: 1/√d = 0.125 at d = 64 — exactly
    * representable in binary, so both engines seed bit-identically.
    */
  private val V0 = 0.125

  /** Top principal component by `iters` rounds of power iteration on
    * the covariance matrix. The distributed part is [[moments]] (one
    * pass); the 64×64 iteration is driver-side with the fold order
    * pinned to ascending index so the oracle's `list_reduce` computes
    * the identical IEEE sequence. Output: one row per 1-based component
    * `(k, loading, lambda)` — the unit eigenvector entry and the
    * Rayleigh estimate (‖Av‖ of the final un-normalized iterate).
    */
  /** Shared driver-side eigensolve: one [[moments]] pass, then `iters`
    * power rounds with ascending-index folds. Returns
    * (n, Σc, loadings, lambda).
    */
  private def topComponent(
      embs: DataFrame,
      d: Int,
      iters: Int): (Long, Array[Long], Array[Double], Double) = {
    val (n, s, p) = moments(embs, d)
    val dn = n.toDouble
    val a = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      (dn * p(tri(lo, hi, d)).toDouble - s(i).toDouble * s(j).toDouble) / (dn * dn * 1000000.0)
    }
    var v = Array.fill(d)(V0)
    var lambda = 0.0
    (1 to iters).foreach { _ =>
      val u = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += a(i)(j) * v(j); j += 1 }
        acc
      }
      var nn = 0.0
      var i = 0
      while (i < d) { nn += u(i) * u(i); i += 1 }
      lambda = math.sqrt(nn)
      v = u.map(_ / lambda)
    }
    (n, s, v, lambda)
  }

  def pcaPower(embs: DataFrame, d: Int = Dim, iters: Int = 10): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val (_, _, v, lambda) = topComponent(embs, d, iters)
    val rows = (0 until d).map(k => (k + 1L, v(k), lambda))
    rows
      .toDF("k", "loading_raw", "lambda_raw")
      .select(
        col("k"),
        expr("round(loading_raw + 1e-9, 6)").as("loading"),
        expr("round(lambda_raw + 1e-9, 6)").as("lambda"))
  }

  /** The APPLY half of PCA: every embedding's score along the top
    * principal component, `s_i = (c_i · v)/1000 − μ·v` (linearity of
    * the dot product folds the centering into one scalar — no per-row
    * centered-array materialization, no interpreted zip). The
    * distributed pass is a single narrow map through the codegen'd
    * [[graft.functions.DotProduct]] kernel over the milli fixed-point
    * vectors; the eigensolve behind `v` is the same driver-side
    * [[topComponent]]. Output per vector: `(vec_id, pc1)`.
    */
  def pcaProject(embs: DataFrame, d: Int = Dim, iters: Int = 10): DataFrame = {
    val (n, s, v, _) = topComponent(embs, d, iters)
    // μ·v with the same ascending fold as the oracle's list_reduce
    var muDotV = 0.0
    var k = 0
    while (k < d) { muDotV += (s(k).toDouble / n.toDouble) * v(k); k += 1 }
    val vLit = array(v.map(lit(_)): _*)
    val c = graft.functions.MicroInts(col("embedding").cast("array<double>"), 1000L)
    val dotCol = graft.functions.DotProduct(c.cast("array<double>"), vLit)
    embs.select(
      col("vec_id"),
      round(dotCol / lit(1000.0d) - lit(muDotV) + lit(1e-9), 6).as("pc1"))
  }

  /** [[pcaPower]] with the iteration unrolled into list CTEs: matvec is
    * a `list_reduce` over the j-ascending covariance row zipped with
    * the previous iterate, the norm a `list_reduce` over the
    * i-ascending un-normalized iterate — the exact fold orders the
    * Scala loop uses.
    */
  private def normOfSql(ul: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform($ul, y -> y * y)), (a, b) -> a + b))"

  /** Shared CTE chain: fixed-point vectors (with vec_id), moments,
    * symmetric covariance rows, and the unrolled power rounds. */
  private def pcaCtes(d: Int, iters: Int): String = {
    val rounds = (1 to iters)
      .map { k =>
        s"""u$k AS (
           |  SELECT list(u ORDER BY i) AS ul FROM (
           |    SELECT r.i AS i,
           |           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |             list_transform(list_zip(r.row, w.v), s -> s[1] * s[2])),
           |             (acc, x) -> acc + x) AS u
           |    FROM a_rows r CROSS JOIN v${k - 1} w)),
           |v$k AS (
           |  SELECT list_transform(ul, x -> x / ${normOfSql("ul")}) AS v FROM u$k)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH c AS (
       |  SELECT vec_id,
       |         [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS c
       |  FROM embeddings),
       |dims AS (SELECT unnest(range(1, ${d + 1})) AS i),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
       |m AS (
       |  SELECT di.i AS i, dj.i AS j,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(c.c[di.i] * c.c[dj.i]) AS BIGINT) AS p
       |  FROM c, dims di, dims dj WHERE di.i <= dj.i GROUP BY di.i, dj.i),
       |sv AS (SELECT d.i AS i, CAST(sum(c.c[d.i]) AS BIGINT) AS s FROM c, dims d GROUP BY d.i),
       |a_full AS (
       |  SELECT i, j, $covExpr AS a FROM (
       |    SELECT m.i, m.j, m.n AS n, m.p, a.s AS si, b.s AS sj
       |    FROM m JOIN sv a ON a.i = m.i JOIN sv b ON b.i = m.j
       |    UNION ALL
       |    SELECT m.j, m.i, m.n, m.p, b.s, a.s
       |    FROM m JOIN sv a ON a.i = m.i JOIN sv b ON b.i = m.j
       |    WHERE m.i < m.j)),
       |a_rows AS (SELECT i, list(a ORDER BY j) AS row FROM a_full GROUP BY i),
       |v0 AS (SELECT ${Seq.fill(d)(V0.toString).mkString("[", ", ", "]")} AS v),
       |$rounds""".stripMargin
  }

  def pcaPowerSql(d: Int = Dim, iters: Int = 10): String =
    s"""${pcaCtes(d, iters)}
       |SELECT d.i AS k,
       |       round(w.v[d.i] + 1e-9, 6) AS loading,
       |       round(${normOfSql("u.ul")} + 1e-9, 6) AS lambda
       |FROM v$iters w CROSS JOIN u$iters u CROSS JOIN dims d
       |ORDER BY k""".stripMargin

  /** [[pcaProject]] mirrored: the per-row dot is the ascending
    * `list_reduce` fold [[graft.functions.DotProduct]] computes, and
    * μ·v is re-derived from the same moment CTEs (never an
    * interpolated literal — a double through a decimal string is not
    * the double the engine computed).
    */
  def pcaProjectSql(d: Int = Dim, iters: Int = 10): String =
    s"""${pcaCtes(d, iters)},
       |means AS (
       |  SELECT list(CAST(sv.s AS DOUBLE) / CAST(nn.n AS DOUBLE) ORDER BY sv.i) AS mu
       |  FROM sv CROSS JOIN nn),
       |muv AS (
       |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(list_zip(m.mu, w.v), s -> s[1] * s[2])),
       |         (a, b) -> a + b) AS muv
       |  FROM means m CROSS JOIN v$iters w)
       |SELECT c.vec_id,
       |       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |               list_transform(list_zip(list_transform(c.c, x -> CAST(x AS DOUBLE)), w.v),
       |                 s -> s[1] * s[2])),
       |             (a, b) -> a + b) / 1000.0 - mv.muv + 1e-9, 6) AS pc1
       |FROM c CROSS JOIN v$iters w CROSS JOIN muv mv
       |ORDER BY c.vec_id""".stripMargin
  // ---- linear CKA (centered kernel alignment) -------------------------------

  /** Linear CKA between two 8-dim blocks of the embedding space (dims
    * 1–8 vs 33–40) — the representation-similarity statistic model
    * comparisons report (Kornblith et al. 2019, "Similarity of Neural
    * Network Representations Revisited"): for linear kernels,
    * CKA(X, Y) = ‖cov(X,Y)‖²_F / (‖cov(X,X)‖_F · ‖cov(Y,Y)‖_F). Here
    * the two "models" are two fixed coordinate blocks of the same
    * corpus — the readout a drift monitor runs between an old and new
    * embedding snapshot (swap one block's columns for the other
    * table's at deploy time; the machinery is identical).
    *
    * Determinism: the single data pass is [[MomentsAggregator]]'s exact
    * integer milli-unit moments; every covariance entry is ONE fixed
    * double expression over those integers, squared and rounded to a
    * 1e-15 grid BEFORE the (order-free, exact BIGINT) Frobenius sums;
    * the final ratio is one double expression on the three integers.
    *
    * Scale shape: one corpus scan (map-side partial O(d²) buffer),
    * driver O(d²) arithmetic — the covariance/PCA legitimacy.
    *
    * Output: one row `(n, hsic_xy_fe, hsic_xx_fe, hsic_yy_fe,
    * cka_ppm)`.
    */
  def cka(embs: DataFrame): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val d = Dim
    val (n, s, p) = moments(embs, d)
    def pAt(i: Int, j: Int): Long = if (i <= j) p(tri(i, j, d)) else p(tri(j, i, d))
    // the exact covExpr arithmetic, in the same operation order
    def cov(i: Int, j: Int): Double =
      (n.toDouble * pAt(i, j).toDouble - s(i).toDouble * s(j).toDouble) /
        (n.toDouble * n.toDouble * 1000000.0)
    val bx = 0 until 8
    val by = 32 until 40
    def fro(is: Range, js: Range): Long =
      (for { i <- is; j <- js } yield math.round(cov(i, j) * cov(i, j) * 1.0e15)).sum
    val (hxy, hxx, hyy) = (fro(bx, by), fro(bx, bx), fro(by, by))
    val ckaPpm =
      if (hxx == 0L || hyy == 0L) 0L
      else math.round(hxy.toDouble / math.sqrt(hxx.toDouble * hyy.toDouble) * 1.0e6)
    Seq((n, hxy, hxx, hyy, ckaPpm))
      .toDF("n", "hsic_xy_fe", "hsic_xx_fe", "hsic_yy_fe", "cka_ppm")
  }

  /** [[cka]] mirrored: the same milli-int moments via index cross
    * joins, the same covExpr text, the same 1e-15 Frobenius grid.
    */
  def ckaSql(): String = {
    val z = s"CAST(round(($covExpr) * ($covExpr) * 1e15) AS BIGINT)"
    s"""WITH c AS (
       |  SELECT [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS c
       |  FROM embeddings),
       |dx AS (SELECT unnest(range(1, 9)) AS i),
       |dy AS (SELECT unnest(range(33, 41)) AS i),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
       |sv AS (
       |  SELECT d.i AS i, CAST(sum(c.c[d.i]) AS BIGINT) AS s
       |  FROM c, (SELECT i FROM dx UNION SELECT i FROM dy) d GROUP BY d.i),
       |fxy AS (
       |  SELECT CAST(sum($z) AS BIGINT) AS h FROM (
       |    SELECT nn.n AS n, CAST(sum(c.c[di.i] * c.c[dj.i]) AS BIGINT) AS p, a.s AS si, b.s AS sj
       |    FROM c, dx di, dy dj, nn, sv a, sv b
       |    WHERE a.i = di.i AND b.i = dj.i
       |    GROUP BY di.i, dj.i, nn.n, a.s, b.s)),
       |fxx AS (
       |  SELECT CAST(sum($z) AS BIGINT) AS h FROM (
       |    SELECT nn.n AS n, CAST(sum(c.c[di.i] * c.c[dj.i]) AS BIGINT) AS p, a.s AS si, b.s AS sj
       |    FROM c, dx di, dx dj, nn, sv a, sv b
       |    WHERE a.i = di.i AND b.i = dj.i
       |    GROUP BY di.i, dj.i, nn.n, a.s, b.s)),
       |fyy AS (
       |  SELECT CAST(sum($z) AS BIGINT) AS h FROM (
       |    SELECT nn.n AS n, CAST(sum(c.c[di.i] * c.c[dj.i]) AS BIGINT) AS p, a.s AS si, b.s AS sj
       |    FROM c, dy di, dy dj, nn, sv a, sv b
       |    WHERE a.i = di.i AND b.i = dj.i
       |    GROUP BY di.i, dj.i, nn.n, a.s, b.s))
       |SELECT nn.n, fxy.h AS hsic_xy_fe, fxx.h AS hsic_xx_fe, fyy.h AS hsic_yy_fe,
       |       CASE WHEN fxx.h = 0 OR fyy.h = 0 THEN CAST(0 AS BIGINT)
       |            ELSE CAST(round(CAST(fxy.h AS DOUBLE)
       |              / sqrt(CAST(fxx.h AS DOUBLE) * CAST(fyy.h AS DOUBLE)) * 1e6) AS BIGINT) END
       |         AS cka_ppm
       |FROM nn CROSS JOIN fxy CROSS JOIN fxx CROSS JOIN fyy""".stripMargin
  }
}
