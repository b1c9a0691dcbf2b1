package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional (Z-order) clustering for
  * scan pruning.
  *
  * At 100 TB the cheapest predicate is the one that never reads the
  * data: parquet keeps per-file / per-row-group min-max statistics, and
  * a scan skips any unit whose [min,max] range misses the predicate.
  * Sorting by ONE column gives that column tight ranges and every other
  * column full-width ranges; interleaving the bits of TWO columns into a
  * Z-value and range-partitioning by it gives BOTH columns compact
  * per-file bounding boxes (each file covers a small tile of the key
  * plane), so a box predicate on either or both keys skips most files.
  * This is the standard layout technique in large lakehouse tables;
  * here it is expressed as a plain Column expression + repartitionByRange,
  * so Catalyst/Tungsten see nothing custom.
  *
  * No reference counterpart (north-star extension per BASELINE.json).
  */
object Layout {

  /** Bits per dimension interleaved into the Z-value. 16 bits × 2 dims
    * fit comfortably in a long and give a 65536×65536 tile space.
    */
  val ZBits = 16

  /** The Z-value (Morton code) of two [[ZBits]]-bit non-negative keys:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Pure long
    * arithmetic over disjoint bit positions (the terms never overlap, so
    * `+` IS bitwise-or), fully codegen'd, and mirrored term-for-term by
    * [[zvalueSql]] for the DuckDB oracle.
    */
  def zvalue(x: Column, y: Column): Column =
    (0 until ZBits)
      .map { i =>
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
          shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      }
      .reduce(_ + _)

  /** ANSI-SQL mirror of [[zvalue]] (DuckDB-runnable). */
  def zvalueSql(x: String, y: String): String =
    (0 until ZBits)
      .map(i => s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}")
      .mkString("(", " + ", ")")

  /** Rewrite `df` into a Z-ordered parquet layout: Z-value computed from
    * the two (pre-masked, [[ZBits]]-bit) key columns, range-partitioned
    * into `nFiles` contiguous Z-ranges, sorted within each, one file per
    * range. Every output file then covers a compact tile of the
    * (xCol, yCol) plane — the property LayoutSpec measures via per-file
    * min-max boxes. The Z-value itself is dropped from the files: it is
    * layout, not data.
    *
    * Shape at scale: one range exchange (sampled boundaries) + a local
    * sort — the same cost as any global sort, paid once at write time,
    * repaid on every subsequent box scan.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, nFiles: Int, dir: String): Unit =
    curveWrite(df, zvalue(col(xCol), col(yCol)), nFiles, dir)

  /** [[zorderWrite]] with the Hilbert index as the clustering key —
    * the jump-free curve gives strictly tighter per-file boxes (see
    * [[graft.functions.HilbertIndex]]; the prune report measures the
    * difference). Same write cost: one range exchange + local sort.
    */
  def hilbertWrite(df: DataFrame, xCol: String, yCol: String, nFiles: Int, dir: String): Unit =
    curveWrite(df, graft.functions.HilbertIndex(col(xCol), col(yCol), ZBits), nFiles, dir)

  private def curveWrite(df: DataFrame, curve: Column, nFiles: Int, dir: String): Unit =
    df.withColumn("__c", curve)
      .repartitionByRange(nFiles, col("__c"))
      .sortWithinPartitions(col("__c"))
      .drop("__c")
      .write
      .mode("overwrite")
      .parquet(dir)

  /** Driver-facing round-trip: stage lineitem in a Z-ordered layout over
    * the masked (l_orderkey, l_partkey) plane, then aggregate a box
    * predicate over the staged files. The result is layout-independent
    * (the oracle runs the same box over the original table) — what the
    * layout changes is HOW MUCH of the staged table the scan must read,
    * which LayoutSpec pins via per-file min-max boxes and the pushed
    * filters.
    */
  def zorderBoxAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val mask = (1L << ZBits) - 1
    val keyed = graft.model
      .table(spark, sfDir, "lineitem")
      .select(
        col("l_orderkey").bitwiseAND(lit(mask)).as("x"),
        col("l_partkey").bitwiseAND(lit(mask)).as("y"),
        col("l_quantity"))
    val dir = graft.sources.Staging.freshDir("zorder-lineitem")
    zorderWrite(keyed, "x", "y", nFiles = 16, dir = dir)
    spark.read
      .parquet(dir)
      .filter(col("x").between(1000, 9000) && col("y").between(2000, 12000))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  /** SQL mirror of [[zorderBoxAgg]]'s result (layout-independent). */
  val zorderBoxAggSql: String =
    """SELECT count(*) AS n_rows,
      |       CAST(sum(x) AS BIGINT) AS sum_x,
      |       CAST(sum(y) AS BIGINT) AS sum_y,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM (SELECT l_orderkey & 65535 AS x, l_partkey & 65535 AS y, l_quantity
      |      FROM lineitem)
      |WHERE x BETWEEN 1000 AND 9000 AND y BETWEEN 2000 AND 12000""".stripMargin

  /** The Z-curve histogram as a first-class query: Z-values of the
    * masked key plane, bucketed by their top byte (256 coarse tiles),
    * with row counts and per-bucket key bounds. Exercises [[zvalue]]
    * itself against the oracle's bit-arithmetic mirror — the layout
    * writer above reuses the identical expression.
    */
  def zcurveHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val mask = (1L << ZBits) - 1
    graft.model
      .table(spark, sfDir, "lineitem")
      .select(
        zvalue(
          col("l_orderkey").bitwiseAND(lit(mask)),
          col("l_partkey").bitwiseAND(lit(mask))).as("z"),
        col("l_orderkey").bitwiseAND(lit(mask)).as("x"),
        col("l_partkey").bitwiseAND(lit(mask)).as("y"))
      .groupBy(shiftright(col("z"), 2 * ZBits - 8).as("z_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"),
        min(col("y")).as("min_y"),
        max(col("y")).as("max_y"))
  }

  /** SQL mirror of [[zcurveHistogram]] (DuckDB). */
  val zcurveHistogramSql: String = {
    val z = zvalueSql("x", "y")
    s"""SELECT $z >> ${2 * ZBits - 8} AS z_bucket,
       |       count(*) AS n_rows,
       |       min(x) AS min_x, max(x) AS max_x,
       |       min(y) AS min_y, max(y) AS max_y
       |FROM (SELECT l_orderkey & 65535 AS x, l_partkey & 65535 AS y FROM lineitem)
       |GROUP BY 1""".stripMargin
  }

  /** DuckDB mirror of [[graft.functions.HilbertIndex]]: the xy2d loop
    * unrolled as `bits` chained CTE steps carrying (cx, cy, d) — one
    * SELECT per bit level over the whole keyed table (never per-row
    * recursion). Expects a CTE named `keyed(x, y)` in scope; emits CTEs
    * `h0..h$bits`, where `h$bits` has columns `(x, y, d)`.
    */
  def hilbertSqlCtes(bits: Int): String = {
    val h0 = "h0 AS (SELECT x, y, x AS cx, y AS cy, CAST(0 AS BIGINT) AS d FROM keyed)"
    val steps = (0 until bits).map { i =>
      val k = bits - 1 - i
      val s = 1L << k
      val rx = s"((cx >> $k) & 1)"
      val ry = s"((cy >> $k) & 1)"
      s"""h${i + 1} AS (
         |  SELECT x, y,
         |         CASE WHEN $ry = 0
         |              THEN (CASE WHEN $rx = 1 THEN $s - 1 - cy ELSE cy END)
         |              ELSE cx END AS cx,
         |         CASE WHEN $ry = 0
         |              THEN (CASE WHEN $rx = 1 THEN $s - 1 - cx ELSE cx END)
         |              ELSE cy END AS cy,
         |         d + ${s * s} * xor(3 * $rx, $ry) AS d
         |  FROM h$i)""".stripMargin
    }
    (h0 +: steps).mkString(",\n")
  }

  /** The Hilbert-curve histogram as a first-class query — the sibling of
    * [[zcurveHistogram]] on the SAME masked key plane, exercising the
    * codegen'd [[graft.functions.HilbertIndex]] kernel against the
    * oracle's chained-CTE re-derivation of the rotation loop. Comparing
    * the two histograms' per-bucket key boxes side by side is the
    * curve-choice evidence: Hilbert buckets never straddle the plane the
    * way Z's seam-crossing buckets do.
    */
  def hilbertHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val mask = (1L << ZBits) - 1
    graft.model
      .table(spark, sfDir, "lineitem")
      .select(
        graft.functions
          .HilbertIndex(
            col("l_orderkey").bitwiseAND(lit(mask)),
            col("l_partkey").bitwiseAND(lit(mask)),
            ZBits)
          .as("h"),
        col("l_orderkey").bitwiseAND(lit(mask)).as("x"),
        col("l_partkey").bitwiseAND(lit(mask)).as("y"))
      .groupBy(shiftright(col("h"), 2 * ZBits - 8).as("h_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"),
        min(col("y")).as("min_y"),
        max(col("y")).as("max_y"))
  }

  /** SQL mirror of [[hilbertHistogram]] (DuckDB). */
  val hilbertHistogramSql: String =
    s"""WITH keyed AS (
       |  SELECT l_orderkey & ${(1L << ZBits) - 1} AS x,
       |         l_partkey & ${(1L << ZBits) - 1} AS y FROM lineitem),
       |${hilbertSqlCtes(ZBits)}
       |SELECT d >> ${2 * ZBits - 8} AS h_bucket,
       |       count(*) AS n_rows,
       |       min(x) AS min_x, max(x) AS max_x,
       |       min(y) AS min_y, max(y) AS max_y
       |FROM h$ZBits
       |GROUP BY 1""".stripMargin

  // ---- small-file compaction planning --------------------------------------

  /** Docs per pseudo-file and the compaction target size (chars stand
    * in for bytes on the synthetic corpus). Deliberately small so the
    * sf0.01 corpus yields a multi-bin plan worth auditing.
    */
  val CompactionDocsPerFile = 10L
  val CompactionTargetBytes = 16384L

  /** Small-file compaction planner — the metadata-only operator every
    * lakehouse table needs at 100 TB: streaming ingest leaves thousands
    * of under-sized files per partition, and the planner groups them
    * into target-sized rewrite bins (the Iceberg/Delta "bin-pack
    * compaction" shape). Files are the unit of work: per partition
    * (source), files ordered by id are coalesced next-fit by running
    * size — `bin = cum_bytes_before div target` — so the plan is a pure
    * window cumulative over the FILE LISTING, a table ~6 orders of
    * magnitude smaller than the data it reorganizes. Compaction never
    * crosses a partition boundary (bins are per-source), matching how
    * real table formats scope rewrites.
    *
    * Output per planned bin: `(source, bin, n_files, n_docs, bytes,
    * fill_ppm)` — fill_ppm = bytes·10⁶ div target exposes the
    * under-full tail bin per source.
    */
  def compactionPlan(docs: DataFrame): DataFrame = {
    val files = docs
      .groupBy(
        col("source"),
        expr(s"doc_id div $CompactionDocsPerFile").as("file_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("file_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(win), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $CompactionTargetBytes"))
      .groupBy(col("source"), col("bin"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("bytes")).as("bytes"),
        expr(s"sum(bytes) * 1000000 div $CompactionTargetBytes").as("fill_ppm"))
  }

  /** [[compactionPlan]] mirrored. */
  def compactionPlanSql(): String =
    s"""WITH files AS (
       |  SELECT source, CAST(doc_id // $CompactionDocsPerFile AS BIGINT) AS file_id,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS bytes
       |  FROM documents GROUP BY 1, 2),
       |planned AS (
       |  SELECT source, n_docs, bytes,
       |         CAST(coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY file_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           // $CompactionTargetBytes AS BIGINT) AS bin
       |  FROM files)
       |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_files,
       |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |       CAST(sum(bytes) AS BIGINT) AS bytes,
       |       CAST(sum(bytes) * 1000000 // $CompactionTargetBytes AS BIGINT) AS fill_ppm
       |FROM planned GROUP BY 1, 2""".stripMargin

  // ---- zone-map prune effectiveness ----------------------------------------

  /** Rows per zone (parquet row-group stand-in) for the prune report. */
  val ZoneRows = 256L

  /** Key-domain bits for the prune report: both keys wrap into the SAME
    * 10-bit domain (1024×1024 plane). Equal-cardinality dimensions are
    * the honest Z-order benchmark — with one key's domain much smaller
    * than the other's, the Morton order degenerates to the big key's
    * order and pruning on the small key needs zone granularity the
    * report shouldn't assume.
    */
  val ReportBits = 10

  /** Zone-map prune report — measures the thing Z-ordering exists FOR:
    * both layouts chunk the SAME rows into equal [[ZoneRows]]-row zones
    * (exactly parquet row groups), differing only in the clustering
    * order — `orderkey_sorted` (1-D: rows ordered by (x, y)) vs
    * `zorder` (rows ordered by the [[zvalue]] Morton code, the order
    * [[zorderWrite]] lays files out in). Each zone carries its [min,max]
    * key box, and each probe predicate is tested against every zone's
    * box exactly as a parquet reader tests row-group statistics.
    * Probes: the 2-D box, and each 1-D slice alone — the case where
    * Z-order pays on both dimensions while 1-D clustering prunes only
    * its own leading key.
    *
    * Zone stats are tie-safe: rows tied on the full sort key are
    * identical (x, y) tuples, so however a tie splits across a zone
    * boundary the min/max boxes and counts are unchanged — which is
    * what makes the report engine-independent. Zone ids come from
    * [[Phys.globalRank]] — range-repartition + per-partition offsets,
    * the distributed form of the write-time sort [[zorderWrite]]
    * already pays — never a single-partition ORDER BY window over the
    * data-scale table; the report itself is metadata-scale:
    * |zones|·|probes|.
    *
    * `rows_matched` is layout-independent (proven by parity: both
    * layouts show the same value); `rows_scanned` and `read_amp_ppm =
    * rows_scanned·10⁶ div max(rows_matched, 1)` are the layout's score.
    *
    * Output: `(layout, probe, zones_total, zones_scanned, rows_scanned,
    * rows_matched, read_amp_ppm)`.
    */
  def zoneMapPruneReport(lineitem: DataFrame): DataFrame = {
    val mask = (1L << ReportBits) - 1
    val keyed = lineitem.select(
      col("l_orderkey").bitwiseAND(lit(mask)).as("x"),
      col("l_partkey").bitwiseAND(lit(mask)).as("y"))
    def zones(orderCols: Seq[Column], layout: String): DataFrame = {
      Phys
        .globalRank(keyed, orderCols, "rn")
        .withColumn("zone", expr(s"rn div $ZoneRows"))
        .groupBy(col("zone"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("x")).as("min_x"),
          max(col("x")).as("max_x"),
          min(col("y")).as("min_y"),
          max(col("y")).as("max_y"))
        .select(lit(layout).as("layout"), col("*"))
    }
    val allZones = zones(Seq(col("x"), col("y")), "orderkey_sorted")
      .unionAll(zones(Seq(zvalue(col("x"), col("y")), col("x"), col("y")), "zorder"))
      .unionAll(
        zones(
          Seq(
            graft.functions.HilbertIndex(col("x"), col("y"), ReportBits),
            col("x"),
            col("y")),
          "hilbert"))
    val probes = Seq(
      ("box_xy", 100L, 400L, 600L, 900L),
      ("slice_x", 100L, 400L, 0L, mask),
      ("slice_y", 0L, mask, 600L, 900L))
    val probeDf = broadcast(
      allZones.sparkSession
        .createDataFrame(probes)
        .toDF("probe", "x_lo", "x_hi", "y_lo", "y_hi"))
    val matchCols = probes.map { case (p, xl, xh, yl, yh) =>
      sum(
        when(col("x").between(xl, xh) && col("y").between(yl, yh), 1L)
          .otherwise(0L)).as(p)
    }
    val matched = keyed
      .agg(matchCols.head, matchCols.tail: _*)
      .select(
        explode(
          map(
            probes.flatMap { case (p, _, _, _, _) => Seq(lit(p), col(p)) }: _*))
          .as(Seq("probe", "rows_matched")))
    allZones
      .crossJoin(probeDf)
      .withColumn(
        "scanned",
        !(col("max_x") < col("x_lo") || col("min_x") > col("x_hi") ||
          col("max_y") < col("y_lo") || col("min_y") > col("y_hi")))
      .groupBy(col("layout"), col("probe"))
      .agg(
        count(lit(1)).as("zones_total"),
        sum(when(col("scanned"), 1L).otherwise(0L)).as("zones_scanned"),
        sum(when(col("scanned"), col("n_rows")).otherwise(0L)).as("rows_scanned"))
      .join(broadcast(matched), Seq("probe"))
      .select(
        col("layout"),
        col("probe"),
        col("zones_total"),
        col("zones_scanned"),
        col("rows_scanned"),
        col("rows_matched"),
        expr("rows_scanned * 1000000 div greatest(rows_matched, 1)").as("read_amp_ppm"))
  }

  /** [[zoneMapPruneReport]] mirrored. */
  def zoneMapPruneReportSql(): String = {
    val mask = (1L << ReportBits) - 1
    val z = zvalueSql("x", "y")
    s"""WITH keyed AS (
       |  SELECT l_orderkey & $mask AS x, l_partkey & $mask AS y FROM lineitem),
       |${hilbertSqlCtes(ReportBits)},
       |zones AS (
       |  SELECT 'orderkey_sorted' AS layout, zone,
       |         CAST(count(*) AS BIGINT) AS n_rows,
       |         min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
       |  FROM (SELECT x, y,
       |               (row_number() OVER (ORDER BY x, y) - 1) // $ZoneRows AS zone
       |        FROM keyed) GROUP BY 2
       |  UNION ALL
       |  SELECT 'zorder', zone,
       |         CAST(count(*) AS BIGINT),
       |         min(x), max(x), min(y), max(y)
       |  FROM (SELECT x, y,
       |               (row_number() OVER (ORDER BY $z, x, y) - 1) // $ZoneRows AS zone
       |        FROM keyed) GROUP BY 2
       |  UNION ALL
       |  SELECT 'hilbert', zone,
       |         CAST(count(*) AS BIGINT),
       |         min(x), max(x), min(y), max(y)
       |  FROM (SELECT x, y,
       |               (row_number() OVER (ORDER BY d, x, y) - 1) // $ZoneRows AS zone
       |        FROM h$ReportBits) GROUP BY 2),
       |probes(probe, x_lo, x_hi, y_lo, y_hi) AS (VALUES
       |  ('box_xy', 100, 400, 600, 900),
       |  ('slice_x', 100, 400, 0, $mask),
       |  ('slice_y', 0, $mask, 600, 900)),
       |matched AS (
       |  SELECT p.probe, CAST(count(*) FILTER (
       |           k.x BETWEEN p.x_lo AND p.x_hi AND k.y BETWEEN p.y_lo AND p.y_hi)
       |         AS BIGINT) AS rows_matched
       |  FROM keyed k CROSS JOIN probes p GROUP BY p.probe)
       |SELECT z.layout, p.probe,
       |       CAST(count(*) AS BIGINT) AS zones_total,
       |       CAST(count(*) FILTER (NOT (z.max_x < p.x_lo OR z.min_x > p.x_hi
       |         OR z.max_y < p.y_lo OR z.min_y > p.y_hi)) AS BIGINT) AS zones_scanned,
       |       CAST(coalesce(sum(z.n_rows) FILTER (NOT (z.max_x < p.x_lo
       |         OR z.min_x > p.x_hi OR z.max_y < p.y_lo OR z.min_y > p.y_hi)), 0)
       |         AS BIGINT) AS rows_scanned,
       |       m.rows_matched,
       |       CAST(coalesce(sum(z.n_rows) FILTER (NOT (z.max_x < p.x_lo OR z.min_x > p.x_hi
       |         OR z.max_y < p.y_lo OR z.min_y > p.y_hi)), 0) * 1000000
       |         // greatest(m.rows_matched, 1) AS BIGINT) AS read_amp_ppm
       |FROM zones z CROSS JOIN probes p JOIN matched m ON m.probe = p.probe
       |GROUP BY z.layout, p.probe, m.rows_matched""".stripMargin
  }

  // ---- greedy cube-view selection ------------------------------------------

  /** Greedy materialized-view selection over the data-cube lattice
    * (Harinarayan, Rajaraman & Ullman 1996, "Implementing Data Cubes
    * Efficiently"): the 3-dim lattice over events (user × type × day)
    * has 8 views; view sizes come from ONE cube pass (each view's row
    * count = its distinct group count); then the classic greedy picks
    * `picks` views beyond the always-materialized top view, each round
    * choosing the view whose materialization most reduces total query
    * cost — benefit(v) = Σ_{w ⊑ v} max(0, cost(w, S) − |v|), cost(w, S)
    * = the smallest materialized ancestor. HRU prove this greedy is
    * within (1 − 1/e) of optimal.
    *
    * The lattice walk runs driver-side over the COLLECTED 8-row size
    * table (the bounded-artifact convention the GBM trainer's argmin
    * uses) — all-integer, tiebreak (benefit desc, size asc, mask asc),
    * so the trace is engine-exact. The data-sized work is the one cube
    * aggregate; at 100 TB that is the only term that grows.
    *
    * Output: `(round, view_name, view_rows, benefit)`, one row per
    * greedy pick; view names are subsets of "utd".
    */
  def cubeViewSelect(events: DataFrame, picks: Int = 3): DataFrame = {
    val spark = events.sparkSession
    val base = events.select(
      col("user_id"),
      col("event_type"),
      col("ts").cast("date").as("day"))
    // one pass: rows per grouping_id = the view's distinct group count
    // (gid bit = 1 means the dim is aggregated away, so m = 7 - gid)
    val sizes = base
      .cube(col("user_id"), col("event_type"), col("day"))
      .agg(grouping_id().as("gid"))
      .groupBy(col("gid"))
      .agg(count(lit(1)).as("sz"))
      .select((lit(7L) - col("gid")).as("m"), col("sz"))
    val szm: Map[Long, Long] =
      sizes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def name(m: Long): String =
      if (m == 0L) "()"
      else Seq(4L -> "u", 2L -> "t", 1L -> "d").collect {
        case (b, c) if (m & b) > 0 => c
      }.mkString
    var sel = Set(7L)
    val trace = (1 to picks).map { r =>
      val cost: Map[Long, Long] =
        (0L to 7L).map(w => w -> sel.filter(v => (w & v) == w).map(szm).min).toMap
      val best = (0L to 7L)
        .filterNot(sel)
        .map { v =>
          val ben = (0L to 7L)
            .filter(w => (w & v) == w)
            .map(w => math.max(0L, cost(w) - szm(v)))
            .sum
          (v, szm(v), ben)
        }
        .minBy { case (v, s, b) => (-b, s, v) }
      sel += best._1
      (r.toLong, name(best._1), best._2, best._3)
    }
    import spark.implicits._
    trace.toDF("round", "view_name", "view_rows", "benefit")
  }

  /** [[cubeViewSelect]] mirrored: per-view distinct-count branches for
    * the sizes (the oracle's independent form of the cube pass) and the
    * greedy unrolled one CTE chain per round over the 8-row lattice.
    */
  def cubeViewSelectSql(picks: Int = 3): String = {
    def branch(m: Int): String = {
      val dims = Seq(4 -> "user_id", 2 -> "event_type", 1 -> "day").collect {
        case (b, d) if (m & b) > 0 => d
      }
      if (dims.nonEmpty)
        s"SELECT $m AS m, CAST(count(*) AS BIGINT) AS sz" +
          s" FROM (SELECT DISTINCT ${dims.mkString(", ")} FROM base)"
      else "SELECT 0 AS m, CAST(1 AS BIGINT) AS sz"
    }
    def round(r: Int): String =
      s"""cost$r AS (
         |  SELECT w.m AS wm, min(s.sz) AS c
         |  FROM sizes w JOIN sizes s ON (w.m & s.m) = w.m AND s.m IN (SELECT m FROM sel${r - 1})
         |  GROUP BY w.m),
         |ben$r AS (
         |  SELECT v.m, v.sz,
         |         CAST(sum(CASE WHEN c.c > v.sz THEN c.c - v.sz ELSE 0 END) AS BIGINT) AS benefit
         |  FROM sizes v JOIN cost$r c ON (c.wm & v.m) = c.wm
         |  WHERE v.m NOT IN (SELECT m FROM sel${r - 1})
         |  GROUP BY v.m, v.sz),
         |pick$r AS (SELECT CAST($r AS BIGINT) AS round, m, sz, benefit FROM ben$r
         |           ORDER BY benefit DESC, sz ASC, m ASC LIMIT 1),
         |sel$r AS (SELECT m FROM sel${r - 1} UNION ALL SELECT m FROM pick$r)""".stripMargin
    val sizes = (0 until 8).map(branch).mkString("\nUNION ALL ")
    val rounds = (1 to picks).map(round).mkString(",\n")
    val pickUnion =
      (1 to picks).map(r => s"SELECT * FROM pick$r").mkString(" UNION ALL ")
    s"""WITH base AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
       |sizes AS MATERIALIZED ($sizes),
       |sel0 AS (SELECT 7 AS m),
       |$rounds,
       |picks AS ($pickUnion)
       |SELECT round,
       |       CASE WHEN m = 0 THEN '()' ELSE
       |         concat(CASE WHEN m & 4 > 0 THEN 'u' ELSE '' END,
       |                CASE WHEN m & 2 > 0 THEN 't' ELSE '' END,
       |                CASE WHEN m & 1 > 0 THEN 'd' ELSE '' END) END AS view_name,
       |       sz AS view_rows, benefit
       |FROM picks ORDER BY round""".stripMargin
  }

  // ---- column encoding advisor ----------------------------------------------

  /** Per-column encoding-advisor statistics in the table's write order
    * (l_orderkey, l_linenumber): run count and mean run length (what RLE
    * would buy), distinct count and its bit width (what dictionary
    * encoding would buy), and the max adjacent delta with its bit width
    * (what delta encoding would buy). This is the read a layout/compaction
    * planner does before choosing parquet encodings or a sort key — the
    * write-side sibling of [[zoneMapPruneReport]]'s read-side pruning
    * stats.
    *
    * Runs and deltas are measured WITHIN each l_orderkey group (the unit
    * the write order co-locates; cross-group boundaries are one run each,
    * counted by construction since `lag` restarts per group) — so the
    * windows are partitioned by the group key, never a global sort. The
    * categorical column enters as its 20-bit token code; bit widths are
    * `ceil(ln(x)/ln 2)` evaluated in the same fixed double form both
    * engines.
    *
    * Scale shape: ONE corpus scan fanned long-form (narrow in-row
    * explode), one partitioned window pass, one 5-group aggregate.
    *
    * Output: 5 rows `(col, n, n_distinct, dict_bits, n_runs,
    * avg_run_centi, max_delta, delta_bits)`.
    */
  def encodingStats(lineitem: DataFrame): DataFrame = {
    import graft.functions.Parity
    val base = lineitem.select(
      col("l_orderkey").cast("long").as("ok"),
      col("l_linenumber").cast("long").as("lno"),
      col("l_partkey").cast("long").as("pk"),
      col("l_quantity").cast("long").as("qty"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
      Parity.charFold(col("l_returnflag"), 31L, Parity.TokP).as("rf"))
    val longForm = base
      .select(
        col("ok"),
        col("lno"),
        explode(array(
          struct(lit("l_orderkey").as("c"), col("ok").as("v")),
          struct(lit("l_partkey").as("c"), col("pk").as("v")),
          struct(lit("l_quantity").as("c"), col("qty").as("v")),
          struct(lit("price_cents").as("c"), col("cents").as("v")),
          struct(lit("l_returnflag").as("c"), col("rf").as("v")))).as("s"))
      .select(col("ok"), col("lno"), col("s.c").as("c"), col("s.v").as("v"))
    // (ok, lno) is NOT unique in the testdata — the value itself breaks
    // the ordering tie (remaining ties are equal values, so lag/delta
    // results are order-invariant)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c"), col("ok"))
      .orderBy(col("lno"), col("v"))
    longForm
      .withColumn("prev", lag(col("v"), 1).over(w))
      .groupBy(col("c").as("col"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("v")).as("n_distinct"),
        sum(when(col("prev").isNull || col("v") =!= col("prev"), 1L).otherwise(0L)).as("n_runs"),
        max(abs(col("v") - col("prev"))).as("max_delta"))
      .select(
        col("col"),
        col("n"),
        col("n_distinct"),
        expr("CAST(ceil(ln(CAST(n_distinct AS DOUBLE)) / ln(CAST(2 AS DOUBLE))) AS BIGINT)")
          .as("dict_bits"),
        col("n_runs"),
        expr("n * 100 div n_runs").as("avg_run_centi"),
        coalesce(col("max_delta"), lit(0L)).as("max_delta"),
        expr(
          "CAST(ceil(ln(CAST(coalesce(max_delta, 0) + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE))) AS BIGINT)")
          .as("delta_bits"))
  }

  /** [[encodingStats]] mirrored (long form as UNION ALL — same rows). */
  def encodingStatsSql(): String = {
    import graft.functions.Parity
    val rf = Parity.charFoldSql("l_returnflag", 31L, Parity.TokP)
    s"""WITH f AS (
       |  SELECT CAST(l_orderkey AS BIGINT) AS ok, CAST(l_linenumber AS BIGINT) AS lno,
       |         CAST(l_partkey AS BIGINT) AS pk, CAST(l_quantity AS BIGINT) AS qty,
       |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
       |         $rf AS rf
       |  FROM lineitem),
       |l AS (
       |  SELECT 'l_orderkey' AS c, ok, lno, ok AS v FROM f
       |  UNION ALL SELECT 'l_partkey', ok, lno, pk FROM f
       |  UNION ALL SELECT 'l_quantity', ok, lno, qty FROM f
       |  UNION ALL SELECT 'price_cents', ok, lno, cents FROM f
       |  UNION ALL SELECT 'l_returnflag', ok, lno, rf FROM f),
       |w AS (
       |  SELECT c, v, lag(v) OVER (PARTITION BY c, ok ORDER BY lno, v) AS prev FROM l),
       |a AS (
       |  SELECT c AS col, CAST(count(*) AS BIGINT) AS n,
       |         CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       |         CAST(sum(CASE WHEN prev IS NULL OR v <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
       |         CAST(max(abs(v - prev)) AS BIGINT) AS max_delta
       |  FROM w GROUP BY c)
       |SELECT col, n, n_distinct,
       |       CAST(ceil(ln(CAST(n_distinct AS DOUBLE)) / ln(CAST(2 AS DOUBLE))) AS BIGINT) AS dict_bits,
       |       n_runs, n * 100 // n_runs AS avg_run_centi,
       |       coalesce(max_delta, 0) AS max_delta,
       |       CAST(ceil(ln(CAST(coalesce(max_delta, 0) + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE))) AS BIGINT) AS delta_bits
       |FROM a""".stripMargin
  }
}
