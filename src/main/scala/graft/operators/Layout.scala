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
    df.withColumn("__z", zvalue(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
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
}
