package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core data model of the graft engine.
  *
  * The reference (`/root/reference/src/comp9313/ass4/SingleSourceSP.java`,
  * `ReverseGraph.java`) models a weighted directed graph as schemaless text
  * lines (`SingleSourceSP.java:140-145`). Here the graph is a first-class
  * columnar Dataset: `Edge(src, dst, w)` / `NodeState(id, dist, updated)`.
  * The pipe/colon/comma string encodings of the reference disappear; Spark
  * StructType + Tungsten rows replace them.
  */
object model {

  /** "Not yet reached" sentinel — the reference uses the literal double
    * 65535.0 (`SingleSourceSP.java:54`), not null/∞, and emits it for
    * unreachable nodes that have out-edges (SURVEY.md Q1). Preserved
    * exactly for output parity; 65535.0 round-trips exactly in binary.
    */
  val INF: Double = 65535.0

  /** One weighted directed edge (`SingleSourceSP.java:64-66`). */
  final case class Edge(src: Long, dst: Long, w: Double)

  /** Per-node iteration state (`SingleSourceSP.java:146-179`), minus the
    * adjacency list: in Spark the edge table is a persisted side input of
    * the SSSP loop, not baggage carried through every shuffle round.
    */
  final case class NodeState(id: Long, dist: Double, updated: Boolean)

  /** Read one of the driver's parquet tables. Column pruning + predicate
    * pushdown reach the scan automatically because the read is declarative.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table with its timestamp normalized to Spark's
    * microsecond (timezone'd) TimestampType, whatever unit the parquet
    * carries — the driver's testdata has shipped BOTH across
    * generations:
    *
    *   - TIMESTAMP(NANOS): Spark 4 refuses it natively
    *     (PARQUET_TYPE_ILLEGAL); sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong=true`, the column
    *     arrives as nanos-since-epoch BIGINT, and this truncates
    *     (floor-divides) to microseconds — integer division, no double
    *     round-trip (ns values exceed 2^53).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *     TIMESTAMP_NTZ, cast to TimestampType — value-identical under
    *     the UTC session timezone every harness session pins, and the
    *     cast restores the type the downstream operators (second-unit
    *     double casts, interval arithmetic) are written against.
    */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}

/** Canonical graph derivations, shared verbatim (as SQL text) with the
  * DuckDB oracles so both sides compute over the identical edge list.
  * `/root/testdata` is TPC-H-ish parquet with no edge table (FIXTURES.md §2),
  * so graphs are derived deterministically from the relational tables.
  */
object GraphSource {
  import model._

  /** Primary (large, cyclic) graph: lineitem order→part references.
    * partkeys ≥ max(orderkey) have out-degree 0 → exercises the
    * sink-node-discovered-mid-iteration semantics (SURVEY.md Q4).
    */
  def lineitemEdges(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .select(
        col("l_orderkey").cast("long").as("src"),
        col("l_partkey").cast("long").as("dst"),
        col("l_quantity").cast("double").as("w"))

  /** SQL CTE body equivalent to [[lineitemEdges]] (DuckDB dialect). */
  val lineitemEdgesSql: String =
    "SELECT CAST(l_orderkey AS BIGINT) AS src, CAST(l_partkey AS BIGINT) AS dst, " +
      "CAST(l_quantity AS DOUBLE) AS w FROM lineitem"

  /** Small layered graph (customer→nation, nation→region; unit weights).
    * Mostly acyclic, tiny diameter — the recursive-CTE-oracle-friendly
    * topology for full iterative SSSP (FIXTURES.md §2).
    *
    * DELIBERATE id-namespace conflation: custkey 1, nationkey 1 and
    * regionkey 1 are the SAME node. That collision is what gives the
    * graph its back-edges (region ids feed back into low customer ids),
    * making it interestingly cyclic instead of a strict DAG; the oracle
    * CTE ([[layeredEdgesSql]]) conflates identically, so parity holds.
    * Not a bug — do not "fix" by offsetting key ranges.
    */
  def layeredEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val c = table(spark, sfDir, "customer")
      .select(
        col("c_custkey").cast("long").as("src"),
        col("c_nationkey").cast("long").as("dst"),
        lit(1.0).as("w"))
    val n = table(spark, sfDir, "nation")
      .select(
        col("n_nationkey").cast("long").as("src"),
        col("n_regionkey").cast("long").as("dst"),
        lit(1.0).as("w"))
    c.unionAll(n)
  }

  /** SQL CTE body equivalent to [[layeredEdges]] (DuckDB dialect). */
  val layeredEdgesSql: String =
    "SELECT CAST(c_custkey AS BIGINT) AS src, CAST(c_nationkey AS BIGINT) AS dst, CAST(1.0 AS DOUBLE) AS w FROM customer " +
      "UNION ALL SELECT CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT), CAST(1.0 AS DOUBLE) FROM nation"
}
