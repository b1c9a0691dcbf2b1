package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators.GraphOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator of the engine is exposed as a named
  * `(SparkSession, sfDir) => DataFrame` query with an equivalent DuckDB
  * SQL oracle over the same parquet tables. Column names are aliased
  * identically on both sides (the driver's compare sorts columns by name
  * before hashing); row order is made deterministic with an explicit
  * final sort on both sides.
  *
  * Operator coverage map (SURVEY.md §2.1 → query name):
  *   S1/S3 scan+sink ......... every query (parquet in, parquet out)
  *   P1 edge parse ........... edge_parse (text round-trip)
  *   P3+A3+X1 reverse graph .. reverse_graph
  *   A1 adjacency build ...... build_adjacency
  *   F2+M1+A2 one relax round  sssp_one_round
  *   C1+A4+C2 full SSSP ...... sssp_layered (oracle), sssp_lineitem (rows-only)
  *   F1 header filter ........ edge_parse
  *   joins/aggs/sort/limit ... q1_agg, join_revenue, topk_orders
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    GraphOps.finalResult(
      GraphOps.sssp(GraphSource.layeredEdges(spark, sfDir), source = 1L),
      source = 1L)
  }

  // ---- graph surface ------------------------------------------------------

  private def reverseGraph(s: SparkSession, dir: String): DataFrame =
    GraphOps.reverseGraph(GraphSource.lineitemEdges(s, dir)).orderBy(col("node"))

  private def buildAdjacency(s: SparkSession, dir: String): DataFrame =
    GraphOps.buildAdjacency(GraphSource.lineitemEdges(s, dir), source = 1L)
      .orderBy(col("node"))

  private def ssspOneRound(s: SparkSession, dir: String): DataFrame = {
    val e = GraphSource.lineitemEdges(s, dir)
    GraphOps.ssspRound(GraphOps.seedState(e, 1L), e)
      .select(col("id"), col("dist"))
      .orderBy(col("id"))
  }

  private def ssspLayered(s: SparkSession, dir: String): DataFrame =
    GraphOps.finalResult(GraphOps.sssp(GraphSource.layeredEdges(s, dir), 1L), 1L)
      .orderBy(col("id"))

  private def ssspLineitem(s: SparkSession, dir: String): DataFrame =
    GraphOps.finalResult(GraphOps.sssp(GraphSource.lineitemEdges(s, dir), 1L), 1L)
      .orderBy(col("id"))

  private def edgeParse(s: SparkSession, dir: String): DataFrame = {
    // Round-trip the lineitem graph through the reference's text edge
    // format `"id from to w"` (SingleSourceSP.java:140-145), with a
    // non-digit header line prepended semantics exercised by the rlike
    // filter in parseEdgeLines.
    val li = table(s, dir, "lineitem")
    val lines = li.select(
      concat_ws(" ",
        col("l_linenumber").cast("string"),
        col("l_orderkey").cast("string"),
        col("l_partkey").cast("string"),
        col("l_quantity").cast("double").cast("string")).as("line"))
    GraphOps.parseEdgeLines(lines, col("line"))
      .orderBy(col("src"), col("dst"), col("w"))
  }

  // ---- relational surface (scan/filter/join/agg/sort/limit) ---------------

  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private def joinRevenue(s: SparkSession, dir: String): DataFrame = {
    val orders = table(s, dir, "orders")
    val customer = table(s, dir, "customer")
    val nation = table(s, dir, "nation")
    val region = table(s, dir, "region")
    // Dims are small at any scale → broadcast; the orders⋈customer join is
    // the only shuffle, on the customer key.
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private def topkOrders(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "reverse_graph" -> (reverseGraph _),
    "build_adjacency" -> (buildAdjacency _),
    "sssp_one_round" -> (ssspOneRound _),
    "sssp_layered" -> (ssspLayered _),
    "sssp_lineitem" -> (ssspLineitem _),
    "edge_parse" -> (edgeParse _),
    "q1_agg" -> (q1Agg _),
    "join_revenue" -> (joinRevenue _),
    "topk_orders" -> (topkOrders _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "reverse_graph" ->
      s"""WITH edges AS (${GraphSource.lineitemEdgesSql})
         |SELECT dst AS node, string_agg(src, ',' ORDER BY src) AS adj
         |FROM edges GROUP BY dst ORDER BY node""".stripMargin,
    "build_adjacency" ->
      s"""WITH edges AS (${GraphSource.lineitemEdgesSql})
         |SELECT src AS node,
         |       string_agg(dst || ':' || w, ',' ORDER BY dst, w) AS adj,
         |       CASE WHEN src = 1 THEN 0.0 ELSE 65535.0 END AS dist,
         |       TRUE AS updated
         |FROM edges GROUP BY src ORDER BY node""".stripMargin,
    "sssp_one_round" ->
      s"""WITH edges AS (${GraphSource.lineitemEdgesSql}),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |best AS (SELECT dst AS id, min(0.0 + w) AS best FROM edges WHERE src = 1 GROUP BY dst)
         |SELECT coalesce(n.id, b.id) AS id,
         |       least(CASE WHEN coalesce(n.id, b.id) = 1 THEN 0.0 ELSE 65535.0 END,
         |             coalesce(b.best, 65535.0)) AS dist
         |FROM nodes n FULL OUTER JOIN best b ON n.id = b.id
         |ORDER BY id""".stripMargin,
    "sssp_layered" ->
      s"""WITH RECURSIVE edges AS (${GraphSource.layeredEdgesSql}),
         |reach(id, dist) AS (
         |  SELECT CAST(1 AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS dist
         |  UNION
         |  SELECT e.dst, r.dist + e.w FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.dist < 32.0
         |),
         |best AS (SELECT id, min(dist) AS dist FROM reach GROUP BY id),
         |nodes AS (SELECT DISTINCT src AS id FROM edges)
         |SELECT CAST(1 AS BIGINT) AS source, coalesce(n.id, b.id) AS id,
         |       coalesce(b.dist, 65535.0) AS dist
         |FROM nodes n FULL OUTER JOIN best b ON n.id = b.id
         |ORDER BY id""".stripMargin,
    "edge_parse" ->
      """WITH lines AS (
        |  SELECT l_linenumber::VARCHAR || ' ' || l_orderkey::VARCHAR || ' ' ||
        |         l_partkey::VARCHAR || ' ' || CAST(l_quantity AS DOUBLE)::VARCHAR AS line
        |  FROM lineitem)
        |SELECT CAST(string_split(trim(line), ' ')[2] AS BIGINT) AS src,
        |       CAST(string_split(trim(line), ' ')[3] AS BIGINT) AS dst,
        |       CAST(string_split(trim(line), ' ')[4] AS DOUBLE) AS w
        |FROM lines WHERE regexp_matches(line, '^[0-9]')
        |ORDER BY src, dst, w""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_revenue" ->
      """SELECT r_name, n_name,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  )
}
