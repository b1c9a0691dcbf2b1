package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.INF
import graft.operators.GraphOps

/** Text-format graph I/O in the reference's own record shapes.
  *
  * The reference's only formats (SURVEY.md §1.1):
  *   - edge lines `"id from to w"`, whitespace-separated, edge id ignored
  *     (`SingleSourceSP.java:64-66,140-145`); tab-separated `from\tto`
  *     unweighted variant (`ReverseGraph.java:120-124`);
  *   - node-state lines `"id\tdist|dst:w,dst:w|flag"` with flag ∈ {Y,N}
  *     (`SingleSourceSP.java:116-122,146-179`); the trailing-tab quirk of
  *     TextOutputFormat is tolerated on read (`:172-174` handles it with
  *     a whitespace split — here `trim` does);
  *   - result lines `"src\tid dist"` (`SingleSourceSP.java:285-287`).
  *
  * Everything is declarative column work over `spark.read.text` /
  * `df.write.text` — the scan parallelizes per file split exactly like
  * the reference's TextInputFormat, and the projection stays in codegen.
  */
object TextEdgeIO {

  /** Read reference-format edge lines (`id from to w`). */
  def readEdges(spark: SparkSession, path: String): DataFrame =
    GraphOps.parseEdgeLines(spark.read.text(path), col("value"))

  /** Read the unweighted tab-separated `from\tto` variant
    * (`ReverseGraph.java:120-124`), weight defaulted to 1.0.
    */
  def readUnweightedEdges(spark: SparkSession, path: String): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(path)
      .filter(col("value").rlike("^[0-9]"))
      .select(
        toks.getItem(0).cast("long").as("src"),
        toks.getItem(1).cast("long").as("dst"),
        lit(1.0).as("w"))
  }

  /** Write edges in the reference's `id from to w` line format — the
    * edge-id token is arbitrary and ignored on read
    * (`SingleSourceSP.java:64-66`; constant here). Doubles round-trip
    * exactly: Spark writes the shortest re-parseable decimal form.
    */
  def writeEdges(edges: DataFrame, path: String): Unit =
    edges
      .select(
        concat_ws(
          " ",
          lit("0"),
          col("src").cast("string"),
          col("dst").cast("string"),
          col("w").cast("string")).as("value"))
      .write
      .mode("overwrite")
      .text(path)

  /** Write edges in ReverseGraph's unweighted tab-separated `from\tto`
    * format (`ReverseGraph.java:120-124`); duplicate (parallel) edges
    * keep their duplicate lines (SURVEY.md Q3).
    */
  def writeUnweightedEdges(edges: DataFrame, path: String): Unit =
    edges
      .select(
        concat_ws("\t", col("src").cast("string"), col("dst").cast("string")).as("value"))
      .write
      .mode("overwrite")
      .text(path)

  /** Decode the adjacency CSV (`dst:w,dst:w,...`) of a node-state frame
    * back into the edge schema — the inverse of [[writeNodeState]]'s
    * encoding, so an SSSP run can resume from a staged node-state text
    * file exactly as the reference's iteration jobs do
    * (`SingleSourceSP.java:181-197` walks the same entries).
    */
  def adjacencyEdges(state: DataFrame): DataFrame =
    state
      .filter(length(col("adj")) > 0)
      .select(col("node").as("src"), explode(split(col("adj"), ",")).as("entry"))
      .select(
        col("src"),
        split(col("entry"), ":").getItem(0).cast("long").as("dst"),
        split(col("entry"), ":").getItem(1).cast("double").as("w"))

  /** Encode node state as the reference's text record
    * (`id\tdist|adj|flag`), adjacency entries `dst:w` comma-joined.
    */
  def writeNodeState(state: DataFrame, path: String): Unit =
    state
      .select(
        concat_ws(
          "\t",
          col("node").cast("string"),
          concat_ws(
            "|",
            col("dist").cast("string"),
            col("adj"),
            when(col("updated"), "Y").otherwise("N"))).as("value"))
      .write
      .mode("overwrite")
      .text(path)

  /** Decode the reference's node-state text record (P2,
    * `SingleSourceSP.java:146-179`): `id  dist|dst:w,...|flag`.
    */
  def readNodeState(spark: SparkSession, path: String): DataFrame = {
    val parts = split(trim(col("value")), "\\t")
    val fields = split(parts.getItem(1), "\\|")
    spark.read.text(path)
      .select(
        parts.getItem(0).cast("long").as("node"),
        coalesce(fields.getItem(1), lit("")).as("adj"),
        fields.getItem(0).cast("double").as("dist"),
        (fields.getItem(2) === "Y").as("updated"))
  }

  /** Write the final result in the reference's `src\tid dist` shape
    * (C2/S3, `SingleSourceSP.java:285-287`).
    */
  def writeResult(result: DataFrame, path: String): Unit =
    result
      .select(
        concat_ws(
          "\t",
          col("source").cast("string"),
          concat_ws(" ", col("id").cast("string"), col("dist").cast("string"))).as("value"))
      .write
      .mode("overwrite")
      .text(path)

  /** Write the transposed graph in ReverseGraph's `node\tsortedCsv`
    * output shape (`ReverseGraph.java:200`). Input is
    * [[graft.operators.GraphOps.reverseGraph]]'s (node, adj) frame.
    */
  def writeAdjacency(reversed: DataFrame, path: String): Unit =
    reversed
      .select(concat_ws("\t", col("node").cast("string"), col("adj")).as("value"))
      .write
      .mode("overwrite")
      .text(path)

  /** End-to-end reference pipeline from a text edge file: format pass
    * (buildAdjacency ≙ phase 1), iterate (sssp ≙ phase 2), final
    * projection — the whole `SingleSourceSP.main` as three lines.
    */
  def ssspFromFile(spark: SparkSession, path: String, source: Long): DataFrame = {
    val edges = readEdges(spark, path)
    GraphOps.finalResult(GraphOps.sssp(edges, source), source)
  }

}
