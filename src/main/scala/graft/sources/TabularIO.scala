package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** First-class CSV / JSON-lines source+sink support.
  *
  * The reference's only formats are text lines (SURVEY.md §2.2); these
  * are library extensions. Each round-trip stages a frame through the
  * format and reads it back with the frame's OWN schema — never schema
  * inference, which costs an extra full pass over the data at 100 TB
  * (and is why `spark.read.schema(...)` is the only form used here).
  * Reads stay declarative, so column pruning and filter pushdown reach
  * the scans exactly as with parquet.
  *
  * All staged directories and catalog tables go through [[Staging]]:
  * the harness reclaims them between queries instead of accumulating
  * one staged copy of the data per query per run.
  */
object TabularIO {

  /** Write `df` as headered CSV into a fresh directory, read it back
    * with the identical explicit schema. Doubles survive exactly: Spark
    * writes the shortest round-trippable decimal representation.
    */
  def csvRoundTrip(spark: SparkSession, df: DataFrame): DataFrame = {
    val dir = Staging.freshDir("csv")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    spark.read.schema(df.schema).option("header", "true").csv(dir)
  }

  /** Write `df` as JSON lines into a fresh directory, read it back with
    * the identical explicit schema.
    */
  def jsonRoundTrip(spark: SparkSession, df: DataFrame): DataFrame = {
    val dir = Staging.freshDir("json")
    df.write.mode("overwrite").json(dir)
    spark.read.schema(df.schema).json(dir)
  }

  /** Write `df` as ORC into a fresh directory, read it back with the
    * identical explicit schema. Columnar like parquet — column pruning
    * and predicate pushdown reach the scan — so the engine is
    * format-agnostic across the two big columnar container formats a
    * lake actually mixes.
    */
  def orcRoundTrip(spark: SparkSession, df: DataFrame): DataFrame = {
    val dir = Staging.freshDir("orc")
    df.write.mode("overwrite").orc(dir)
    spark.read.schema(df.schema).orc(dir)
  }

  /** Write `df` as GZIP-COMPRESSED JSON lines and read it back —
    * the shape a web-scale text corpus actually arrives in (WARC/WET
    * derivatives ship as .gz line files). Spark's text/JSON readers
    * decompress transparently by extension; the cost contract to know
    * is that gzip is NOT splittable — one file = one task — so at
    * 100 TB the corpus must arrive as MANY .gz files (it does: crawl
    * shards), and per-file parallelism is the file count.
    */
  def gzipJsonRoundTrip(spark: SparkSession, df: DataFrame): DataFrame = {
    val dir = Staging.freshDir("gzjson")
    df.write.mode("overwrite").option("compression", "gzip").json(dir)
    spark.read.schema(df.schema).json(dir)
  }

  /** Stage `df` as TWO parquet writes with EVOLVED schemas — the first
    * without `evolvedCol`, the second with it — and read them back
    * merged (`mergeSchema`): rows from the old files carry NULL for
    * the new column. The lakehouse schema-evolution contract: readers
    * must keep working across a column addition without rewriting old
    * files. `mergeSchema` costs a footer read per file at planning
    * time — fine for an explicit evolution read, not a default.
    */
  def schemaEvolutionRead(
      spark: SparkSession,
      df: DataFrame,
      evolvedCol: String,
      splitKey: String,
      splitAt: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dir = Staging.freshDir("evolve")
    df.filter(col(splitKey) < splitAt)
      .drop(evolvedCol)
      .write.mode("overwrite").parquet(s"$dir/v1")
    df.filter(col(splitKey) >= splitAt)
      .write.mode("overwrite").parquet(s"$dir/v2")
    spark.read.option("mergeSchema", "true").parquet(s"$dir/v1", s"$dir/v2")
  }

  /** Write `df` hive-partitioned on `partCol` into a fresh directory and
    * read it back. Downstream filters on the partition column prune at
    * the DIRECTORY level (PartitionFilters in the scan, asserted in
    * PlanAuditSpec) — at 100 TB the difference between listing a few
    * directories and scanning the corpus.
    */
  def partitionedRoundTrip(spark: SparkSession, df: DataFrame, partCol: String): DataFrame = {
    val dir = Staging.freshDir("part")
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)
    spark.read.parquet(dir)
  }

  /** Write `df` bucketed (+ sorted) on `key` into a fresh managed-table
    * path and return the catalog-backed bucketed relation. Two tables
    * bucketed the same way on their join keys sort-merge-join with NO
    * shuffle exchange — the co-location contract that turns a 100 TB
    * fact⋈fact join from a full-cluster shuffle into a local merge per
    * bucket. Table names are uniquified per call (verify + bench share
    * one session); the table + its path are reclaimed by the harness's
    * between-query [[Staging.cleanup]].
    */
  def bucketed(spark: SparkSession, df: DataFrame, key: String, nBuckets: Int): DataFrame = {
    val name = Staging.freshTable("graft_bkt")
    val dir = Staging.freshDir("bucketed")
    df.write
      .mode("overwrite")
      .option("path", s"$dir/$name")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(name)
    spark.table(name)
  }
}
