package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV and JSON source/sink round-trips with explicit schemas — the
  * harness runs on parquet, but an engine user switching from the
  * reference's text-file world gets all three.
  */
class SourcesSpec extends SparkSpec {

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType),
    StructField("dst", LongType),
    StructField("w", DoubleType)))

  test("csv sink/source round-trips the edge table") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/edges"
    val edges = edgesDf(Seq((1L, 2L, 1.5), (2L, 3L, 2.0)))
    edges.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(edgeSchema).option("header", "true").csv(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set((1L, 2L, 1.5), (2L, 3L, 2.0)))
  }

  test("json sink/source round-trips the edge table") {
    val dir = Files.createTempDirectory("graft-json").toString + "/edges"
    val edges = edgesDf(Seq((1L, 2L, 1.5), (2L, 3L, 2.0)))
    edges.write.mode("overwrite").json(dir)
    val back = spark.read.schema(edgeSchema).json(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
      Set((1L, 2L, 1.5), (2L, 3L, 2.0)))
  }

  test("gzip json round-trip writes real .gz files and preserves content") {
    import spark.implicits._
    val df = Seq((1L, "en", "alpha beta"), (2L, "fr", "gamma")).toDF("doc_id", "lang", "text")
    val back = sources.TabularIO.gzipJsonRoundTrip(spark, df)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
      Set((1L, "en", "alpha beta"), (2L, "fr", "gamma")))
    // the staged files must actually be gzip-compressed
    val staged = back.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(staged.nonEmpty && staged.forall(_.endsWith(".gz")), s"not gzip: ${staged.toSeq}")
    sources.Staging.cleanup(spark)
  }

  test("schema-evolution read serves NULL for the added column on legacy files") {
    import spark.implicits._
    val df = Seq((1L, "A", 10.0), (2L, "B", 20.0), (5L, "A", 50.0))
      .toDF("k", "seg", "bal")
    val merged = sources.TabularIO.schemaEvolutionRead(spark, df, "bal", "k", splitAt = 3L)
    val got = merged.collect().map(r =>
      (r.getLong(r.fieldIndex("k")),
        if (r.isNullAt(r.fieldIndex("bal"))) None else Some(r.getDouble(r.fieldIndex("bal")))))
      .toSet
    assert(got === Set((1L, None), (2L, None), (5L, Some(50.0))))
    sources.Staging.cleanup(spark)
  }

  test("csv read pushes the filter and prunes columns") {
    val dir = Files.createTempDirectory("graft-csv2").toString + "/edges"
    edgesDf(Seq((1L, 2L, 1.5), (5L, 6L, 2.0))).write.mode("overwrite").csv(dir)
    val q = spark.read.schema(edgeSchema).csv(dir).filter(col("src") === 1L).select(col("dst"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(src), EqualTo(src,1)]"), plan.take(500))
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }
}
