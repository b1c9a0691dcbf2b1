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

  test("csv read pushes the filter and prunes columns") {
    val dir = Files.createTempDirectory("graft-csv2").toString + "/edges"
    edgesDf(Seq((1L, 2L, 1.5), (5L, 6L, 2.0))).write.mode("overwrite").csv(dir)
    val q = spark.read.schema(edgeSchema).csv(dir).filter(col("src") === 1L).select(col("dst"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(src), EqualTo(src,1)]"), plan.take(500))
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }
}
