package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev probe main — content changes as needed during profiling. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Parity
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"[probe] $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }

    val sh = docs.select(col("doc_id"), col("lang"),
      Parity.shingles(Parity.tokens(col("text"))).as("sh"))
    time("sh materialize")(sh.count())
    val inv = sh.select(col("doc_id"), col("lang"), explode(col("sh")).as("g"))
    time("inv explode")(inv.count())
    val a = inv.alias("a"); val b = inv.alias("b")
    val joined = a.join(b,
      col("a.lang") === col("b.lang") && col("a.g") === col("b.g") &&
        col("a.doc_id") < col("b.doc_id"))
    time("bucket join")(joined.count())
    val inter = joined.groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("inter agg")(inter.count())
    spark.stop()
  }
}
