package graft

import org.apache.spark.sql.SparkSession

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
    import graft.operators.GraphOps

    for {
      coalesce <- Seq("true", "false", "true", "false")
    } {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      val edges = GraphSource.lineitemEdges(spark, "/root/testdata/sf0.1")
      val t0 = System.nanoTime()
      val n = GraphOps.sssp(edges, 1L).count()
      println(s"[probe] coalesce=$coalesce rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
