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
    for {
      dir <- Seq("/root/testdata/sf0.01")
      k <- Seq(3, 4, 5)
    } {
      val t0 = System.nanoTime()
      val out = graft.operators.GraphOps.kCore(GraphSource.lineitemEdges(spark, dir), k = k)
      val alive = out.filter(col("in_core")).count()
      val total = out.count()
      println(f"[probe] kcore$k%d $dir alive=$alive total=$total sec=${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
