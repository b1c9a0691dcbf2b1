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
    for {
      name <- Seq("sssp_lineitem", "connected_components", "sssp_layered", "dedup_clusters", "sssp_two_rounds")
      rep <- 1 to 2
    } {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      spark.catalog.clearCache()
      println(f"[probe] $name rep=$rep rows=$n sec=${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
