package graft

import org.apache.spark.sql.SparkSession

/** Scratch dev probe main — content changes as needed during profiling.
  * Current shape: time a named query at sf0.1 with reps, e.g.
  * `runMain graft.Probe sssp_lineitem 2`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "sssp_lineitem"
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { rep =>
      streaming.StreamOps.streamWorkMs.set(0L)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      spark.catalog.clearCache()
      val work = streaming.StreamOps.streamWorkMs.get()
      println(f"[probe] $name rep=$rep rows=$n sec=${(System.nanoTime() - t0) / 1e9}%6.2f" +
        (if (work > 0) s" work_ms=$work" else ""))
    }
    spark.stop()
  }
}
