package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed session warmup: JIT, codegen compiler, parquet footer cache.
    // Not a per-query warmup — each query below still pays its own
    // first-execution cost; this only removes one-time JVM/session init
    // from whichever query happens to run first.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .groupBy("l_returnflag").count().count()
    // sorted for run-to-run comparability; ALL blocks freed between
    // queries — clearCache() alone misses localCheckpoint RDD blocks,
    // which otherwise accumulate across the 60-query session until the
    // storage pool forces spill/eviction and later queries pay for it
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a query that throws is recorded as -1 (NOT a wall time) and named
      // in "errors" — a broken query must never look like a fast pass
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      sources.Staging.cleanup(spark)
      (name, dt, ok)
    }
    // times rounded to ms: the driver tail-captures ~2 KB of output, and
    // full-precision doubles pushed the JSON head past the window
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val qs = results
      .map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) r3(v).toString else "-1") }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = r3(results.collect { case (_, v, true) => v }.sum)
    // ambient host load (1-min avg) at start AND end: this box is
    // shared, and load ≳ 5 from OTHER tenants inflates every wall time
    // 2×+ uniformly (measured 311 s vs 124 s for the identical build) —
    // recorded so a regressed-looking total can be told apart from a
    // contended run. The end sample includes this bench's own threads;
    // the start sample is the ambient baseline.
    val loadEnd = r3(loadAvg) // sampled once — both lines must agree
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","load_start":${r3(
          loadStart)},"load_end":$loadEnd,"errors":$errors,"queries":$qs}""")
    // the harness tail-captures ~2 KB of output and the full per-query
    // line now exceeds that (r3/r4 records were truncated mid-JSON) — a
    // final compact line without the per-query map always survives a
    // tail capture intact; the full line above remains the contract
    // distinct metric name so a by-metric scanner never double-counts
    // this with the full line above
    println(
      s"""{"metric":"total_compact","value":$total,"unit":"sec","sf":"$sfDir","load_start":${r3(
          loadStart)},"load_end":$loadEnd,"errors":$errors,"n_queries":${results.size}}""")
    spark.stop()
  }
}
