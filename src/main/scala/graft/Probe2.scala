package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object Probe2 {
  def main(args: Array[String]): Unit = {
    // same data-dir contract as Bench: a standalone re-run at another
    // scale factor must probe the dataset the bench actually measured
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var stages = List.empty[(Int, String, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val gc = si.taskMetrics.jvmGCTime
        val cpu = si.taskMetrics.executorCpuTime / 1000000L
        stages = (si.stageId, si.name.takeWhile(_ != '\n').take(60), dur, cpu, gc) :: stages
      }
    })
    args.foreach { name =>
      stages = Nil
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(f"[probe2] $name rows=$n sec=$dt%6.2f")
      Thread.sleep(300)
      stages.sortBy(-_._3).take(6).foreach { case (id, nm, dur, cpu, gc) =>
        println(f"[stage] id=$id wall=${dur}ms cpu=${cpu}ms gc=${gc}ms  $nm")
      }
    }
    spark.stop()
  }
}
