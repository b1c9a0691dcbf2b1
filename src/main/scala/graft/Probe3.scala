package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch dev probe: phase-level timing of the msf internals. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.GraphOps
    (1 to 2).foreach { rep =>
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[p3] rep=$rep $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        t0 = System.nanoTime()
      }
      def ckpt(df: DataFrame): DataFrame =
        org.apache.spark.sql.graftbridge.CheckpointBridge.dropOriginStats(df.localCheckpoint(true))
      val edges = GraphSource
        .layeredEdges(spark, sfDir)
        .select(
          col("src"),
          col("dst"),
          expr("(least(src, dst) * 7 + greatest(src, dst) * 13) % 101").as("wn"))
      var work = ckpt(
        edges
          .filter(col("src") =!= col("dst"))
          .select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"),
            col("wn"))
          .groupBy(col("a"), col("b"))
          .agg(min(col("wn")).as("wn"))
          .select(col("a").as("u"), col("b").as("v"), col("wn"), col("a"), col("b")))
      lap("init-ckpt")
      var done = false
      var round = 0
      while (!done && round < 20) {
        round += 1
        val n = work.count()
        lap(s"r$round-count($n)")
        if (n == 0) done = true
        else {
          val cand = work
            .select(col("u").as("c"), col("wn"), col("a"), col("b"), col("u"), col("v"))
            .unionAll(
              work.select(col("v").as("c"), col("wn"), col("a"), col("b"), col("u"), col("v")))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("c"))
            .orderBy(col("wn"), col("a"), col("b"))
          val chosen = ckpt(
            cand
              .withColumn("rn", row_number().over(w))
              .filter(col("rn") === 1)
              .select(col("a"), col("b"), col("wn"), col("u"), col("v"))
              .distinct())
          lap(s"r$round-chosen")
          val comp =
            GraphOps.connectedComponents(chosen.select(col("u").as("src"), col("v").as("dst")))
          val compC = ckpt(comp)
          lap(s"r$round-cc")
          val relabeled = work
            .join(compC.select(col("id").as("u"), col("component").as("nu")), Seq("u"), "left_outer")
            .join(compC.select(col("id").as("v"), col("component").as("nv")), Seq("v"), "left_outer")
            .select(
              coalesce(col("nu"), col("u")).as("u"),
              coalesce(col("nv"), col("v")).as("v"),
              col("wn"), col("a"), col("b"))
            .filter(col("u") =!= col("v"))
          work = ckpt(
            relabeled
              .select(
                least(col("u"), col("v")).as("u"),
                greatest(col("u"), col("v")).as("v"),
                struct(col("wn"), col("a"), col("b")).as("e"))
              .groupBy(col("u"), col("v"))
              .agg(min(col("e")).as("e"))
              .select(col("u"), col("v"), col("e.wn").as("wn"), col("e.a").as("a"), col("e.b").as("b")))
          lap(s"r$round-relabel")
        }
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
