package graft

import java.nio.file.Files

/** Bucketing: the co-located-join scale pattern. Two tables bucketed the
  * same way on the join key sort-merge-join with NO shuffle exchange —
  * at 100 TB this turns the nightly fact⋈fact join from a full-cluster
  * shuffle into a local merge per bucket.
  */
class BucketingSpec extends SparkSpec {

  test("equal-bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Seq("li_bkt_a", "li_bkt_b").foreach { name =>
      li.write
        .mode("overwrite")
        .option("path", s"$wh/$name")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(name)
    }
    try {
      val joined = spark
        .table("li_bkt_a")
        .join(spark.table("li_bkt_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt_a")
      spark.sql("DROP TABLE IF EXISTS li_bkt_b")
    }
  }
}
