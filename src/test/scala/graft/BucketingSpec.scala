package graft

/** Bucketing: the co-located-join scale pattern. Two tables bucketed the
  * same way on the join key sort-merge-join with NO shuffle exchange —
  * at 100 TB this turns the nightly fact⋈fact join from a full-cluster
  * shuffle into a local merge per bucket.
  *
  * The audits force the sort-merge path by disabling broadcast: at the
  * test scale both sides fit under the broadcast threshold and Spark
  * (correctly) broadcast-joins them, bypassing the bucketed scans — the
  * co-location contract only becomes observable in the regime it exists
  * for, where neither side is broadcastable.
  */
class BucketingSpec extends SparkSpec {

  private def withoutBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body
    finally spark.conf.set(key, prev)
  }

  test("equal-bucketed tables sort-merge-join without a shuffle exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = sources.TabularIO.bucketed(spark, li, "l_orderkey", nBuckets = 8)
    val b = sources.TabularIO.bucketed(spark, li, "l_orderkey", nBuckets = 8)
    try withoutBroadcast {
      val joined = a.join(b, "l_orderkey")
      assert(joined.count() > 0)
      // Spark renders shuffles as "Exchange hashpartitioning(...)" — the
      // rendered node name, not the planner class name, is what the plan
      // string contains, so this assertion can actually fail
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join in:\n$plan")
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"bucketed scan not used in:\n$plan")
    } finally sources.Staging.cleanup(spark)
  }

  test("the bucketed_join query itself plans shuffle-free up to the aggregation") {
    try withoutBroadcast {
      val df = SparkEntry.queries("bucketed_join")(spark, "/root/testdata/sf0.001")
      df.collect() // force AQE finalization
      // the AQE plan string repeats the tree ("Final Plan" + "Initial
      // Plan") — audit the executed Final Plan section only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join in:\n$plan")
      // the ONLY hash exchange allowed is the final groupBy(c_mktsegment)
      // aggregation — nothing feeding the join itself may shuffle
      val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 1, s"join side got shuffled ($exchanges exchanges) in:\n$plan")
    } finally sources.Staging.cleanup(spark)
  }
}
