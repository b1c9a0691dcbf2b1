package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tables = Map(
    "lineitem" -> model.table(spark, dir, "lineitem"),
    "orders" -> model.table(spark, dir, "orders"),
    "part" -> model.table(spark, dir, "part"),
    "supplier" -> model.table(spark, dir, "supplier"),
    "customer" -> model.table(spark, dir, "customer"),
    "nation" -> model.table(spark, dir, "nation"),
    "region" -> model.table(spark, dir, "region"))

  test("referential audit covers all 7 edges and counts injected orphans") {
    val clean = Quality.referentialAudit(tables).collect()
    assert(clean.length === 7)
    assert(clean.forall(_.getAs[Long]("n_orphan") === 0L))
    // inject 3 dangling customer references into orders
    val orders = tables("orders")
    val orphaned = orders.unionByName(
      orders.limit(3).withColumn("o_custkey", lit(-999L)))
    val audited = Quality
      .referentialAudit(tables + ("orders" -> orphaned))
      .filter(col("rel") === "orders.o_custkey->customer")
      .head()
    assert(audited.getAs[Long]("n_orphan") === 3L)
    // ppm is the exact integer floor of the rate
    assert(
      audited.getAs[Long]("orphan_ppm") ===
        3L * 1000000L / audited.getAs[Long]("n_child"))
  }

  test("expectation suite: clean checks report 0, duplicated keys all count") {
    val rep = Quality
      .expectationsAudit(tables("orders"), tables("lineitem"))
      .collect()
      .map(r => r.getAs[String]("expectation") -> r.getAs[Long]("n_viol"))
      .toMap
    assert(rep.size === 10)
    assert(rep("orders.o_custkey_not_null") === 0L)
    assert(rep("orders.o_orderkey_unique") === 0L)
    // doubling the orders table makes EVERY row a uniqueness violation
    val doubled = tables("orders").unionByName(tables("orders"))
    val dup = Quality
      .expectationsAudit(doubled, tables("lineitem"))
      .filter(col("expectation") === "orders.o_orderkey_unique")
      .head()
    assert(dup.getAs[Long]("n_viol") === dup.getAs[Long]("n_checked"))
    assert(dup.getAs[Long]("viol_ppm") === 1000000L)
  }

  test("l-diversity: l never exceeds k, and a homogeneous group is flagged") {
    import spark.implicits._
    val rows = Quality.lDiversity(tables("customer"))
    assert(rows.filter(col("l") > col("k")).count() === 0)
    // a synthetic group where every member shares one segment → l=1, at_risk
    val homog = Seq(
      (99, 5000.0, "BUILDING"), (99, 5100.0, "BUILDING"), (99, 5200.0, "BUILDING"))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
    val r = Quality.lDiversity(homog).head()
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("l") === 1L)
    assert(r.getAs[Boolean]("at_risk"))
  }

  test("incremental maintenance equals the full rollup") {
    val docs = model.table(spark, dir, "documents")
    val full = docs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
      .collect()
    val maintained =
      Quality.aggIncremental(spark, docs).orderBy(col("source")).collect()
    assert(maintained.toSeq === full.toSeq)
  }

  test("tCloseness: a group mirroring the global mix scores 0; a homogeneous group scores high") {
    import spark.implicits._
    // global mix: 2 segments 50/50 (bal_band 0 everywhere).
    // nation 1 mirrors it exactly (tvd 0); nation 2 is all-A (tvd = 1/2 -> 500000)
    val cust = Seq(
      (1L, 0.0, "A"), (1L, 0.0, "B"), (1L, 0.0, "A"), (1L, 0.0, "B"),
      (2L, 0.0, "A"), (2L, 0.0, "A"), (2L, 0.0, "A"), (2L, 0.0, "A"))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
    val out = Quality
      .tCloseness(cust)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    // global: A=6/8, B=2/8. nation1: A=1/2,B=1/2 -> tvd = |1/2-3/4| = 1/4 -> 250000
    // nation2: A=1, B=0 -> tvd = 1/4 ... recompute: |1-3/4|/... = (|1-3/4|+|0-1/4|)/2 = 1/4
    assert(out(1L) === ((4L, 250000L, false)))
    assert(out(2L) === ((4L, 250000L, false)))
    // and an exact-mirror group: make the global 50/50 by using two nations
    val mirror = Seq(
      (1L, 0.0, "A"), (1L, 0.0, "B"),
      (2L, 0.0, "A"), (2L, 0.0, "B"))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
    val m = Quality.tCloseness(mirror).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m === Map(1L -> 0L, 2L -> 0L))
  }

  test("functionalDeps: true FDs report zero violations, broken ones count groups") {
    import spark.implicits._
    val out = Quality
      .functionalDeps(tables)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("orders.o_orderkey->o_custkey") === ((0L, 0L)))
    assert(out("nation.n_nationkey->n_regionkey") === ((0L, 0L)))
    // the plausible-but-false candidates must be detected as violated
    assert(out("lineitem.l_partkey->l_suppkey")._1 > 0L)
  }

  test("dpCounts: valid inverse-CDF table, bounded noise, clamped release") {
    val th = Quality.dpThresholds(eps = 1.0, b = 15)
    assert(th.length === 31)
    // strictly monotone CDF covering [0, 2^31) exactly
    th.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(a < b) }
    assert(th.last._2 === 2147483648L)
    // mode at zero: the widest CDF step is k = 0's
    val widths = th.map(_._2).zip(0L +: th.map(_._2).init).map { case (hi, lo) => hi - lo }
    assert(widths.zipWithIndex.maxBy(_._1)._2 === 15)
    val out = Quality.dpCounts(tables("customer")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, z, rel) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(z >= -15L && z <= 15L)
      assert(rel === math.max(0L, n + z))
    }
    // draws actually vary across groups (the LCG is keyed, not constant)
    assert(out.map(_.getLong(2)).distinct.length > 1)
  }
}
