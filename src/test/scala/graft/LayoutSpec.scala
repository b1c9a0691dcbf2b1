package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Driver-side reference Morton code. */
  private def zRef(x: Long, y: Long): Long =
    (0 until Layout.ZBits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zvalue equals the driver-side bit-interleave reference") {
    import spark.implicits._
    val pts = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L),
      (1L << 15, 1L), (43210L, 1L)) ++
      (0 until 50).map(i => ((i * 2654435761L) & 65535L, (i * 40503L) & 65535L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach(r => assert(r.getLong(2) === zRef(r.getLong(0), r.getLong(1)),
      s"zvalue(${r.getLong(0)}, ${r.getLong(1)})"))
  }

  test("z-order layout gives compact per-file bounding boxes; a plain layout doesn't") {
    val mask = (1L << Layout.ZBits) - 1
    val keyed = model.table(spark, dir, "lineitem")
      .select(
        col("l_orderkey").bitwiseAND(lit(mask)).as("x"),
        col("l_partkey").bitwiseAND(lit(mask)).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder-test").toString
    val plainDir = java.nio.file.Files.createTempDirectory("graft-plain-test").toString
    try {
      Layout.zorderWrite(keyed, "x", "y", nFiles = 8, dir = zDir)
      keyed.repartition(8).write.mode("overwrite").parquet(plainDir)

      // per-file bounding-box area, summed — the quantity a min-max
      // file-skipping scan actually depends on
      def boxArea(d: String): Double =
        spark.read.parquet(d)
          .groupBy(input_file_name().as("f"))
          .agg(((max(col("x")) - min(col("x"))).cast("double") *
            (max(col("y")) - min(col("y"))).cast("double")).as("area"))
          .agg(sum(col("area")))
          .head().getDouble(0)

      val (zArea, plainArea) = (boxArea(zDir), boxArea(plainDir))
      // hash-round-robin files each span ~the full key plane; Z-ranges
      // cover compact tiles. 4× is a loose bound (measured ~10×+).
      assert(zArea * 4 < plainArea, s"z=$zArea plain=$plainArea")

      // the Hilbert layout is at least as compact as Z (jump-free
      // ranges; small slack for range-boundary sampling noise)
      val hDir = java.nio.file.Files.createTempDirectory("graft-hilbert-test").toString
      try {
        Layout.hilbertWrite(keyed, "x", "y", nFiles = 8, dir = hDir)
        val hArea = boxArea(hDir)
        assert(hArea < zArea * 1.25, s"hilbert=$hArea z=$zArea")
        assert(hArea * 4 < plainArea, s"hilbert=$hArea plain=$plainArea")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(hDir))

      // and the box predicate reaches the staged scan as pushed filters
      val q = spark.read.parquet(zDir)
        .filter(col("x").between(1000, 9000) && col("y").between(2000, 12000))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(x,1000"), plan)
    } finally Seq(zDir, plainDir).foreach { d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    }
  }

  test("zorderBoxAgg equals the box aggregate over the original table") {
    val got = Layout.zorderBoxAgg(spark, dir).head()
    val mask = (1L << Layout.ZBits) - 1
    val want = model.table(spark, dir, "lineitem")
      .select(
        col("l_orderkey").bitwiseAND(lit(mask)).as("x"),
        col("l_partkey").bitwiseAND(lit(mask)).as("y"),
        col("l_quantity"))
      .filter(col("x").between(1000, 9000) && col("y").between(2000, 12000))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .head()
    assert(got === want)
    graft.sources.Staging.cleanup(spark)
  }

  test("compactionPlan: next-fit bins by running size, bytes conserved, files ordered") {
    import spark.implicits._
    // one source, file sizes (by docs-per-file groups of 10):
    // docs 0..9 -> file 0 (10k), 10..19 -> file 1 (10k), 20..29 -> file 2 (10k)
    // target 16384: file0 cum_before 0 -> bin 0; file1 cum_before 10k -> bin 0;
    // file2 cum_before 20k -> bin 1
    val docs = (0L until 30L).map(i => (i, "s0", 1000L)).toDF("doc_id", "source", "n_chars")
    val out = Layout
      .compactionPlan(docs)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1)
    assert(out === Seq((0L, 2L, 20000L), (1L, 1L, 10000L)))
    // bytes conserved
    assert(out.map(_._3).sum === 30000L)
  }

  test("zoneMapPruneReport invariants: scan superset of match; z-order prunes both slices") {
    // sf0.01: the smallest scale where BOTH keys wrap the full 10-bit
    // report domain (sf0.001 partkeys stop at 199, so the y probes
    // would match nothing and every layout would trivially prune all)
    val li = graft.model.table(spark, "/root/testdata/sf0.01", "lineitem")
    val rows = Layout.zoneMapPruneReport(li).collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      val (zt, zs) = (r.getAs[Long]("zones_total"), r.getAs[Long]("zones_scanned"))
      assert(zs <= zt)
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
    }
    // rows_matched is layout-independent per probe
    val byProbe = rows.groupBy(_.getAs[String]("probe"))
    byProbe.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rows_matched")).toSet.size === 1)
    }
    // the 1-D x-sorted layout cannot prune the y-only slice (y is
    // uniform within every x chunk); z-order must prune some of it
    val m = rows.map(r => (r.getAs[String]("layout"), r.getAs[String]("probe")) -> r).toMap
    val oy = m(("orderkey_sorted", "slice_y"))
    assert(oy.getAs[Long]("zones_scanned") === oy.getAs[Long]("zones_total"))
    val zy = m(("zorder", "slice_y"))
    assert(zy.getAs[Long]("zones_scanned") < zy.getAs[Long]("zones_total"))
    // hilbert, like z, prunes both 1-D slices
    val hy = m(("hilbert", "slice_y"))
    assert(hy.getAs[Long]("zones_scanned") < hy.getAs[Long]("zones_total"))
    val hx = m(("hilbert", "slice_x"))
    assert(hx.getAs[Long]("zones_scanned") < hx.getAs[Long]("zones_total"))
  }

  test("HilbertIndex: bijective, jump-free, and matches the rotation-loop reference") {
    import spark.implicits._
    // exhaustive at bits=3: the 64 indexes are a permutation of 0..63
    // and every consecutive pair of indexes is 4-adjacent in the plane
    // (the locality property the Z curve lacks at quadrant seams)
    val pts = for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), graft.functions.HilbertIndex(col("x"), col("y"), 3).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq === (0L until 64L))
    val byD = got.sortBy(_._3)
    byD.zip(byD.tail).foreach { case ((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
    }
    // the first quadrant-order corner cases at bits=1
    val one = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .toDF("x", "y")
      .select(graft.functions.HilbertIndex(col("x"), col("y"), 1))
      .collect()
      .map(_.getLong(0))
    assert(one.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("cubeViewSelect reproduces the hand-run HRU greedy on a planted lattice") {
    import spark.implicits._
    // 2 users x 2 types x 1 day, all combos: sizes utd=4, ut=4, ud=2,
    // td=2, u=2, t=2, d=1, ()=1. Hand-run greedy (benefit desc, size
    // asc, mask asc): round 1 ties ud/td at benefit 8 -> td (mask 3);
    // round 2 -> ud (benefit 4); round 3 -> d (benefit 2).
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, ts, 1L, "a", 0.0, "{}"),
      (2L, ts, 1L, "b", 0.0, "{}"),
      (3L, ts, 2L, "a", 0.0, "{}"),
      (4L, ts, 2L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Layout
      .cubeViewSelect(ev)
      .orderBy(col("round"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, "td", 2L, 8L), (2L, "ud", 2L, 4L), (3L, "d", 1L, 2L)))
  }
}
