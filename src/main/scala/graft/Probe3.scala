package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch dev probe: phase-level timing of the r15 optimization
  * targets (ER blocking/closure, dedup candidate machinery, ANF exact
  * side) — where a whole-query wall time can't say which stage pays.
  */
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
    import operators.{Dedup, GraphOps, Phys}
    (1 to 2).foreach { rep =>
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[p3] rep=$rep $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        t0 = System.nanoTime()
      }
      val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      // er_blocked_pairs phases
      val pairs = Phys.materialized(
        Dedup.erBlockedPairs(customer).select(col("cust_a").as("src"), col("cust_b").as("dst")))
      lap("er-pairs")
      // unrolled star rounds for phase timing
      locally {
        def canon(p: DataFrame): DataFrame =
          p.filter(col("u") =!= col("v"))
            .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
            .distinct()
        def directed(e: DataFrame): DataFrame =
          e.select(col("a").as("u"), col("b").as("v"))
            .unionAll(e.select(col("b").as("u"), col("a").as("v")))
        def star(e: DataFrame, large: Boolean): DataFrame = {
          val d = directed(e)
          val m = d.groupBy(col("u")).agg(min(col("v")).as("mn"))
            .select(col("u"), least(col("mn"), col("u")).as("m"))
          val withM = d.join(m, Seq("u"))
          val hooked =
            (if (large) withM.filter(col("v") > col("u"))
             else withM.filter(col("v") <= col("u")))
              .select(col("v").as("u"), col("m").as("v"))
          canon(if (large) hooked else hooked.unionAll(m.select(col("u"), col("m").as("v"))))
        }
        var e = Phys.materialized(canon(pairs.select(col("src").as("u"), col("dst").as("v"))))
        lap("star-canon0")
        (1 to 4).foreach { r =>
          e = Phys.materialized(star(star(e, large = true), large = false))
          lap(s"star-round$r(${e.count()})")
        }
        val ex = e.exceptAll(e).isEmpty
        lap(s"star-exceptAll($ex)")
      }
      val comp = GraphOps
        .connectedComponentsStars(pairs)
        .select(col("id"), col("component"))
      val compM = Phys.materialized(comp)
      lap("er-cc-stars")
      val ent = Phys.materialized(
        customer
          .select(col("c_custkey").cast("long").as("id"))
          .join(compM, Seq("id"), "left_outer")
          .select(col("id"), coalesce(col("component"), col("id")).as("entity")))
      lap("er-ent")
      val sizes = ent.groupBy(col("entity")).agg(count(lit(1)).as("n_members"))
      val n = ent.join(sizes, Seq("entity")).count()
      lap(s"er-annotate($n)")
      // dedup candidate machinery phases
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val sigs = Phys.materialized(Dedup.minhashSignatures(docs))
      lap("mh-signatures")
      val candN = Dedup.minhashCandidates(docs).count()
      lap(s"mh-candidates($candN)")
      val verdictN = Dedup.verdict(docs).count()
      lap(s"verdict($verdictN)")
      // dedup_clusters_multimodal phases
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val p1 = Phys.materialized(Dedup.minhashCandidatePairs(docs))
      lap(s"mm-minhash-pairs(${p1.count()})")
      val p2 = Phys.materialized(
        operators.Multimodal.phashDedup(docs).select(col("a_id").as("doc_a"), col("b_id").as("doc_b")))
      lap(s"mm-phash-pairs(${p2.count()})")
      val cents = operators.Similarity.kmeansCached(embs, Dedup.SemanticCells, sfDir)
      lap(s"mm-sem-cents(${cents.count()})")
      locally {
        def cellScore(ei: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
          graft.functions.DotLongs(ei, c) / sqrt(graft.functions.DotLongs(c, c))
        val ie = Phys.materialized(embs.select(
          col("vec_id"),
          col("embedding").cast("array<double>").as("e"),
          graft.functions.MicroInts(col("embedding").cast("array<double>"), 1000000L).as("ei")))
        lap(s"sem-intemb(${ie.count()})")
        val crossed = ie
          .crossJoin(broadcast(cents))
          .select(col("vec_id"), col("e"), col("cid"), cellScore(col("ei"), col("c")).as("ccos"))
        lap(s"sem-cross(${crossed.count()})")
        val agg = crossed
          .groupBy(col("vec_id"))
          .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("sel"), first(col("e")).as("e"))
        lap(s"sem-agg(${agg.count()})")
      }
      val il = Phys.materialized(operators.Similarity.invertedLists(embs, cents))
      lap(s"mm-sem-lists(${il.count()})")
      val p3 = Phys.materialized(Dedup.semanticDedupPairs(embs, 0.4, sfDir))
      lap(s"mm-sem-pairs(${p3.count()})")
      val pu = Phys.materialized(p1.unionByName(p2).unionByName(p3).distinct())
      lap(s"mm-union(${pu.count()})")
      val cl = Dedup.clusters(docs, pu).count()
      lap(s"mm-clusters($cl)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      sources.Staging.cleanup(spark)
      System.gc()
    }
    spark.stop()
  }
}
