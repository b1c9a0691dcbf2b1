package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Similarity

/** ScalaCheck properties for the SQ8 scalar quantizer: the Spark
  * train + encode + decomposed-dot serving path must equal a
  * straight-line driver-side reference on random inputs — including
  * degenerate (constant) dimensions, which encode to 0 and must be
  * reconstructed losslessly through the `dot(q, lo)` term.
  */
object SqProps extends Properties("sq8") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private val Dim = 4
  private val NQ = 2
  private val K = 3

  // exact multiples of 1/8: float → double casts are exact, so the
  // reference's double arithmetic is bit-identical to the engine's
  private val genVecs: Gen[List[Array[Float]]] = for {
    n <- Gen.choose(4, 14)
    vecs <- Gen.listOfN(n, Gen.listOfN(Dim, Gen.choose(-7, 7).map(_ / 8.0f)).map(_.toArray))
  } yield vecs

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def reference(vecs: Map[Long, Array[Double]]): Seq[(Long, Long, Double, Int)] = {
    val lo = Array.tabulate(Dim)(d => vecs.values.map(_(d)).min)
    val hi = Array.tabulate(Dim)(d => vecs.values.map(_(d)).max)
    def codes(v: Array[Double]): Array[Double] = Array.tabulate(Dim) { d =>
      val r = hi(d) - lo(d)
      if (r > 0.0) math.min(math.max(math.floor((v(d) - lo(d)) / r * 255.0), 0.0), 255.0)
      else 0.0
    }
    (0L until NQ.toLong).flatMap { qid =>
      val q = vecs(qid)
      val qlo = (0 until Dim).foldLeft(0.0)((acc, d) => acc + q(d) * lo(d))
      val qs = Array.tabulate(Dim)(d => q(d) * ((hi(d) - lo(d)) / 255.0))
      val scored = vecs.toSeq
        .filter(_._1 != qid)
        .map { case (nid, v) =>
          val c = codes(v)
          // the engine's order: qlo + (left-fold dot from 0.0) — NOT a
          // fused fold seeded with qlo (IEEE addition is not associative)
          val dot = (0 until Dim).foldLeft(0.0)((acc, d) => acc + qs(d) * c(d))
          (nid, round6(qlo + dot))
        }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(K)
      scored.zipWithIndex.map { case ((nid, s), i) => (qid, nid, s, i + 1) }
    }
  }

  property("stored-SQ serving equals the driver-side reference") = forAll(genVecs) { vecs =>
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = ids.toDF("vec_id", "embedding")
    val modelDir = Similarity.writeSqModel(spark, df)
    val got = Similarity
      .sqStoredTopK(spark, df, modelDir, nQueries = NQ, k = K)
      .orderBy(col("q_id"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val want = reference(ids.map { case (i, v) => i -> v.map(_.toDouble) }.toMap)
    val ok = got == want
    if (!ok) {
      println(s"got:  $got")
      println(s"want: $want")
    }
    graft.sources.Staging.cleanup(spark)
    ok
  }
}
