package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Similarity

/** ScalaCheck properties for the fixed-point Lloyd k-means: the Spark
  * implementation must equal a straight-line driver-side reference on
  * random inputs — including empty-cell rounds and argmax ties, which
  * the harness fixture can't produce on demand.
  */
object KmeansProps extends Properties("kmeans") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val Dim = 4
  private val K = 3
  private val Iters = 2

  // Components are exact multiples of 1/8 in (−1, 1): scaling by 10⁶
  // lands on exact integers, so the round-to-micro-units step has no
  // half-way ambiguity to reimplement. Component 0 is kept strictly
  // positive so no vector (and no truncating-mean centroid) is ever
  // all-zero — a zero centroid would make the Spark-side score divide
  // by |c| = 0 while the driver reference yields NaN.
  private val genVecs: Gen[List[Array[Float]]] = for {
    n <- Gen.choose(K, 24)
    vecs <- Gen.listOfN(
      n,
      for {
        head <- Gen.choose(1, 7).map(_ / 8.0f)
        tail <- Gen.listOfN(Dim - 1, Gen.choose(-7, 7).map(_ / 8.0f))
      } yield (head :: tail).toArray)
  } yield vecs

  /** Driver-side reference: same init, same sequential-order dot,
    * same (score desc, cid asc) argmax, same truncating integer mean.
    */
  private def reference(vecs: Map[Long, Array[Long]]): Map[Long, Array[Long]] = {
    var cents: Map[Long, Array[Long]] = vecs.filter(_._1 < K)
    (1 to Iters).foreach { _ =>
      val assigned = vecs.toSeq.map { case (id, v) =>
        val best = cents.toSeq.map { case (cid, c) =>
          var dot = 0.0
          var i = 0
          while (i < Dim) { dot += v(i).toDouble * c(i).toDouble; i += 1 }
          var cc = 0.0
          i = 0
          while (i < Dim) { cc += c(i).toDouble * c(i).toDouble; i += 1 }
          (dot / math.sqrt(cc), cid)
        }.minBy { case (s, cid) => (-s, cid) }._2
        (best, v)
      }
      cents = assigned.groupBy(_._1).map { case (cid, vs) =>
        val n = vs.size
        cid -> Array.tabulate(Dim)(j => vs.map(_._2(j)).sum / n) // Long / truncates like `div`
      }
    }
    cents
  }

  property("kmeansFixed equals the driver-side reference") = forAll(genVecs) { vecs =>
    import spark.implicits._
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, "x") }
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.kmeansFixed(df, kCells = K, iters = Iters)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val ints = rows.map { case (id, v, _) =>
      id -> v.map(x => math.round(x.toDouble * Similarity.KmeansScale)).toArray
    }.toMap
    val want = reference(ints)
    Prop(got.keySet == want.keySet && got.keySet.forall(c => got(c).sameElements(want(c)))) :|
      s"got=${got.map { case (k, v) => k -> v.toSeq }} want=${want.map { case (k, v) => k -> v.toSeq }}"
  }
}
