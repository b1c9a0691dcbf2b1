package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Packing

/** ScalaCheck properties for the sequence-packing pair: the Spark folds
  * must match a straight-line driver-side next-fit on random token-length
  * profiles, and both disciplines must respect their structural
  * invariants (conservation, the next-fit 2-competitive bound, the
  * concat-chunk zero-internal-pad identity) on shapes the fixture corpus
  * can't produce on demand (empty docs, oversize docs, exact-capacity
  * fits, single-doc shards).
  */
object PackingProps extends Properties("packing") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val cap = 16L

  // token lengths 0..24: includes empties, exact fits, and oversize
  private val genLens: Gen[List[Int]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 24)))

  private def docsOf(lens: Seq[Int]) = {
    import spark.implicits._
    lens.zipWithIndex.map { case (n, i) =>
      // doc_id multiples of NShards → one shard, list order = doc order
      (i.toLong * Packing.NShards, ("x " * n).trim, "en", "web", n.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Driver-side reference next-fit over the packable lengths. */
  private def nextFitRef(lens: Seq[Int]): (Long, Long) = {
    var fill = 0L; var bins = 0L; var waste = 0L
    lens.filter(n => n > 0 && n <= cap).foreach { n =>
      if (bins == 0L) { bins = 1L; fill = n.toLong }
      else if (fill + n <= cap) fill += n
      else { waste += cap - fill; bins += 1L; fill = n.toLong }
    }
    (bins, if (bins == 0L) 0L else waste + cap - fill)
  }

  property("packNextFit equals the driver-side fold and conserves tokens") =
    forAll(genLens) { lens =>
      val r = Packing.packNextFit(docsOf(lens), capacity = cap).collect().head
      val (bins, waste) = nextFitRef(lens)
      val packed = lens.filter(n => n > 0 && n <= cap).map(_.toLong).sum
      r.getAs[Long]("bins_used") == bins &&
      r.getAs[Long]("waste_tokens") == waste &&
      r.getAs[Long]("n_packed_tokens") == packed &&
      packed + waste == bins * cap &&
      r.getAs[Long]("n_oversize") == lens.count(_ > cap)
    }

  property("next-fit is 2-competitive: bins < 2·ceil(total/cap) + 1") =
    forAll(genLens) { lens =>
      val r = Packing.packNextFit(docsOf(lens), capacity = cap).collect().head
      val packed = lens.filter(n => n > 0 && n <= cap).map(_.toLong).sum
      val opt = (packed + cap - 1) / cap
      // adjacent next-fit bins sum > cap, so bins ≤ 2·total/cap + 1
      r.getAs[Long]("bins_used") <= 2 * opt + 1
    }

  property("seqPack: zero internal pad, cuts bounded, chunk count exact") =
    forAll(genLens) { lens =>
      val out = Packing.seqPack(docsOf(lens), capacity = cap).collect()
      val total = lens.filter(_ > 0).map(_.toLong).sum
      if (total == 0) out.isEmpty
      else {
        val r = out.head
        r.getAs[Long]("n_chunks") == (total + cap - 1) / cap &&
        r.getAs[Long]("tail_pad") == r.getAs[Long]("n_chunks") * cap - total &&
        r.getAs[Long]("tail_pad") < cap &&
        r.getAs[Long]("n_straddled") <= r.getAs[Long]("n_cuts") &&
        // each internal chunk boundary is crossed by at most ONE doc
        r.getAs[Long]("n_cuts") <= r.getAs[Long]("n_chunks") - 1
      }
    }
}
