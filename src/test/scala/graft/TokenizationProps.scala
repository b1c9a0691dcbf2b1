package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Tokenization

/** The batched BPE trainer must be EXACTLY the sequential greedy loop —
  * that is the whole correctness claim of [[Tokenization.selectBatch]]
  * (and what lets the DuckDB oracle stay a sequential unrolling). This
  * property drives random small-alphabet corpora (small alphabets
  * maximize pair collisions, count ties, and symbol interactions — the
  * regimes where a wrong batch rule diverges) through the Spark trainer
  * and a direct driver-side sequential reference.
  */
object TokenizationProps extends Properties("tokenization") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  /** Driver-side sequential greedy BPE over the word histogram: one
    * merge per step, argmax by (count desc, left asc, right asc),
    * greedy leftmost non-overlapping application.
    */
  private def refBpe(words: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    def applyMerge(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: applyMerge(rest, l, r)
      case a :: rest => a :: applyMerge(rest, l, r)
      case Nil => Nil
    }
    var states: Seq[(List[String], Long)] = words
      .groupBy(identity)
      .map { case (w, ws) => (w.toList.map(_.toString), ws.size.toLong) }
      .toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.length < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      states.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((l, r, n))
        states = states.map { case (syms, f) => (applyMerge(syms, l, r), f) }
      }
    }
    out.toSeq
  }

  private val genWord: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))

  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, genWord))

  property("batched trainMerges equals the sequential greedy reference") =
    forAll(genCorpus, Gen.chooseNum(1, 6)) { (words, nMerges) =>
      import spark.implicits._
      val docs = Seq(words.mkString(" ")).toDF("text")
      val (got, rounds) = Tokenization.trainMerges(spark, docs, nMerges)
      val want = refBpe(words, nMerges)
      rounds <= math.max(want.length, 1) &&
      got.map(m => (m.left, m.right, m.count)) == want
    }
}
