package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import org.apache.spark.sql.functions._

import graft.operators.{Layout, Snapshot, TextOps}

/** ScalaCheck properties for the round-5 pipeline operators: each Spark
  * implementation must equal a straight-line driver-side reference on
  * random inputs — shapes the fixture corpus can't produce on demand
  * (odd lengths straddling chunk boundaries, duplicate versions, key
  * planes with shared bit patterns).
  */
object PipelineProps extends Properties("pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  // ---- chunk ---------------------------------------------------------

  private val genText: Gen[String] =
    Gen.chooseNum(0, 700).flatMap(n => Gen.stringOfN(n, Gen.oneOf(('a' to 'e') :+ ' ')))

  /** Driver-side reference: windows of `size` every `stride`, one chunk
    * minimum, last chunk short.
    */
  private def chunkRef(text: String, size: Int, stride: Int): Seq[(Long, String)] = {
    val n = math.max(text.length - 1, 0) / stride
    (0 to n).map(i => (i.toLong, text.slice(i * stride, i * stride + size)))
  }

  property("chunk equals the driver-side windowing") = forAll(
    Gen.listOfN(6, genText)) { texts =>
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps
      .chunk(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      chunkRef(t, TextOps.ChunkSize, TextOps.ChunkStride).map { case (ci, c) =>
        (i.toLong, ci) -> c
      }
    }.toMap
    got == want
  }

  // ---- upsert --------------------------------------------------------

  private val genRows: Gen[List[(Long, String, Long)]] =
    Gen.listOf(for {
      k <- Gen.chooseNum(0L, 6L)
      v <- Gen.stringOfN(3, Gen.alphaLowerChar)
      ver <- Gen.chooseNum(1L, 5L)
    } yield (k, v, ver))

  property("upsert equals the driver-side latest-wins merge") = forAll(
    genRows,
    genRows) { (base, upd) =>
    import spark.implicits._
    // dedupe versions per key so the winner is unique (the operator's
    // documented contract: callers own version uniqueness)
    val all = (base ++ upd).groupBy(r => (r._1, r._3)).values.map(_.head).toList
    (all.nonEmpty) ==> {
      val half = all.splitAt(all.length / 2)
      val b = half._1.toDF("k", "v", "version")
      val u = half._2.toDF("k", "v", "version")
      val got = Snapshot
        .upsert(b, u, "k", "version")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      val want = all.groupBy(_._1).map { case (k, rows) =>
        val w = rows.maxBy(_._3)
        k -> ((w._2, w._3))
      }
      got == want
    }
  }

  // ---- zvalue --------------------------------------------------------

  private def zRef(x: Long, y: Long): Long =
    (0 until Layout.ZBits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  property("zvalue equals the driver-side bit interleave") = forAll(
    Gen.listOfN(
      32,
      Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)))) { pts =>
    import spark.implicits._
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(col("x"), col("y")).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.forall { case (x, y) => got((x, y)) == zRef(x, y) }
  }

  // ---- shuffleShards -------------------------------------------------

  property("shuffleShards equals the driver-side permutation") = forAll(
    Gen.listOf(Gen.chooseNum(0L, 1000000L)).map(_.distinct),
    Gen.chooseNum(0L, 100L)) { (ids, seed) =>
    import spark.implicits._
    ids.nonEmpty ==> {
      val docs = ids.map(i => (i, s"d$i")).toDF("doc_id", "text")
      val got = TextOps
        .shuffleShards(docs, seed = seed)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      def k(id: Long) = ((id % 2147483648L) * 2654435761L + seed) % 1000000007L
      val want = ids
        .groupBy(id => k(id) % TextOps.NShards)
        .flatMap { case (shard, members) =>
          members.sortBy(id => (k(id), id)).zipWithIndex.map { case (id, pos) =>
            id -> ((shard, pos + 1L))
          }
        }
      got == want
    }
  }
}
