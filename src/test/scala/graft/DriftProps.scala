package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{EventOps, Stats}

/** ScalaCheck properties for the round-10 monitoring/inference
  * operators: mathematical invariants that must hold on ARBITRARY
  * event streams — shapes the fixture corpus can't produce on demand
  * (single-event types, all-tied values, empty current windows after
  * the midpoint split). The oracle gate proves cross-engine equality;
  * these prove the statistics are the statistics.
  */
object DriftProps extends Properties("drift") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genEvents: Gen[List[(Long, Int, String, Double)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 5000L)
      min <- Gen.chooseNum(0, 200)
      tpe <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(0, 400).map(_ / 4.0)
    } yield (id, min, tpe, v)).map(_.distinctBy(_._1))

  private def toDf(rows: List[(Long, Int, String, Double)]) = {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    rows.map { case (id, min, tpe, v) =>
      (id, new java.sql.Timestamp(base.getTime + min * 60000L), id % 7, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  property("ks: d_ppm in [0, 1e6]; 0 when a window is empty is impossible (NULL)") =
    forAll(genEvents) { rows =>
      EventOps.ksDrift(toDf(rows)).collect().forall { r =>
        val (nr, nc) = (r.getLong(1), r.getLong(2))
        if (nr == 0 || nc == 0) r.isNullAt(3)
        else { val d = r.getLong(3); d >= 0L && d <= 1000000L }
      }
    }

  property("mwu: AUC in [0, 1e6]; doubled U bounded by 2·n1·n2") =
    forAll(genEvents) { rows =>
      EventOps.mwuDrift(toDf(rows)).collect().forall { r =>
        val (nr, nc, u2) = (r.getLong(1), r.getLong(2), r.getLong(3))
        if (nr == 0 || nc == 0) r.isNullAt(4)
        else {
          val auc = r.getLong(4)
          u2 >= 0L && u2 <= 2L * nr * nc && auc >= 0L && auc <= 1000000L
        }
      }
    }

  property("psi: non-negative (Laplace-smoothed, up to per-bin rounding slack)") =
    forAll(genEvents) { rows =>
      EventOps.psiDrift(toDf(rows)).collect().forall { r =>
        // each bin term is ≥ 0 analytically; integer micro-rounding can
        // shave at most ½ micro per bin
        r.getLong(4) >= -r.getLong(3)
      }
    }

  property("cusum: max_s ≥ 0; crossings > 0 iff max_s exceeds the threshold") =
    forAll(genEvents) { rows =>
      EventOps.cusumDrift(toDf(rows)).collect().forall { r =>
        val (maxS, nCross) = (r.getLong(3), r.getLong(4))
        maxS >= 0L && ((nCross > 0L) == (maxS > EventOps.CusumH)) &&
        ((nCross > 0L) == !r.isNullAt(5))
      }
    }

  property("seasonality: shares sum to ~1e6 per type; hours in [0, 24)") =
    forAll(genEvents) { rows =>
      val out = EventOps.seasonality(toDf(rows)).collect()
      val byType = out.groupBy(_.getString(0))
      out.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 24L) &&
      byType.values.forall { rs =>
        val s = rs.map(_.getLong(3)).sum
        // integer div floors each share: total within n_bins of 1e6
        s <= 1000000L && s >= 1000000L - rs.length
      }
    }

  property("type mix drift: TV in [0, 1e6]; chi2 non-negative; NULL on an empty window") =
    forAll(genEvents) { rows =>
      EventOps.typeMixDrift(toDf(rows)).collect().forall { r =>
        val (nr, nc, nTypes) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (nr == 0L || nc == 0L) r.isNullAt(3) && r.isNullAt(4)
        else {
          val (tv, chi2) = (r.getLong(3), r.getLong(4))
          tv >= 0L && tv <= 1000000L && chi2 >= -2L * nTypes
        }
      }
    }

  private val genBaskets: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      o <- Gen.chooseNum(1L, 30L)
      p <- Gen.chooseNum(1L, 12L)
    } yield (o, p))

  property("basket rules: confidences bounded, support ≤ either confidence, n_ab ≤ min(n)") =
    forAll(genBaskets) { rows =>
      import spark.implicits._
      val li = rows.zipWithIndex.map { case ((o, p), i) =>
        (o, p, 1L, i, 1.0, 1.0, 0.0, 0.0)
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      Stats.basketRules(li, minSup = 1L).collect().forall { r =>
        val (na, nb, nab) = (r.getLong(2), r.getLong(3), r.getLong(4))
        val (sup, cab, cba) = (r.getLong(5), r.getLong(6), r.getLong(7))
        nab <= math.min(na, nb) &&
        cab >= 0L && cab <= 1000000L && cba >= 0L && cba <= 1000000L &&
        sup <= cab && sup <= cba
      }
    }

  private val genPrices: Gen[List[(Long, Double)]] =
    Gen.nonEmptyListOf(for {
      pk <- Gen.chooseNum(1L, 40L)
      p <- Gen.chooseNum(1, 40000).map(_ / 100.0)
    } yield (pk, p))

  property("gini: in [0, 1e6); invariant under uniform price scaling by 2") =
    forAll(genPrices) { rows =>
      import spark.implicits._
      def df(scale: Double) = rows.zipWithIndex.map { case ((pk, p), i) =>
        (i.toLong, pk, 1L, 1, 1.0, p * scale, 0.0, 0.0)
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      val g1 = Stats.giniRevenue(df(1.0)).collect()(0).getLong(2)
      val g2 = Stats.giniRevenue(df(2.0)).collect()(0).getLong(2)
      g1 >= 0L && g1 < 1000000L && math.abs(g1 - g2) <= 1L
    }
}
