package graft

import org.apache.spark.sql.Row
import graft.model.INF
import graft.operators.GraphOps

/** Unit tests for the reference graph surface on hand-computed micro-graphs,
  * including the reference's edge-case semantics (SURVEY.md Q1-Q5).
  */
class GraphOpsSpec extends SparkSpec {

  private def ssspMap(edges: Seq[(Long, Long, Double)], src: Long): Map[Long, Double] =
    GraphOps
      .sssp(edgesDf(edges), src)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

  test("densest peel: K6 core survives round 0, surfaces as the max-density round") {
    // K6 (15 edges, every degree 5) + 20 leaves hung off node 1: round 0
    // has avg degree 70/26 ≈ 2.7 → leaves (deg 1 ≤ 1.5·avg) die, K6
    // survives; round 1 is the bare K6 (density 15/6 = 2.5) and a regular
    // graph peels to empty (every degree equals the average)
    val k6 = for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b, 1.0)
    val leaves = (101L to 120L).map(l => (1L, l, 1.0))
    val prof = GraphOps
      .densestSubgraph(edgesDf(k6 ++ leaves))
      .orderBy(org.apache.spark.sql.functions.col("round"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(prof.length === 2)
    assert(prof(0) === ((0L, 26L, 35L, 35L * 1000000 / 26)))
    assert(prof(1) === ((1L, 6L, 15L, 2500000L)))
  }

  test("katz on a line graph: hand-computed milli-unit fixed point, sink included") {
    // 1→2→3: x0 = 1000 everywhere; x1(2) = x1(3) = 1000 + 1000/8 = 1125;
    // x2(3) = 1000 + 1125/8 = 1140; node 3 is a pure sink and still ranks
    val out = GraphOps
      .katzFixed(edgesDf(Seq((1L, 2L, 1.0), (2L, 3L, 1.0))))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out === Map(1L -> 1000L, 2L -> 1125L, 3L -> 1140L))
  }

  test("reverseGraph transposes and sorts adjacency ascending") {
    val out = GraphOps
      .reverseGraph(edgesDf(Seq((1L, 2L, 1.0), (3L, 2L, 1.0), (2L, 1L, 1.0), (10L, 2L, 1.0))))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    // numeric (not string) ascending order: 1,3,10
    assert(out === Map(2L -> "1,3,10", 1L -> "2"))
  }

  test("reverseGraph keeps parallel edges (Q3)") {
    val out = GraphOps
      .reverseGraph(edgesDf(Seq((1L, 2L, 1.0), (1L, 2L, 5.0), (3L, 2L, 1.0))))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out === Map(2L -> "1,1,3"))
  }

  test("buildAdjacency seeds source=0, others=INF, all updated (Q5)") {
    val rows = GraphOps
      .buildAdjacency(edgesDf(Seq((1L, 2L, 3.5), (1L, 3L, 1.0), (2L, 3L, 2.0))), source = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(rows === Seq((1L, "2:3.5,3:1.0", 0.0, true), (2L, "3:2.0", INF, true)))
  }

  test("sssp on a line graph") {
    val d = ssspMap(Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 3.0)), 1L)
    assert(d === Map(1L -> 0.0, 2L -> 1.0, 3L -> 3.0, 4L -> 6.0))
  }

  test("sssp picks shortest of multiple paths") {
    val d = ssspMap(
      Seq((1L, 2L, 10.0), (1L, 3L, 1.0), (3L, 2L, 2.0), (2L, 4L, 1.0)),
      1L)
    assert(d(2L) === 3.0 && d(4L) === 4.0)
  }

  test("sssp: unreachable node with out-edges keeps INF sentinel (Q1)") {
    val d = ssspMap(Seq((1L, 2L, 1.0), (5L, 6L, 1.0)), 1L)
    assert(d(5L) === INF)
    // 6 is neither a source nor reached → absent from output (Q4)
    assert(!d.contains(6L))
  }

  test("sssp: sink node discovered mid-iteration enters output (Q4)") {
    // 4 has no out-edges, appears only as a dst two hops from the source
    val d = ssspMap(Seq((1L, 2L, 1.0), (2L, 4L, 2.0)), 1L)
    assert(d(4L) === 3.0)
  }

  test("sssp: path sums above the INF sentinel stay invisible (Q2)") {
    // reference gate compares == 65535.0 exactly; a candidate above the
    // sentinel loses the min and the node reads as unreachable
    val d = ssspMap(Seq((1L, 2L, 70000.0)), 1L)
    assert(d(2L) === INF) // reached (emitted) but distance capped at the sentinel
    assert(d(1L) === 0.0)
  }

  test("sssp: self-loops and cycles converge") {
    val d = ssspMap(
      Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 2.0), (3L, 1L, 1.0)),
      1L)
    assert(d === Map(1L -> 0.0, 2L -> 2.0, 3L -> 4.0))
  }

  test("sssp matches in-driver Dijkstra on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(300) {
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (rnd.nextInt(9) + 1).toDouble)
    }
    val got = ssspMap(edges, 0L)

    // reference oracle: plain Dijkstra over the same edge list
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
    val dist = collection.mutable.Map[Long, Double](0L -> 0.0)
    val pq = collection.mutable.PriorityQueue((0.0, 0L))(Ordering.by(-_._1))
    val done = collection.mutable.Set[Long]()
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (!done(u)) {
        done += u
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (d + w < dist.getOrElse(v, Double.MaxValue)) { dist(v) = d + w; pq.enqueue((d + w, v)) }
        }
      }
    }
    val expected = (edges.map(_._1).toSet ++ dist.keySet).map { id =>
      id -> dist.getOrElse(id, INF)
    }.toMap
    assert(got === expected)
  }

  test("sssp on a long path exercises many rounds and the loop bound") {
    // 24-hop chain: one-node frontiers for 24 consecutive rounds — the
    // long-tail regime the incremental patch loop exists for.
    val n = 24
    val chain = (0 until n).map(i => (i.toLong, i + 1L, 1.0))
    val d = ssspMap(chain, 0L)
    assert(d.size === n + 1)
    (0 to n).foreach(i => assert(d(i.toLong) === i.toDouble))
  }

  test("connectedComponents on a long path folds and still labels one component") {
    val n = 24
    val chain = (0 until n).map(i => (i.toLong, i + 1L, 1.0))
    val comps = GraphOps
      .connectedComponents(edgesDf(chain))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(comps.size === n + 1)
    assert(comps.values.toSet === Set(0L))
  }

  test("kCore: a path fully peels via a multi-round deletion cascade") {
    // path of 11 nodes: endpoints die first (deg 1), each death exposes
    // the next node — the cascade the delta formulation must propagate
    val n = 10
    val path = (0 until n).map(i => (i.toLong, i + 1L, 1.0))
    val out = GraphOps.kCore(edgesDf(path), k = 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size === n + 1)
    assert(out.values.forall(_ == false))
  }

  test("kCore: a cycle with a pendant tail keeps exactly the cycle") {
    val cycle = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 1L, 1.0))
    val tail = Seq((4L, 5L, 1.0), (5L, 6L, 1.0), (6L, 7L, 1.0))
    val out = GraphOps.kCore(edgesDf(cycle ++ tail), k = 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.filter(_._2).keySet === Set(1L, 2L, 3L, 4L))
    assert(out.filterNot(_._2).keySet === Set(5L, 6L, 7L))
  }

  test("kCore: parallel edges and self-loops don't inflate degrees") {
    // 1-2 duplicated + self-loop on 1: simple-graph degree of 1 and 2 is 1
    val out = GraphOps
      .kCore(edgesDf(Seq((1L, 2L, 1.0), (1L, 2L, 2.0), (2L, 1L, 1.0), (1L, 1L, 1.0))), k = 2)
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(out === Map(1L -> false, 2L -> false))
  }

  test("sssp on an empty edge list returns an empty result") {
    assert(GraphOps.sssp(edgesDf(Seq.empty), 1L).count() === 0)
  }

  test("sssp with a source absent from the graph returns INF for all sources") {
    val d = ssspMap(Seq((5L, 6L, 1.0)), 99L)
    assert(d === Map(5L -> INF))
  }

  test("connectedComponents labels each component with its min id") {
    val out = GraphOps
      .connectedComponents(edgesDf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (9L, 7L, 1.0), (5L, 5L, 1.0))))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 7L -> 7L, 9L -> 7L, 5L -> 5L))
  }

  test("star-contraction CC agrees with label propagation on adversarial shapes") {
    // long chain (worst case for label propagation, log-rounds for stars),
    // a star with a large-id center, parallel edges, self-loops, and an
    // isolated self-loop-only node
    val edges =
      (0 until 30).map(i => (i.toLong, i + 1L, 1.0)) ++
        Seq((100L, 41L, 1.0), (100L, 42L, 1.0), (100L, 43L, 1.0), (100L, 41L, 1.0)) ++
        Seq((60L, 60L, 1.0), (70L, 71L, 1.0), (71L, 70L, 1.0))
    val byProp = GraphOps
      .connectedComponents(edgesDf(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStars = GraphOps
      .connectedComponentsStars(edgesDf(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byStars === byProp)
    assert(byStars(30L) === 0L) // chain collapsed to its min
    assert(byStars(41L) === 41L && byStars(100L) === 41L)
    assert(byStars(60L) === 60L) // self-loop-only node is its own component
  }

  test("labelPropagation: disjoint triangles settle on their min id; dups/self-loops ignored") {
    val tri = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0),
      // noise: self-loop and a reversed duplicate edge
      (1L, 1L, 1.0), (2L, 1L, 9.0))
    val got = GraphOps
      .labelPropagation(edgesDf(tri), rounds = 4)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("labelPropagation tie-break is the smallest label, synchronously") {
    // path 1-2-3: after round 1, node 2 sees {1,3} (tie -> 1),
    // endpoints adopt 2; round 2: node 2 sees {2,2} -> 2, node 1 sees
    // {1}, node 3 sees {1} (node 2's round-1 label) -> both 1
    val got = GraphOps
      .labelPropagation(edgesDf(Seq((1L, 2L, 1.0), (2L, 3L, 1.0))), rounds = 2)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("multiSourceBfs: masks union along directed paths, bounded by rounds") {
    // chain 1→2→3→4→5 plus 2→10; sources {1, 2} (bits 0, 1)
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0), (2L, 10L, 1.0))
    val got = GraphOps
      .multiSourceBfs(edgesDf(edges), nSources = 2, rounds = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // round bound: source 1 reaches {1,2,3,10} (1→2 then 2→{3,10}),
    // source 2 reaches {2,3,4,10}; node 5 is beyond 2 rounds of both
    assert(got === Map(
      1L -> (1L, 1L),
      2L -> (3L, 2L),
      3L -> (3L, 2L),
      4L -> (2L, 1L),
      10L -> (3L, 2L)))
    assert(!got.contains(5L))
  }

  test("multiSourceBfs: absent source ids degrade to unset bits; parallel edges collapse") {
    val edges = Seq((7L, 8L, 1.0), (7L, 8L, 2.0), (8L, 9L, 1.0))
    // sources 1..4 don't exist in the graph at all → empty result
    val empty = GraphOps.multiSourceBfs(edgesDf(edges), nSources = 4, rounds = 3).collect()
    assert(empty.isEmpty)
    // source 7 alone (bit 6) sweeps the chain
    val got = GraphOps
      .multiSourceBfs(edgesDf(edges), nSources = 7, rounds = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === Map(7L -> 64L, 8L -> 64L, 9L -> 64L))
  }

  test("hits: L1 mass is conserved up to per-node truncation on the harness graph") {
    val edges = Seq(
      (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (4L, 3L, 1.0), (3L, 5L, 1.0))
    val rows = GraphOps.hits(edgesDf(edges), iters = 3).collect()
    val n = rows.length.toLong
    val hubSum = rows.map(_.getLong(1)).sum
    val authSum = rows.map(_.getLong(2)).sum
    // integer division truncates at most 1 micro-unit per node and the
    // normalizer divides by the exact total, so each side's mass sits in
    // (1e6 − n, 1e6]
    assert(hubSum <= 1000000L && hubSum > 1000000L - n, s"hub mass $hubSum")
    assert(authSum <= 1000000L && authSum > 1000000L - n, s"auth mass $authSum")
  }

  test("kTruss on a triangle-free graph converges to the empty truss") {
    val path = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))
    assert(GraphOps.kTruss(edgesDf(path), k = 3).collect().isEmpty)
  }

  test("hits: a single edge puts all authority on the head and all hubness on the tail") {
    val out = GraphOps.hits(edgesDf(Seq((1L, 2L, 1.0))), iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1000000L, 0L))) // the only hub
    assert(out(2L) === ((0L, 1000000L))) // the only authority
  }

  test("linkPrediction: wedges through a capped hub vanish; the shared-neighbor pair ranks") {
    // c is a normal wedge center: a-c, b-c → predict (a, b).
    val edges = Seq((10L, 30L, 1.0), (20L, 30L, 1.0))
    val out = GraphOps.linkPrediction(edgesDf(edges), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((10L, 20L, 1L)))
    // a hub with deg > cap generates nothing: star of 70 leaves
    val star = (1L to 70L).map(i => (i, 1000L, 1.0))
    assert(GraphOps.linkPrediction(edgesDf(star), k = 10).collect().isEmpty)
  }

  test("kTruss: K4 survives a 4-truss peel, the attached triangle is cascaded away") {
    // complete graph on 1..4 (every edge in 2 triangles) plus a pendant
    // triangle {3,4,5} whose new edges sit in only 1 triangle each
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j, 1.0)
    val pendant = Seq((3L, 5L, 1.0), (4L, 5L, 1.0))
    val out = GraphOps.kTruss(edgesDf(k4 ++ pendant), k = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.keySet === k4.map(e => (e._1, e._2)).toSet, s"got ${out.keySet}")
    assert(out.values.forall(_ === 2L), "every K4 edge sits in exactly 2 surviving triangles")
  }

  test("harmonicCentrality: the star hub ranks first; exact sum matches 1/h by hand") {
    // leaves 1..6 all point at hub 10; a 2-hop tail 7→1→10.
    // exact = true is the VERIFY mode: the first-reach pair table rides
    // along as the verification column — spec-level only, the shipped
    // graph_harmonic query runs the sketch side alone
    val edges = (1L to 6L).map(i => (i, 10L, 1.0)) :+ ((7L, 1L, 1.0))
    val out = GraphOps
      .harmonicCentrality(edgesDf(edges), nSketches = 8, rounds = 2, topK = 8, exact = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // hub: 6 in-neighbors at h=1, node 7 at h=2 → 6/1 + 1/2 = 6.5
    assert(out.head._1 === 10L, s"hub must rank first, got ${out.toSeq}")
    val exact = out.map(r => r._1 -> r._3).toMap
    assert(exact(10L) === 6500000L)
    assert(exact(1L) === 1000000L) // 7→1 only
    assert(exact(7L) === 0L) // nothing reaches 7
    // estimates are nonneg and the hub's dominates every leaf's
    assert(out.forall(_._2 >= 0L))
    // the PRODUCTION (sketch-only) mode returns the identical estimate
    // column — dropping the exact side-car changes no published value
    val prod = GraphOps
      .harmonicCentrality(edgesDf(edges), nSketches = 8, rounds = 2, topK = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(prod.toSeq === out.map(r => (r._1, r._2)).toSeq)
  }

  test("closenessCentrality: hub leads by Lin's index; unreached nodes guard to 0") {
    // leaves 1..6 all point at hub 10; 7→1→10 gives the hub a 2-hop term
    val edges = (1L to 6L).map(i => (i, 10L, 1.0)) :+ ((7L, 1L, 1.0))
    val out = GraphOps.closenessCentrality(edgesDf(edges), nSketches = 8, rounds = 4, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head._1 === 10L, s"hub must lead, got ${out.toSeq}")
    val byId = out.map(r => r._1 -> r).toMap
    // leaves 2..6: nothing reaches them → zero delta → S = 0 → lin 0
    (2L to 6L).foreach { l =>
      assert(byId(l)._3 === 0L && byId(l)._4 === 0L, s"leaf $l must guard to 0")
    }
    // every ball estimate ≥ the 1-node self ball; S and lin nonnegative
    assert(out.forall(r => r._2 >= 1000L && r._3 >= 0L && r._4 >= 0L))
  }

  test("anfEstimate: sketch-only per-h rows equal anf's estimate column; early exit caps rows") {
    // 3-chain 1→2→3 plus 4→2: diameter 2, so the changed set empties
    // and the loop must stop well before maxRounds = 8
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (4L, 2L, 1.0))
    val est = GraphOps.anfEstimate(edgesDf(edges), nSketches = 8, maxRounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = GraphOps.anf(edgesDf(edges), nSketches = 8, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(est.length <= 3, s"early exit did not fire: ${est.toSeq}")
    // on the rounds both ran, the estimates are bit-identical
    full.foreach { case (h, n) =>
      assert(est.toMap.apply(h) === n, s"h=$h diverged: est=${est.toSeq} full=${full.toSeq}")
    }
  }

  test("triangleCount counts each triangle once, ignores dups and self-loops") {
    // K4 on {1,2,3,4} = 4 triangles; plus a self-loop and a parallel edge
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b, 1.0)
    val r = GraphOps
      .triangleCount(edgesDf(k4 ++ Seq((2L, 1L, 9.0), (3L, 3L, 1.0))))
      .collect()(0)
    assert(r.getLong(0) === 6L) // K4 edges, dedup'd
    assert(r.getLong(1) === 4L)
  }

  test("triangle orientation points at the hub: skewed wedge work stays at the leaves") {
    import org.apache.spark.sql.functions._
    // star: hub 7 ↔ leaves 100..139, plus leaf-leaf chords closing
    // triangles {7,100,101} and {7,102,103}
    val star = (100L to 139L).map(l => (7L, l, 1.0))
    val chords = Seq((100L, 101L, 1.0), (102L, 103L, 1.0))
    val edges = edgesDf(star ++ chords)
    val r = GraphOps.triangleCount(edges).collect()(0)
    assert(r.getLong(0) === 42L)
    assert(r.getLong(1) === 2L)
    // the skew property itself: the hub (max degree) has oriented
    // out-degree ZERO — wedge generation can never concentrate on it.
    // (id-ordered orientation would give the id-7 hub out-degree 40 and
    // O(40²) wedges from one join key.)
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val outdeg = GraphOps.orientByDegree(und)
      .groupBy(col("lo")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!outdeg.contains(7L)) // hub emits no wedges at all
    assert(outdeg.values.max <= 2L) // leaves carry ≤ their own tiny degree
  }

  test("pagerankFixed is deterministic and mass-bounded") {
    val edges = edgesDf(Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (1L, 3L, 1.0), (3L, 1L, 1.0)))
    val a = GraphOps.pagerankFixed(edges, 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pagerankFixed(edges, 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b) // bit-identical across runs (integer arithmetic)
    assert(a.values.forall(_ > 0))
    assert(a.values.sum <= 1000000000000L) // truncation only loses mass
    assert(a(1L) > a(2L)) // hub gets more rank than spokes
  }

  test("personalized pagerank: teleport mass returns only to the seed set") {
    // seedMod=2: seeds {0, 2, 4}; node 1 is a non-seed that 0 links to.
    // ring 0→1→2→3→4→0 plus 0→2 shortcut
    val edges = edgesDf(
      Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 0L, 1.0), (0L, 2L, 1.0)))
    val pr = GraphOps
      .pagerankPersonalized(edges, iters = 3, seedMod = 2L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val uni = GraphOps.pagerankFixed(edges, 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet === uni.keySet)
    assert(pr.values.sum <= 1000000000000L)
    // at zero iterations ALL mass sits on the seeds — non-seeds get
    // nothing until propagation starts
    val pr0 = GraphOps
      .pagerankPersonalized(edges, iters = 0, seedMod = 2L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(pr0(1L) === 0L && pr0(3L) === 0L)
    assert(pr0(0L) === 1000000000000L / 3 && pr0(0L) === pr0(2L) && pr0(2L) === pr0(4L))
    // after iterating, the seeds' SHARE of total rank exceeds the uniform
    // variant's seed share (the 15% returns only to them)
    def share(m: Map[Long, Long]): Double =
      Seq(0L, 2L, 4L).map(m).sum.toDouble / m.values.sum.toDouble
    assert(share(pr) > share(uni))
  }

  test("parseEdgeLines drops header lines and parses fields") {
    import spark.implicits._
    val lines = Seq("# comment", "0 1 2 3.5", "1 2 3 1.0").toDF("line")
    val out = GraphOps
      .parseEdgeLines(lines, org.apache.spark.sql.functions.col("line"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(out === Set((1L, 2L, 3.5), (2L, 3L, 1.0)))
  }

  test("reciprocity: mutual pair counts both directions, one-way edges none") {
    import spark.implicits._
    // 1↔2 mutual, 1→3 one-way, self-loop dropped
    val e = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (1L, 3L, 1.0), (4L, 4L, 1.0))
      .toDF("src", "dst", "w")
    val r = GraphOps.reciprocity(e).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 666666L)))
  }

  test("coreness: triangle with a tail, and K4 — exact core numbers") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4–1: coreness 2,2,2,1
    val tri = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0))
      .toDF("src", "dst", "w")
    val out = GraphOps.corenessTable(tri).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // K4: everyone coreness 3
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b, 1.0))
      .toDF("src", "dst", "w")
    val out4 = GraphOps.corenessTable(k4).collect().map(_.getLong(1)).toSet
    assert(out4 === Set(3L))
  }

  test("corenessHIndex: agrees with the peel decomposition exactly") {
    import spark.implicits._
    val tri = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0))
      .toDF("src", "dst", "w")
    val h = GraphOps.corenessHIndex(tri).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // chain of pendants into a K4 — the h-relaxation needs several
    // rounds to walk the chain down (the peel's longest cascade)
    val chain = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b, 1.0)) ++
      Seq((4L, 5L, 1.0), (5L, 6L, 1.0), (6L, 7L, 1.0), (7L, 8L, 1.0))
    val g = chain.toDF("src", "dst", "w")
    val peel = GraphOps.corenessTable(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hIdx = GraphOps.corenessHIndex(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hIdx === peel)
    assert(hIdx(5L) === 1L && hIdx(1L) === 3L)
  }

  test("corenessHIndex frontier rounds: a long path relaxes to all-ones through many tiny frontiers") {
    import spark.implicits._
    // pure path: coreness 1 everywhere, but the h-relaxation must walk
    // the 2→1 correction inward one hop per round — after round 1 the
    // changed set is tiny, so almost every round runs in FRONTIER mode
    // (changed·CorenessFrontierFrac ≤ n): exactly the delta-propagation
    // semantics the frontier restriction must not break
    val n = 40L
    val path = (1L until n).map(i => (i, i + 1, 1.0)).toDF("src", "dst", "w")
    val out = GraphOps.corenessHIndex(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size === n.toInt)
    assert(out.values.forall(_ === 1L), s"path coreness must be all 1: $out")
  }

  test("powerlawFit: hand-computed MLE on a 3-node path, hub graph skews alpha down") {
    import spark.implicits._
    // path 1-2-3: degrees 1,2,1 → S = 2·ln(2) + ln(4) in micro,
    // α = 1 + 3e12 div S
    val path = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val r = GraphOps.powerlawFit(path).collect()(0)
    val s = 2L * math.round(math.log(2.0) * 1e6) + math.round(math.log(4.0) * 1e6)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 1L, 2L, 1000000L + 3000000L * 1000000L / s)))
    // star with 6 leaves (heavier tail) fits a SMALLER alpha than the path
    val star = (2L to 7L).map(i => (1L, i, 1.0)).toDF("src", "dst", "w")
    val alphaStar = GraphOps.powerlawFit(star).collect()(0).getLong(3)
    assert(alphaStar < r.getLong(3))
  }

  test("msf equals Kruskal on a weighted fixture; forest size is |V| - #components") {
    import spark.implicits._
    // two components: a 4-cycle with one heavy chord, plus a disjoint edge.
    // under (wn, a, b) the forest is unique and hand-computable:
    // cycle 1-2-3-4-1 weights: (1,2)=5, (2,3)=1, (3,4)=2, (1,4)=9, chord (1,3)=7
    // MSF keeps (2,3), (3,4), then (1,2) [5 < 7 < 9]; drops (1,3), (1,4).
    val e = Seq(
      (1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 2L), (4L, 1L, 9L), (1L, 3L, 7L),
      (10L, 11L, 4L))
      .toDF("src", "dst", "wn")
    val out = GraphOps.msf(e).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 2L), (10L, 11L, 4L)))
    // 6 nodes, 2 components -> 4 forest edges
    assert(out.size === 6 - 2)
  }

  test("msf collapses parallel edges to the min weight and survives weight ties") {
    import spark.implicits._
    // all weights equal: tie-break (wn, a, b) keeps the lexicographically
    // smallest spanning edges; parallel (1,2) keeps wn=1
    val e = Seq((1L, 2L, 3L), (2L, 1L, 1L), (2L, 3L, 3L), (1L, 3L, 3L))
      .toDF("src", "dst", "wn")
    val out = GraphOps.msf(e).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 1L), (1L, 3L, 3L)))
  }

  test("msf working set contracts forward: round >= 2 join input shrinks") {
    import spark.implicits._
    // 8-node path with weights alternating small/large so Borůvka pairs
    // up in round 1 ({1,2},{3,4},{5,6},{7,8}), leaving exactly the 3
    // heavy edges crossing in round 2, then 0 — the crossing-set counts
    // must be the strictly-shrinking [7, 3, 0], never a re-scan of |E|.
    val e = Seq(
      (1L, 2L, 1L), (2L, 3L, 10L), (3L, 4L, 2L), (4L, 5L, 20L),
      (5L, 6L, 3L), (6L, 7L, 30L), (7L, 8L, 4L))
      .toDF("src", "dst", "wn")
    val out = GraphOps.msf(e, tailCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.size === 7) // the path is a tree: every edge survives
    assert(GraphOps.lastMsfRoundEdgeCounts === Vector(7L, 3L, 0L),
      s"Borůvka crossing set must contract each round, got ${GraphOps.lastMsfRoundEdgeCounts}")
    // hybrid tail: the driver Kruskal finish returns the identical
    // (unique) forest as pure distributed rounds, and the crossing set
    // collected is round-2's contracted remainder, never |E|
    val hybrid = GraphOps.msf(e, tailCap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hybrid === out)
    assert(GraphOps.lastMsfRoundEdgeCounts === Vector(7L, 3L),
      s"tail must take over at the 3-edge remainder, got ${GraphOps.lastMsfRoundEdgeCounts}")
  }

  test("stressCentrality matches explicit path enumeration on a diamond DAG") {
    import spark.implicits._
    // source 1; diamond 1->2->4, 1->3->4, then 4->5:
    // sigma(2)=sigma(3)=1, sigma(4)=2, sigma(5)=2
    // g(5)=0, g(4)=1, g(2)=g(3)=1+g(4)=2, stress: 2,3 -> 1*2=2; 4 -> 2*1=2; 5 -> 0
    val e = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 4L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0))
      .toDF("src", "dst", "w")
    val out = GraphOps
      .stressCentrality(e, nSources = 1, rounds = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out === Set((2L, 1L, 2L), (3L, 1L, 2L), (4L, 2L, 2L)))
  }

  test("stressCentrality horizon bounds the DAG; shorter-path wins over longer") {
    import spark.implicits._
    // 1->2->3 and direct 1->3: dist(3)=1, so 2 is NOT on any shortest path
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0), (3L, 4L, 1.0))
      .toDF("src", "dst", "w")
    val out = GraphOps
      .stressCentrality(e, nSources = 1, rounds = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toMap
    // only 3 is internal (1->3->4); 2's only continuation 2->3 is not
    // a shortest-path DAG edge (dist(3)=1 != dist(2)+1)
    assert(out === Map(3L -> 1L))
  }

  test("sccPivot classifies the pivot cycle, downstream tail, and upstream feeder") {
    import spark.implicits._
    // cycle 1->2->3->1 (the pivot SCC), 3->4 (downstream), 5->1 (upstream);
    // 6<->7 is a separate SCC — unreached, must be absent entirely
    val e = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 1L), (6L, 7L), (7L, 6L))
      .toDF("src", "dst")
    val out = GraphOps
      .sccPivot(e, rounds = 6)
      .collect()
      .map(r => r.getLong(0) -> r.getString(3))
      .toMap
    assert(out === Map(
      1L -> "scc", 2L -> "scc", 3L -> "scc", 4L -> "downstream", 5L -> "upstream"))
  }

  test("katzResiduals: single edge reaches the fixed point after round 1 and reports zeros") {
    import spark.implicits._
    // 1 -> 2: round 1 moves node 2 to 1000 + 1000/8 = 1125 (resid 125),
    // rounds 2..3 recompute the identical vector — residual exactly 0
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val out = GraphOps.katzResiduals(e, iters = 3).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, 1L, 125L), (2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("hitsResiduals: single edge converges after round 1 on both vectors") {
    import spark.implicits._
    // 1 -> 2: a1 = all mass on node 2, h1 = all mass on node 1; both
    // changed in round 1 (a0 ≡ 0, h0 uniform), then frozen
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val out = GraphOps.hitsResiduals(e, iters = 3).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out === Seq(
      (1L, 1L, 1000000L, 1L, 1000000L),
      (2L, 0L, 0L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("landmarkEstimate: fused 2n-bit sweep equals the two separate sweeps") {
    // r15 optimization: contiguous seed ranges (1..n landmarks,
    // n+1..2n sample sources) ride ONE maskLoop. Equivalence vs the
    // old two-sweep form is asserted row-for-row on a graph where both
    // batches saturate at different depths (the early-exit interaction
    // the fusion must not change): a chain hanging off the clique side.
    val clique = for { a <- 1L to 16L; b <- (a + 1) to 16L; if b - a <= 3 } yield (a, b, 1.0)
    val chain = Seq((16L, 97L, 1.0), (97L, 194L, 1.0), (194L, 291L, 1.0))
    val edges = edgesDf(clique ++ chain)
    import org.apache.spark.sql.functions.col
    val und = edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val fused = GraphOps
      .landmarkEstimate(edges, nLandmarks = 8, rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    // the pre-r15 shape: two independent 8-bit sweeps
    val lm = GraphOps.landmarkDistances(und, nLandmarks = 8, rounds = 4)
    val ex = GraphOps.landmarkDistances(und, nLandmarks = 8, rounds = 4, seedLo = 9L)
    val lu = lm
      .filter(col("id") >= 9L && col("id") <= 16L)
      .select(col("id").as("u"), col("landmark"), col("dist").as("du"))
    val lv = lm
      .filter(org.apache.spark.sql.functions.pmod(col("id"), org.apache.spark.sql.functions.lit(97L)) === 0)
      .select(col("id").as("v"), col("landmark"), col("dist").as("dv"))
    val est = lv
      .join(org.apache.spark.sql.functions.broadcast(lu), Seq("landmark"))
      .groupBy(col("u"), col("v"))
      .agg(org.apache.spark.sql.functions.min(col("du") + col("dv")).as("est_dist"))
    val exact = ex
      .filter(org.apache.spark.sql.functions.pmod(col("id"), org.apache.spark.sql.functions.lit(97L)) === 0)
      .select(col("id").as("v"), (col("landmark") + 8L).as("u"), col("dist").as("exact_dist"))
    val twoSweep = est
      .join(exact, Seq("u", "v"), "left_outer")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(fused.nonEmpty)
    assert(fused === twoSweep)
  }

  test("triangleCountUnd on the pre-simplified graph equals triangleCount") {
    // r15 optimization support: graph_triangle_sampled shares one
    // simplified undirected edge set between its exact and sampled
    // counts. The simplification (drop self-loops, least/greatest,
    // distinct) must commute with triangleCount's internal one.
    import org.apache.spark.sql.functions._
    val edges = edgesDf(Seq(
      (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0), // triangle
      (2L, 1L, 5.0), (3L, 3L, 1.0), // reverse dup + self-loop
      (3L, 4L, 1.0), (4L, 1L, 1.0))) // second triangle 1-3-4
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val viaUnd = GraphOps.triangleCountUnd(und).collect()(0)
    val direct = GraphOps.triangleCount(edges).collect()(0)
    assert((viaUnd.getLong(0), viaUnd.getLong(1)) === ((direct.getLong(0), direct.getLong(1))))
    assert(viaUnd.getLong(1) === 2L)
  }
}
