package graft.ops

import graft.SparkSpec

/** Pins for [[Graph.pagerankFixedPoint]]: hand-replayed integer
  * recursion on a known graph, mass-conservation bounds, and
  * checkpoint-mode equivalence.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L

  /** Driver-side replay of the exact integer recursion. */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var rank = deg.keys.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val contribs = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) / deg(u) }.sum
      }
      rank = contribs.map { case (v, s) => v -> (S / 8 + 7 * s / 8) }
    }
    rank
  }

  test("pagerank equals the hand-replayed integer recursion (path + star)") {
    // path 1-2-3 plus star center 10 with leaves 11,12,13
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (10L, 13L))
    for (iters <- Seq(1, 3, 5); cp <- Seq(true, false)) {
      val got = Graph.pagerankFixedPoint(
          edges.toDF("src", "dst"), iters, checkpoint = cp)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === ref(edges, iters), s"iters=$iters cp=$cp")
      // the small-graph driver valve runs the identical recursion
      val valved = Graph.pagerankFixedPoint(
          edges.toDF("src", "dst"), iters, smallGraphThreshold = 1000L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(valved === got, s"valve mode diverged at iters=$iters")
      // an over-threshold graph falls through to the distributed path
      val over = Graph.pagerankFixedPoint(
          edges.toDF("src", "dst"), iters, smallGraphThreshold = 3L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(over === got, s"fall-through diverged at iters=$iters")
    }
  }

  test("pagerank: star center outranks leaves; mass stays bounded") {
    val edges = (1L to 6L).map(l => (0L, l))
    val got = Graph.pagerankFixedPoint(edges.toDF("src", "dst"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val center = got.find(_._1 == 0L).get
    val leaves = got.filter(_._1 != 0L)
    assert(center._2 === 6L) // symmetric degree
    assert(leaves.forall(_._3 < center._3))
    // total fixed-point mass can only leak DOWN (floor division)
    assert(got.map(_._3).sum <= 7L * S)
    assert(got.map(_._3).sum > 6L * S)
  }

  test("triangles: hand case — K4 minus an edge, plus an isolated edge") {
    // K4 on {1,2,3,4} without edge (3,4): triangles {1,2,3} and {1,2,4};
    // nodes 1,2 in two each, 3,4 in one each; edge (9,10) in none.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (9L, 10L))
    val got = Graph.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("triangles: equals naive enumeration on seeded random graphs (dups/self-loops tolerated)") {
    val rnd = new scala.util.Random(1234)
    for (round <- 1 to 5) {
      val n = 12 + rnd.nextInt(10)
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = Graph.triangleCounts(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val ref = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        Seq(x, y, z) <- nodes.combinations(3)
        if und((x, y)) && und((y, z)) && und((x, z))
        v <- Seq(x, y, z)
      } ref(v) += 1
      assert(got === ref.toMap.filter(_._2 > 0), s"round=$round")
    }
  }

  test("co-occurrence similarity: hand cosines, tie-break, basket cap") {
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 2L), (30L, 3L)).toDF("bk", "item")
    val byRank = Graph.cooccurrenceSimilarity(baskets, "bk", "item",
      basketCap = 6, topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(5)) -> ((r.getLong(1), r.getDouble(6)))).toMap
    val c12 = 2.0 / math.sqrt(2.0 * 3.0)
    // item 2 ties between 1 and 3 at 2/sqrt(6) -> neighbor id breaks it
    assert(byRank((2L, 1L)) === ((1L, c12)))
    assert(byRank((2L, 2L)) === ((3L, c12)))
    assert(byRank((1L, 1L)) === ((2L, c12)))
    assert(byRank((1L, 2L)) === ((3L, 1.0 / math.sqrt(2.0 * 2.0))))
    assert(byRank((3L, 1L)) === ((2L, c12)))
    // cap=2 truncates basket 10 to items {1,2}: pair (1,3)/(2,3) lose it
    val capped = Graph.cooccurrenceSimilarity(baskets, "bk", "item",
      basketCap = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped((1L, 2L)) === 2L)
    assert(!capped.contains((1L, 3L)))
    assert(capped((2L, 3L)) === 1L) // only basket 30 remains
  }

  test("kCore: cascade peeling reaches the true core; budget and checkpoint modes agree") {
    // triangle {1,2,3} braced by a tail 3-4-5: 2-core = the triangle,
    // but the tail needs TWO peels (5 goes first, then 4) — pins that
    // degrees are recomputed on the induced subgraph each round.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    for (cp <- Seq(true, false)) {
      val got = Graph.kCore(edges.toDF("src", "dst"), k = 2, rounds = 8,
        checkpoint = cp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"cp=$cp")
    }
    // driver valve and fall-through both match the distributed result
    for (thr <- Seq(1000L, 3L)) {
      val valved = Graph.kCore(edges.toDF("src", "dst"), k = 2, rounds = 8,
        smallGraphThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(valved === Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"thr=$thr")
    }
    // k above the max degree empties the core
    assert(Graph.kCore(edges.toDF("src", "dst"), k = 5, rounds = 4).count() === 0)
    // an exhausted budget returns the partially peeled (deterministic) set:
    // one round only removes node 5; node 4 survives with its stale edge
    val partial = Graph.kCore(edges.toDF("src", "dst"), k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(partial === Set(1L, 2L, 3L, 4L))
  }

  test("pagerank rejects a zero iteration budget") {
    intercept[IllegalArgumentException] {
      Graph.pagerankFixedPoint(Seq((1L, 2L)).toDF("src", "dst"), 0)
    }
  }

  test("label propagation separates cliques, keeps the min-label tiebreak, oscillates deterministically") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L)) ++ // one bridge
      Seq((20L, 21L))) // isolated pair: synchronous oscillation
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each clique converges to its min id; the bridge does not merge them
    for (n <- Seq(1L, 2L, 3L, 4L)) assert(got(n)._1 === 1L, s"node $n")
    for (n <- Seq(11L, 12L, 13L)) assert(got(n)._1 === 10L, s"node $n")
    // the isolated pair swaps labels every synchronous round; after an
    // odd budget each holds the OTHER's id — deterministic, pinned
    assert(got(20L)._1 === 21L && got(21L)._1 === 20L)
    // community sizes consistent with the label partition
    val labelCounts = got.values.groupBy(_._1).map { case (l, g) => l -> g.size }
    for ((_, (l, sz)) <- got) assert(sz === labelCounts(l).toLong)
  }
}
