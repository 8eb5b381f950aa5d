package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C89: the fixed-point PageRank must reproduce a driver-side replay of the
  * damped rounds exactly (including the dangling-mass redistribution), rank
  * structure over a star must put the hub on top, and total walk mass must
  * stay ≈ N·scale (truncation-only loss). */
class RankSpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side replay of the exact integer fixed point, dangling term
    * included: nodes = distinct(src ∪ dst); each round the summed rank of
    * nodes with no out-edges is divided (truncating) by N and added to
    * every node's incoming contribution before damping. */
  private def replay(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val wt = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val dangling = nodes.filterNot(wt.contains)
    val n = nodes.size
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val dshare = dangling.map(r).sum / n
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / wt(s) }.sum).toMap
      r = nodes.map(nd =>
        nd -> (15L * 1000000000L + 85L * (in.getOrElse(nd, 0L) + dshare)) / 100L).toMap
    }
    r
  }

  test("C89: matches the driver replay on an asymmetric weighted graph") {
    // 1↔2 heavy, 2↔3 light, 3→1 back-edge: every node has out-edges
    val edges = Seq((1L, 2L, 10L), (2L, 1L, 10L), (2L, 3L, 1L), (3L, 1L, 5L))
    val got = Rank.pageRank(edges.toDF("src", "dst", "w"), iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == replay(edges, 6))
  }

  test("C89: dangling sinks — mass redistributes, replay stays exact") {
    // 4 and 5 are pure sinks (appear only as dst); 5 is a heavy sink fed
    // by everyone — without the dangling term its absorbed mass would
    // leak out of the walk and the hub ordering below would differ.
    val edges = Seq(
      (1L, 2L, 3L), (2L, 1L, 1L), (2L, 4L, 2L),
      (1L, 5L, 1L), (2L, 5L, 4L), (3L, 5L, 2L), (3L, 1L, 1L))
    val got = Rank.pageRank(edges.toDF("src", "dst", "w"), iters = 8)
      .as[(Long, Long)].collect().toMap
    val exp = replay(edges, 8)
    assert(got == exp)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), "sinks must be in the node set")
    // the dangling term keeps total mass within truncation loss of N·scale
    val total = got.values.sum
    assert(math.abs(total - 5 * 1000000000L) < 5 * 2000L,
      s"dangling mass must be recycled, not dropped: $total")
    assert(got(5L) > got(4L), "heavier-fed sink must outrank lighter sink")
  }

  test("C89: all-dangling degenerate graph converges to teleport-only rank") {
    // single edge into a sink that never links back: after round 1 the
    // source holds only teleport mass; replay must still match exactly.
    val edges = Seq((1L, 2L, 1L))
    val got = Rank.pageRank(edges.toDF("src", "dst", "w"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == replay(edges, 4))
  }

  test("C89: star hub dominates; mass is conserved up to truncation") {
    val leaves = (2L to 41L)
    val edges = leaves.map(l => (1L, l, 1L)) ++ leaves.map(l => (l, 1L, 1L))
    val got = Rank.pageRank(edges.toDF("src", "dst", "w"), iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == replay(edges, 6))
    val hub = got(1L)
    assert(leaves.forall(l => got(l) < hub), "hub must outrank every leaf")
    // damped-walk mass: Σr stays within rounding of N·scale (each node's
    // update truncates < 100 ppb per round, plus per-edge division loss)
    val total = got.values.sum
    val n = got.size
    assert(math.abs(total - n * 1000000000L) < n * 1000L,
      s"total mass $total vs ${n * 1000000000L}")
  }

  /** Driver replay of the personalized fixed point: teleport and dangling
    * mass both land on the seed set, divisions in the operator's order. */
  private def replayPpr(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                        iters: Int, scale: Long = 1000000000000L): Map[Long, Long] = {
    val wt = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val dangling = nodes.filterNot(wt.contains)
    val nS = seeds.size.toLong
    val tele = ((100L - 85L) * scale / 100L) / nS
    var r = nodes.map(n => n -> (if (seeds(n)) scale / nS else 0L)).toMap
    for (_ <- 1 to iters) {
      val dshare = dangling.map(r).sum / nS
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / wt(s) }.sum).toMap
      r = nodes.map { n =>
        val seedExtra = if (seeds(n)) dshare else 0L
        n -> (85L * (in.getOrElse(n, 0L) + seedExtra) / 100L +
          (if (seeds(n)) tele else 0L))
      }.toMap
    }
    r
  }

  test("C101: personalized PageRank matches the driver replay; mass concentrates near the seeds") {
    // two loosely-bridged clusters plus a dangling sink hanging off the
    // seed cluster: the walk from seed 1 must rank its own cluster far
    // above the distant cluster, and the sink's mass must restart at the seed
    val edges = Seq(
      (1L, 2L, 5L), (2L, 1L, 5L), (2L, 3L, 5L), (3L, 1L, 5L), // seed cluster
      (3L, 4L, 1L),                                            // weak bridge
      (4L, 5L, 5L), (5L, 6L, 5L), (6L, 4L, 5L),               // far cluster
      (2L, 7L, 2L))                                            // 7 = dangling sink
    val got = Rank.personalizedPageRank(
      edges.toDF("src", "dst", "w"), Seq(Tuple1(1L)).toDF("node"), iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == replayPpr(edges, Set(1L), 8))
    assert(got.keySet == (1L to 7L).toSet)
    // locality: every seed-cluster node outranks every far-cluster node
    for (near <- Seq(1L, 2L, 3L); far <- Seq(4L, 5L, 6L))
      assert(got(near) > got(far), s"near=$near far=$far: $got")
    // total mass stays ≈ one unit (truncation-only loss)
    val total = got.values.sum
    assert(total > 999990000000L && total <= 1000000000000L, s"mass $total")
  }

  test("C101: multi-seed replay with tied structure splits the teleport exactly") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 1L), (4L, 3L, 1L))
    val got = Rank.personalizedPageRank(
      edges.toDF("src", "dst", "w"), Seq(1L, 3L).map(Tuple1(_)).toDF("node"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == replayPpr(edges, Set(1L, 3L), 5))
    // symmetric components with symmetric seeds: identical ranks
    assert(got(1L) == got(3L) && got(2L) == got(4L))
  }

  /** Driver replay of the integer HITS rounds (BigInt sums, truncating
    * renorm to 10⁴ per side). */
  private def replayHits(edges: Seq[(Long, Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var hub = nodes.map(_ -> 10000L).toMap
    var auth = nodes.map(_ -> 10000L).toMap
    for (_ <- 1 to iters) {
      val aSum = nodes.map(n => n -> edges.filter(_._2 == n)
        .map { case (s, _, w) => BigInt(hub(s)) * w }.sum).toMap
      val amx = aSum.values.max
      auth = nodes.map(n => n ->
        (if (amx > 0) (aSum(n) * 10000 / amx).toLong else 0L)).toMap
      val hSum = nodes.map(n => n -> edges.filter(_._1 == n)
        .map { case (_, d, w) => BigInt(auth(d)) * w }.sum).toMap
      val hmx = hSum.values.max
      hub = nodes.map(n => n ->
        (if (hmx > 0) (hSum(n) * 10000 / hmx).toLong else 0L)).toMap
    }
    nodes.map(n => n -> ((hub(n), auth(n)))).toMap
  }

  test("C102: HITS matches the driver replay; duality holds on a bipartite graph") {
    // customers 1..3 → suppliers 11..13; customer 1 buys broadly from the
    // popular suppliers, supplier 11 is bought by everyone
    val edges = Seq(
      (1L, 11L, 5L), (1L, 12L, 3L), (1L, 13L, 1L),
      (2L, 11L, 4L), (2L, 12L, 1L),
      (3L, 11L, 2L))
    val got = Rank.hits(edges.toDF("src", "dst", "w"), iters = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == replayHits(edges, 8))
    // bipartite duality: pure sources have auth 0, pure sinks hub 0
    for (c <- Seq(1L, 2L, 3L)) assert(got(c)._2 == 0L, s"customer $c auth")
    for (s <- Seq(11L, 12L, 13L)) assert(got(s)._1 == 0L, s"supplier $s hub")
    // the broadest hub and the most-bought authority top their sides at 10^4
    assert(got(1L)._1 == 10000L, s"hub: $got")
    assert(got(11L)._2 == 10000L, s"auth: $got")
    // ordering follows link structure
    assert(got(2L)._1 > got(3L)._1 && got(12L)._2 > got(13L)._2)
  }

  test("C103: seed distance equals brute-force BFS; horizon and unreached handled") {
    // chain 1→2→3→4→5, branch 2→6, island 8→9, second seed 7→4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L),
      (8L, 9L), (7L, 4L)).map { case (a, b) => (a, b, 1L) }
    def brute(seeds: Set[Long], maxHops: Int): Map[Long, Long] = {
      var dist = seeds.map(_ -> 0L).toMap
      for (k <- 1 to maxHops) {
        val expand = edges.filter(e => dist.get(e._1).contains(k - 1L))
          .map(_._2).filterNot(dist.contains)
        dist = dist ++ expand.map(_ -> k.toLong)
      }
      dist
    }
    for (maxHops <- Seq(0, 1, 2, 6)) {
      val got = Rank.seedDistance(edges.toDF("src", "dst", "w"),
        Seq(1L, 7L).map(Tuple1(_)).toDF("node"), maxHops)
        .as[(Long, Long)].collect().toMap
      assert(got == brute(Set(1L, 7L), maxHops), s"maxHops=$maxHops")
    }
    // min over multiple paths: node 4 is 1 hop from seed 7, not 3 from 1
    val full = Rank.seedDistance(edges.toDF("src", "dst", "w"),
      Seq(1L, 7L).map(Tuple1(_)).toDF("node"), 6)
      .as[(Long, Long)].collect().toMap
    assert(full(4L) == 1L && full(5L) == 2L && full(6L) == 2L)
    assert(!full.contains(8L) && !full.contains(9L), "island stays unreached")
  }

  test("C89: q170 plan has no cartesian product") {
    val t = graft.queries.Tables(spark, sfDir)
    val df = graft.queries.TrainingData.q170PageRank(t)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "PageRank must join on keys")
  }

  // ---------------------------------------- C137: weighted seed cost

  /** Driver-side Bellman-Ford with the same round budget. */
  private def bruteCosts(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                         rounds: Int): Map[Long, Long] = {
    var d = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relax = edges.flatMap { case (s, t, w) => d.get(s).map(c => t -> (c + w)) }
      d = (d.toSeq ++ relax).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    }
    d
  }

  test("C137: weightedSeedCost equals driver-side Bellman-Ford; cheap long path beats pricey hop") {
    // seed 0; direct edge 0->9 costs 10; path 0->1->2->9 costs 1+1+1=3
    val edges = Seq((0L, 9L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 9L, 1L),
      (9L, 50L, 5L), (60L, 61L, 1L))
    val got = Rank.weightedSeedCost(
        edges.toDF("src", "dst", "w"), Seq(Tuple1(0L)).toDF("node"), rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == bruteCosts(edges, Seq(0L), 8), s"got $got")
    assert(got(9L) == 3L, "the cheap 3-hop path must beat the pricey 1-hop edge")
    assert(got(50L) == 8L)
    assert(!got.contains(60L) && !got.contains(61L), "unreached nodes are absent")
  }

  test("C137: early exit lands on the fixed point; a too-small round budget is visible") {
    val chain = (0L until 6L).map(i => (i, i + 1, 1L))
    val df = chain.toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val full = Rank.weightedSeedCost(df, seeds, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(full == (0L to 6L).map(i => i -> i).toMap)
    val capped = Rank.weightedSeedCost(df, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(capped == (0L to 3L).map(i => i -> i).toMap, "3 rounds reach 3 hops")
  }

  test("C137: negative weights are refused loudly") {
    val df = Seq((0L, 1L, -1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      Rank.weightedSeedCost(df, Seq(Tuple1(0L)).toDF("node"))
    }
  }
}
