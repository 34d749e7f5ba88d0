package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Connected components vs a local union-find reference. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Runs BOTH implementations — driver union-find (default threshold)
    * and the distributed star iteration (threshold 0) — and asserts they
    * agree before returning. */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val local = GraphOps.connectedComponents(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = GraphOps.connectedComponents(df, "src", "dst", localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, s"local/distributed disagree: $local vs $dist")
    local
  }

  /** Plain union-find over the same edges; labels = component min. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => if (a != b) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }}
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(n => edges.exists(e => e._1 != e._2 && (e._1 == n || e._2 == n)))
    val groups = nodes.groupBy(find)
    groups.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  /** Driver-side power iteration mirroring GraphOps.pagerank's rounding. */
  private def prRef(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n = nodes.size
    var rank = nodes.map(_ -> r12(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2)
      rank = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty)
          .map { case (u, _) => rank(u) / deg(u) }.sum
        v -> r12(0.15 / n + 0.85 * s)
      }.toMap
    }
    rank
  }

  test("pagerank: star center dominates; mass is conserved; matches driver reference") {
    // undirected star 0—{1..8}, symmetrized
    val und = (1L to 8L).map(i => ("n0", s"n$i"))
    val edges = und ++ und.map(_.swap)
    val got = GraphOps.pagerank(edges.toDF("src", "dst"),
        damping = 0.85, teleport = 0.15, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = prRef(edges, 3)
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-9, k) }
    assert(got("n0") > got("n1") * 2, "hub should dominate leaves")
    assert(math.abs(got.values.sum - 1.0) < 1e-6, "rank mass conserved")
  }

  test("pagerank: a regular graph stays uniform at 1/N") {
    // directed 6-cycle: out-degree 1 everywhere, in-degree 1 everywhere
    val edges = (0L until 6L).map(i => (s"c$i", s"c${(i + 1) % 6}"))
    val got = GraphOps.pagerank(edges.toDF("src", "dst"),
        damping = 0.85, teleport = 0.15, iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    got.foreach { case (k, v) =>
      assert(math.abs(v - 1.0 / 6) < 1e-9, s"$k drifted: $v") }
  }

  test("chain converges to the global min (stresses multi-round contraction)") {
    val chain = (1L until 16L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got == (1L to 16L).map(_ -> 1L).toMap)
  }

  test("two components + reversed/duplicate/self edges") {
    val edges = Seq((5L, 3L), (3L, 5L), (3L, 9L), (9L, 9L),
      (20L, 30L), (30L, 20L), (40L, 20L))
    val got = cc(edges)
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 30L -> 20L, 40L -> 20L))
  }

  test("cycle plus pendant") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 7L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 1L))
  }

  test("random graph matches union-find (seeded)") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    assert(cc(edges) == unionFind(edges))
  }

  test("empty and all-self-loop inputs yield no labels") {
    assert(cc(Seq.empty) == Map.empty)
    assert(cc(Seq((4L, 4L), (9L, 9L))) == Map.empty)
  }

  test("star graph (hot node) resolves in-place") {
    val edges = (2L to 40L).map(i => (i, 1L))
    assert(cc(edges) == (1L to 40L).map(_ -> 1L).toMap)
  }

  /** Symmetrizes, runs LPA, returns node→label. */
  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).toDF("u", "v")
    GraphOps.labelPropagation(sym, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver reference: synchronous neighbor-mode with min-label
    * tie-break, the exact rule labelPropagation claims. */
  private def lpaRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = adj.map { case (u, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, xs) => (l, xs.size) }
        u -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("labelPropagation: two cliques with one bridge form two communities") {
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val edges = cliqueA ++ cliqueB ++ Seq((4L, 10L))
    val got = lpa(edges, 3)
    assert(got == lpaRef(edges, 3))
    // clique A converges to its min label; clique B likewise (the single
    // bridge can't outvote 3 intra-clique neighbors)
    assert((1L to 3L).forall(got(_) == 1L))
    assert((11L to 13L).forall(got(_) == 10L))
  }

  test("labelPropagation: matches the driver reference on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    assert(lpa(edges, 3) == lpaRef(edges, 3))
  }

  test("labelPropagation: star adopts the center's label by round 2") {
    val edges = (2L to 20L).map(i => (1L, i))
    val got = lpa(edges, 2)
    // round 1: leaves take the center's label (their only neighbor);
    // center takes the min leaf label (2). round 2: center's neighbors
    // all carry label 1 → center flips back to 1; leaves see center
    // label 2 → 2. The reference pins the exact oscillation.
    assert(got == lpaRef(edges, 2))
  }

  test("pagerank: broadcast and big-graph shuffle paths agree exactly") {
    val rnd = new scala.util.Random(11)
    val raw = Seq.fill(200)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
    val sym = (raw ++ raw.map(_.swap)).toDF("src", "dst")
    def ranksOf(limit: Long) =
      GraphOps.pagerank(sym, 0.85, 0.15, iters = 3, broadcastNodeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // limit 0 forces the pre-partitioned shuffle-join path; default
    // broadcasts. 12dp per-iteration rounding makes them bit-equal.
    assert(ranksOf(0L) == ranksOf(10000000L))
  }

  test("labelPropagation: broadcast and big-graph shuffle paths agree exactly") {
    val rnd = new scala.util.Random(13)
    val raw = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val sym = (raw ++ raw.map(_.swap)).toDF("u", "v")
    def labelsOf(limit: Long) =
      GraphOps.labelPropagation(sym, iters = 3, broadcastNodeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelsOf(0L) == labelsOf(10000000L))
  }

  /** Driver PPR reference mirroring personalizedPagerank's rounding. */
  private def pprRef(edges: Seq[(String, String)], seed: String,
      iters: Int): Map[String, Double] = {
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = nodes.map(v => v -> (if (v == seed) 1.0 else 0.0)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2)
      rank = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty)
          .map { case (u, _) => rank(u) / deg(u) }.sum
        v -> r12((if (v == seed) 0.15 else 0.0) + 0.85 * s)
      }.toMap
    }
    rank
  }

  test("personalizedPagerank: mass stays near the seed; matches driver reference") {
    // path a—b—c—d—e symmetrized: PPR from "a" must decay monotonically
    // with distance, unlike global pagerank which peaks at the middle
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val edges = und ++ und.map(_.swap)
    val got = GraphOps.personalizedPagerank(edges.toDF("src", "dst"),
        seed = "a", damping = 0.85, teleport = 0.15, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = pprRef(edges, "a", 3)
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-9, k) }
    // NOTE: no monotonic-decay assertion — 3 cold-start power iterations
    // on a path oscillate by walk parity (odd distances hold more mass
    // than even ones until mixing); the stable facts are that the seed's
    // neighbor dominates all other non-seed nodes and unreached nodes
    // are exactly zero
    assert(Seq("c", "d", "e").forall(k => got("b") > got(k)),
      s"seed neighbor should dominate: $got")
    assert(got("e") == 0.0, "3 iterations cannot reach distance 4")
  }

  test("personalizedPagerank: broadcast and shuffle paths agree exactly") {
    val rnd = new scala.util.Random(17)
    val raw = Seq.fill(200)((rnd.nextInt(50), rnd.nextInt(50)))
      .filter(e => e._1 != e._2).map(e => (s"n${e._1}", s"n${e._2}"))
    val sym = (raw ++ raw.map(_.swap)).toDF("src", "dst")
    def ranksOf(limit: Long) =
      GraphOps.personalizedPagerank(sym, "n0", 0.85, 0.15, iters = 3,
          broadcastNodeLimit = limit)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranksOf(0L) == ranksOf(10000000L))
  }
}
