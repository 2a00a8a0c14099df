package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {

  import spark.implicits._

  test("pagerank conserves probability mass with dangling redistribution") {
    val edges = Seq(("a", "x"), ("b", "x"), ("c", "y")).toDF("src", "dst")
    val total = Graph.pageRank(edges).agg(sum("pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"mass = $total")
  }

  test("pagerank ranks the supplier with more in-links higher") {
    // x receives from 3 sources, y from 1; sources have equal out-degree
    val edges = Seq(("a", "x"), ("b", "x"), ("c", "x"), ("d", "y"))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("x") > pr("y"), pr.toString)
    assert(pr("y") > pr("a"), pr.toString) // any sink beats a pure source
  }

  test("pagerank of a symmetric cycle is uniform") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val ranks = Graph.pageRank(edges).collect().map(_.getDouble(1)).toSet
    assert(ranks.size == 1, s"cycle ranks diverged: $ranks")
  }

  test("BFS depths: chain distances, min-depth on multi-path, bounded hops") {
    import spark.implicits._
    // 1—2—3—4—5 chain plus a 1—3 shortcut: depth(3) must be 1, not 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
      .toDF("src", "dst")
    val got = Graph.bfsDepths(edges, srcNode = 1L, hops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3), got.toString)
    // undirected: BFS from the chain's far end walks back the same distances
    val rev = Graph.bfsDepths(edges, srcNode = 5L, hops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rev(4L) == 1 && rev(3L) == 2 && rev(1L) == 3)
    // hops bound: nodes beyond the horizon are absent, not depth-capped
    val short = Graph.bfsDepths(edges, srcNode = 5L, hops = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(short == Map(5L -> 0, 4L -> 1), short.toString)
  }

  private def census(pairs: Seq[(Long, Long)]): (Long, Long, Long) = {
    val row = Graph.triangleCensus(pairs.toDF("a", "b")).head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  test("triangle census: K4 has 4 triangles, a star has none") {
    // K4: every 3-subset closes — C(4,3) = 4 triangles, C(4,2) = 6 edges
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(census(k4) == ((6L, 4L, 4L)), census(k4).toString)
    // star: all wedges open — high degree center, zero triangles
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val (se, _, st) = census(star)
    assert(se == 4L && st == 0L)
    // one closed + one open wedge
    val mixed = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(census(mixed)._3 == 1L, census(mixed).toString)
  }

  test("triangle census orientation counts each triangle exactly once") {
    // two triangles sharing an edge: {1,2,3} and {2,3,4}
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(census(g)._3 == 2L, census(g).toString)
  }

  test("personalized pagerank: mass conserved, flows down the chain from the seed") {
    // chain a -> b -> c, seed = min(src) = "a"
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val pr = Graph.personalizedPageRank(edges, iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, pr.toString)
    // hand-computed: r1 = (a .15, b .85, c 0);
    // r2 = (a .15, b .85*.15, c .85*.85)
    assert(math.abs(pr("a") - 0.15) < 1e-9, pr.toString)
    assert(math.abs(pr("b") - 0.1275) < 1e-9, pr.toString)
    assert(math.abs(pr("c") - 0.7225) < 1e-9, pr.toString)
    // the seed keeps its teleport share; a non-seed source gets none
    val one = Graph.personalizedPageRank(edges, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one("b") > one("a") && one("c") == 0.0, one.toString)
  }

  test("adamic-adar scores the hand-computed path graph and skips existing edges") {
    // path 1-2-3-4: non-adjacent candidates are (1,3) via center 2,
    // (2,4) via center 3, (1,4) with NO common neighbor (absent).
    // deg(2) = deg(3) = 2 → both scores are 1/ln 2.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.adamicAdar(path).orderBy("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val w = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, 3L, 1L, w), (2L, 4L, 1L, w)), got.mkString(","))
    // triangle {1,2,3}: all pairs adjacent → nothing to predict
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    assert(Graph.adamicAdar(tri).isEmpty)
  }

  test("adamic-adar hub cap drops wedges centered at high-degree nodes") {
    // star center 1 with 5 leaves: every leaf pair is a candidate through
    // the center; cap below 5 removes the center → no candidates at all
    val star = (2L to 6L).map(l => (1L, l)).toDF("a", "b")
    assert(Graph.adamicAdar(star, hubCap = 64).count() == 10L) // C(5,2)
    assert(Graph.adamicAdar(star, hubCap = 4).isEmpty)
  }
}
