package graft

import org.apache.spark.sql.functions._
import operators.{Graph, TimeSeries, Wrangling}

/** Semantic properties of the round-9 statistical-test / smoothing /
  * HITS operators, on crafted frames with hand-computable answers (the
  * oracle hash-compare covers the production-table paths; these pin the
  * MATH on inputs where the right answer is known in closed form).
  */
class StatTestsSpec extends SparkSuite {
  import spark.implicits._

  test("chi2Independence is exactly 0 on a perfectly independent table") {
    // O(a,b) = r_a·c_b/N exactly: margins (30, 60) × (30, 60), N = 90
    val rows =
      Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
        Seq.fill(20)(("y", "u")) ++ Seq.fill(40)(("y", "v"))
    val r = Wrangling.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r.getAs[Long]("n_obs") == 90L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  test("chi2Independence hits the χ² = N ceiling on a deterministic map") {
    // perfect association: b is a function of a ⇒ χ² = N·min(r−1, c−1),
    // Cramér's V = 1; the zero-observed off-diagonal cells MUST contribute
    // (each adds r·c/N) or the statistic comes out low
    val rows = Seq.fill(7)(("x", "u")) ++ Seq.fill(13)(("y", "v"))
    val r = Wrangling.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r.getAs[Double]("chi2") == 20.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  test("ksTwoSample: identical samples give D = 0, disjoint give D = 1") {
    val same = (1L to 50L).flatMap(v => Seq((v, true), (v, false)))
    val r0 = Wrangling.ksTwoSample(same.toDF("value", "isa"), 10L)
      .collect().head
    assert(r0.getAs[Double]("d_stat") == 0.0)
    assert(!r0.getAs[Boolean]("reject_05"))

    // sample A entirely below sample B ⇒ the CDF gap reaches 1 at the
    // boundary, and the split straddles a bucket edge (width 10) so the
    // cross-bucket offset path is exercised
    val disjoint = (1L to 25L).map(v => (v, true)) ++
      (26L to 50L).map(v => (v, false))
    val r1 = Wrangling.ksTwoSample(disjoint.toDF("value", "isa"), 10L)
      .collect().head
    assert(r1.getAs[Double]("d_stat") == 1.0)
    assert(r1.getAs[Boolean]("reject_05"))
  }

  test("ksTwoSample matches a single-partition prefix-sum computation") {
    // deterministic pseudo-random interleaving; recompute D the naive way
    val vals = (1L to 200L).map(v => (v * v % 97, v % 3 == 0))
    val r = Wrangling.ksTwoSample(vals.toDF("value", "isa"), 7L)
      .collect().head
    val n1 = vals.count(_._2).toDouble
    val n2 = vals.count(!_._2).toDouble
    val sorted = vals.groupBy(_._1).toSeq.sortBy(_._1)
    var c1 = 0L; var c2 = 0L; var best = 0.0
    sorted.foreach { case (_, vs) =>
      c1 += vs.count(_._2); c2 += vs.count(!_._2)
      best = math.max(best, math.abs(c1 / n1 - c2 / n2))
    }
    assert(math.abs(r.getAs[Double]("d_stat") - best) < 1e-6)
  }

  test("brownSmooth recovers a linear trend: steady-state forecast ≈ next value") {
    val base = java.sql.Date.valueOf("2024-01-01")
    val daily = (0 until 60)
      .map(i => (new java.sql.Date(base.getTime + i * 86400000L), (100 + 10 * i).toLong))
      .toDF("day", "n")
    val out = TimeSeries.brownSmooth(daily).orderBy(col("d").desc)
      .limit(1).collect().head
    // x_t = 100 + 10t: for α = 1/2 the double-smoothed forecast equals the
    // next value exactly in the untruncated limit; the 20-day horizon and
    // series start leave only a ~2^-15-weighted tail
    val expected = 100.0 + 10 * 60
    assert(math.abs(out.getAs[Double]("forecast_next") - expected) < 0.1,
      s"forecast ${out.getAs[Double]("forecast_next")} vs $expected")
    assert(math.abs(out.getAs[Double]("trend") - 10.0) < 0.01)
  }

  test("brownSmooth on a constant series: level ≈ c, trend ≈ 0, exact dyadics") {
    val base = java.sql.Date.valueOf("2024-01-01")
    val daily = (0 until 40)
      .map(i => (new java.sql.Date(base.getTime + i * 86400000L), 64L))
      .toDF("day", "n")
    val out = TimeSeries.brownSmooth(daily).orderBy(col("d").desc)
      .limit(1).collect().head
    // truncation tail of s2 is Σ_{k≥20}(k+1)2^-(k+2) = 11/2^20 of c
    assert(math.abs(out.getAs[Double]("level") - 64.0) < 64.0 * 1e-4)
    assert(math.abs(out.getAs[Double]("trend")) < 64.0 * 1e-4)
    // exactness: the result is a dyadic rational — re-running yields the
    // identical bit pattern (the oracle-hash property)
    val again = TimeSeries.brownSmooth(daily).orderBy(col("d").desc)
      .limit(1).collect().head
    assert(out.getAs[Double]("level") == again.getAs[Double]("level"))
  }

  test("hits computes exact integer scores on a hand-checked bipartite graph") {
    // c1(id 2) → s1(3), s2(5); c2(4) → s1(3)
    // a1: s1 = 2, s2 = 1;  h1: c1 = 3, c2 = 2;  a2: s1 = 5, s2 = 3
    val edges = Seq((2L, 3L), (2L, 5L), (4L, 3L)).toDF("src", "dst")
    val out = Graph.hits(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      ("authority", "s1", 1.0), ("authority", "s2", r9(3.0 / 5.0)),
      ("hub", "c1", 1.0), ("hub", "c2", r9(2.0 / 3.0))))
  }

  test("kmvPanel is exact below k members and exact on disjoint sets") {
    // universes smaller than k: the sketch holds every member, every
    // estimate must equal the exact count and every band hold trivially
    val h = ((1L to 10L).map(v => ("a", v * 1000)) ++
      (6L to 20L).map(v => ("b", v * 1000))).toDF("lang", "h")
    val out = operators.TextAnalysis.kmvPanel(h, "a", "b", k = 128)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out("a") == ((10L, 10.0, true)))
    assert(out("b") == ((15L, 15.0, true)))
    assert(out("union") == ((20L, 20.0, true)))
    assert(out("intersection") == ((5L, 5.0, true)))

    val disj = ((1L to 200L).map(v => ("a", v * 7919)) ++
      (1L to 200L).map(v => ("b", v * 7919 + 3))).toDF("lang", "h")
    val d = operators.TextAnalysis.kmvPanel(disj, "a", "b", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d("intersection") == 0.0) // no shared hash ever enters the vote
  }

  test("kmvPanel signature merge: sketch of union == k-smallest of merged parts") {
    // mergeability: computing the union estimate from all hashes equals
    // computing it after an arbitrary re-sharding (distinct ∘ concat)
    val h = ((1L to 300L).map(v => ("a", v * 104729)) ++
      (150L to 450L).map(v => ("b", v * 104729))).toDF("lang", "h")
    val r1 = operators.TextAnalysis.kmvPanel(h, "a", "b", k = 64).collect()
    val r2 = operators.TextAnalysis
      .kmvPanel(h.repartition(7), "a", "b", k = 64).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("hits counts duplicate edges once") {
    val edges = Seq((2L, 3L), (2L, 3L), (2L, 5L), (4L, 3L)).toDF("src", "dst")
    val dup = Graph.hits(edges).collect().map(_.toString).toSeq
    val ref = Graph.hits(Seq((2L, 3L), (2L, 5L), (4L, 3L)).toDF("src", "dst"))
      .collect().map(_.toString).toSeq
    assert(dup == ref)
  }

  test("pearsonSpearman: nonlinear monotone map has rho = 1, r < 1") {
    // y = x³ is strictly monotone (Spearman exactly 1 on tie-free ranks)
    // but convex (Pearson strictly below 1)
    val d = (1L to 40L).map(x => (x, x * x * x)).toDF("x", "y")
    val r = Wrangling.pearsonSpearman(d, 8L, 5000L).collect().head
    assert(r.getAs[Long]("n_rows") == 40L)
    assert(r.getAs[Double]("spearman_rho") == 1.0)
    assert(r.getAs[Double]("pearson_r") < 1.0 &&
      r.getAs[Double]("pearson_r") > 0.8)
  }

  test("pearsonSpearman: reversal gives rho = -1; ties average exactly") {
    val rev = (1L to 30L).map(x => (x, 31L - x)).toDF("x", "y")
    assert(Wrangling.pearsonSpearman(rev, 8L, 8L)
      .collect().head.getAs[Double]("spearman_rho") == -1.0)
    // all-y-tied: rank variance 0 ⇒ rho undefined ⇒ NULL, not a crash
    val tied = (1L to 10L).map(x => (x, 7L)).toDF("x", "y")
    assert(Wrangling.pearsonSpearman(tied, 8L, 8L)
      .collect().head.isNullAt(2))
  }

  test("modularity: two disjoint triangles split by component score 0.5") {
    // m = 6; each community: e_c = 3, d_c = 6 ⇒
    // Q = 2·(3/6 − (6/12)²) = 0.5, the textbook value
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val r = Graph.modularity(edges, labels).collect().head
    assert(r.getAs[Long]("n_nodes") == 6L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Double]("modularity") == 0.5)
  }

  test("modularity: everything in one community scores 0") {
    // single community: e_c = m and d_c = 2m ⇒ Q = 1 − 1 = 0
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "label")
    assert(Graph.modularity(edges, labels)
      .collect().head.getAs[Double]("modularity") == 0.0)
  }
}
