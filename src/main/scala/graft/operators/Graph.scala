package graft.operators

import graft.{Q, Tables}
import graft.functions.Deterministic.dsumFine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics (SURVEY.md §2.12 [EXT]): PageRank power
  * iteration over an edge list. Together with [[Dedup.connectedComponents]]
  * this covers the two graph shapes a data-curation pipeline actually runs:
  * duplicate-cluster resolution (CC) and authority scoring for crawl/source
  * prioritization (PageRank over a link-ish graph).
  *
  * Scale shape: each iteration is one equi-join of the rank vector against
  * the (out-degree-annotated, cached) edge list plus a two-phase aggregate —
  * both shuffle on the node key and are linear in |E|. The dangling-mass
  * scalar and |V| ride along as a broadcast single-row frame, never a
  * driver-side collect. Iterations unroll into the lineage like
  * [[Similarity.kmeansAssign]]'s Lloyd rounds (fixed small count, no
  * driver loop state beyond the loop index).
  *
  * Determinism (SURVEY.md §7.4): per-edge `rank/outdeg` and the damping
  * combine are single IEEE double operations; every SUM goes through the
  * order-independent decimal [[dsumFine]]; the oracle mirrors the exact
  * expression tree, so ranks hash-match DuckDB bit-for-bit.
  */
object Graph {

  private val Damping = 0.85
  private val Iters = 3

  /** Directed edges: who bought from whom — customer `c<id>` → supplier
    * `s<id>`, distinct. Suppliers have no out-edges, so the dangling-mass
    * path is genuinely exercised.
    */
  private def purchaseEdges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
  }

  /** PageRank with uniform teleport and dangling-mass redistribution:
    * rank'(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/N).
    */
  def pageRank(edges: DataFrame, iters: Int = Iters,
               damping: Double = Damping): DataFrame = {
    val nodes = graft.Caches.track(
      edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct())
    val deg = edges.groupBy("src").agg(count(lit(1)).as("cnt"))
    // out-degree rides the cached edge list: joined once, reused per round
    val edgesDeg = graft.Caches.track(edges.join(deg, "src"))
    val meta = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(meta))
      .select(col("id"), (lit(1.0) / col("n")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(edgesDeg, col("id") === col("src"))
        .groupBy(col("dst").as("cid"))
        .agg(dsumFine(col("pr") / col("cnt")).as("contrib"))
      // SUM over zero rows is NULL — a graph with no dangling nodes (every
      // node has out-edges, e.g. a cycle) must contribute 0, not null-poison
      // every rank
      val dangling = ranks.join(deg, col("id") === col("src"), "left_anti")
        .agg(coalesce(dsumFine(col("pr")), lit(0.0)).as("dang"))
      ranks = nodes
        .join(contrib, col("id") === col("cid"), "left")
        .crossJoin(broadcast(dangling.crossJoin(meta)))
        .select(col("id"),
          (lit(1.0 - damping) / col("n") + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dang") / col("n"))).as("pr"))
    }
    ranks
  }

  private def iterSql(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""c$i AS (SELECT e.dst AS cid,
       |    CAST(SUM(CAST(r.pr / e.cnt AS DECIMAL(38,20))) AS DOUBLE) AS contrib
       |  FROM $prev r JOIN ed e ON r.id = e.src GROUP BY e.dst),
       |d$i AS (SELECT COALESCE(CAST(SUM(CAST(pr AS DECIMAL(38,20))) AS DOUBLE),
       |                        CAST(0 AS DOUBLE)) AS dang
       |  FROM $prev WHERE id NOT IN (SELECT src FROM ed)),
       |r$i AS (SELECT nodes.id,
       |    CAST(${1.0 - Damping} AS DOUBLE) / meta.n + CAST($Damping AS DOUBLE) *
       |      (COALESCE(c$i.contrib, CAST(0 AS DOUBLE)) + d$i.dang / meta.n) AS pr
       |  FROM nodes CROSS JOIN meta CROSS JOIN d$i
       |  LEFT JOIN c$i ON c$i.cid = nodes.id)""".stripMargin
  }

  private val graphPagerank = Q(
    "graph_pagerank",
    (s, dir) => {
      // global top-20: tiny k over the node set — TakeOrderedAndProject
      // territory, same as topk_orders
      pageRank(purchaseEdges(s, dir))
        .orderBy(round(col("pr"), 9).desc, col("id")).limit(20)
        .select(col("id"), round(col("pr"), 9).as("pr"))
    },
    Some("""WITH e AS (SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
           |deg AS (SELECT src, count(*) AS cnt FROM e GROUP BY src),
           |ed AS (SELECT e.src, e.dst, deg.cnt FROM e JOIN deg ON deg.src = e.src),
           |meta AS (SELECT count(*) AS n FROM nodes),
           |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / meta.n AS pr FROM nodes CROSS JOIN meta),
           |""".stripMargin +
      (1 to Iters).map(iterSql).mkString(",\n") + "\n" +
      s"""SELECT id, round(pr, 9) AS pr FROM r$Iters
         |ORDER BY round(pr, 9) DESC, id LIMIT 20""".stripMargin))

  val queries: Seq[Q] = Seq(graphPagerank)
}
