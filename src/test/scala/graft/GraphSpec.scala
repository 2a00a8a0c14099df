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
}
