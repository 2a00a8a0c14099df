package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom bounded-heap grouped top-k: result parity with the window
  * formulation, two-phase physical plan (partial → exchange → final), and
  * edge cases (k larger than group, single group).
  */
class TopKPerGroupSpec extends SparkSuite {

  private lazy val orders = Tables.load(spark, sfDir, "orders")

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
  }

  private def customTopK(k: Int) =
    TopK.perGroup(orders, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")

  test("matches the window row_number formulation exactly") {
    for (k <- Seq(1, 3, 10)) {
      val want = windowTopK(k).collect().map(_.toSeq).toSet
      val got = customTopK(k).collect().map(_.toSeq).toSet
      assert(got == want, s"k=$k: missing=${want.diff(got).size} extra=${got.diff(want).size}")
    }
  }

  test("plans as partial topk -> exchange -> final topk (map-side combine)") {
    val p = customTopK(3).queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(p).size == 2, p)
    assert(p.contains(", 3, true") && p.contains(", 3, false"), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    // crucially: NO sort below the exchange (the window formulation has one)
    val windowPlan = windowTopK(3).queryExecution.executedPlan.toString
    assert(windowPlan.contains("Sort "), windowPlan)
  }

  test("optimizer rule rewrites row_number()<=k windows into the heap operator") {
    spark.sparkContext
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val ext = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val o = Tables.load(ext, sfDir, "orders")
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("TopKPerGroup"), opt)
      assert(!opt.contains("Window ["), opt)
      // and rows are identical to the unrewritten session's
      val want = windowTopK(3).collect().map(_.toSeq).toSet
      assert(df.collect().map(_.toSeq).toSet == want)
      // rank still projected => NOT rewritten (rule must preserve output)
      val keepRank = o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3).select("o_orderkey", "rk")
      assert(!keepRank.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"))
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("k larger than every group returns all rows") {
    val small = orders.limit(50)
    val got = TopK.perGroup(small, Seq("o_orderstatus"),
      Seq(col("o_orderkey")), k = 1000000).count()
    assert(got == 50)
  }

  test("single-group top-k equals global orderBy/limit") {
    val got = TopK.perGroup(orders.withColumn("g", lit(1)), Seq("g"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val want = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5).select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }
}
