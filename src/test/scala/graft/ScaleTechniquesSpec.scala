package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The 100 TB plan-shape techniques that small-scale correctness tests can't
  * see: salt-spread skew joins and bucketed (exchange-free) co-located joins.
  */
class ScaleTechniquesSpec extends SparkSuite {

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.salted(
        orders.withColumnRenamed("o_custkey", "custkey"),
        customer.withColumnRenamed("c_custkey", "custkey"),
        "custkey", salt = 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join key includes the salt column (hot key spreads over reducers)") {
    val orders = Tables.load(spark, sfDir, "orders").withColumnRenamed("o_custkey", "custkey")
    val customer = Tables.load(spark, sfDir, "customer").withColumnRenamed("c_custkey", "custkey")
    val p = SkewJoin.salted(orders, customer, "custkey", salt = 8)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("__salt"), p)
  }

  test("bucketed tables join without any exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
      Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      Tables.load(spark, sfDir, "customer")
        .select("c_custkey", "c_mktsegment")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bkt")
      val joined = spark.table("orders_bkt").join(spark.table("customer_bkt"),
        col("o_custkey") === col("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      // co-located bucketed scans satisfy the join's distribution directly
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(p.contains("SortMergeJoin"), p)
      // and the result is still correct
      assert(joined.count() ==
        Tables.load(spark, sfDir, "orders").join(
          Tables.load(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("scale defaults are valid, typed SQL confs that land in a session") {
    // the SQL keys are runtime-settable: applying them to a live session
    // validates key names AND value syntax (a typo'd key or a malformed
    // size literal throws), and the session reads them back. Core keys
    // (spark.memory.*) are STATIC — only settable at builder time — so
    // they are asserted on the map, not round-tripped through a session.
    val (core, sql) = Sessions.scaleDefaults.partition(k =>
      k._1.startsWith("spark.memory.") || k._1.startsWith("spark.shuffle."))
    assert(core.keySet == Set("spark.memory.storageFraction",
      "spark.shuffle.sort.bypassMergeThreshold"))
    val saved = sql.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      sql.foreach { case (k, v) => spark.conf.set(k, v) }
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "64m")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // the static fraction must parse as a fraction in [0, 1]
    val f = Sessions.scaleDefaults("spark.memory.storageFraction").toDouble
    assert(f > 0.0 && f < 1.0)
    // and the builder carries every default (fresh-session path used by the
    // driver mains — same map, so no drift between builder and assertions)
    assert(Sessions.scaleDefaults.contains("spark.sql.adaptive.skewJoin.skewedPartitionFactor"))
    assert(Sessions.scaleDefaults("spark.sql.files.maxPartitionBytes") == "134217728")
  }
}
