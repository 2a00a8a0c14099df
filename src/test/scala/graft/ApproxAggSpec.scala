package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch-based aggregates that have no SQL oracle
  * (values are engine-specific): HLL distinct counts and approximate
  * quantiles, both checked against their exact counterparts.
  */
class ApproxAggSpec extends SparkSuite {

  test("approx_count_distinct within 5% of exact per group") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("percentile_approx within 1% of exact percentile per group") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5D)").as("exact50"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx50"),
        expr("percentile(l_extendedprice, 0.95D)").as("exact95"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("approx95"))
      .collect()
    rows.foreach { r =>
      def relErr(e: Double, a: Double) = math.abs(a - e) / e
      assert(relErr(r.getAs[Double]("exact50"), r.getAs[Double]("approx50")) < 0.01)
      assert(relErr(r.getAs[Double]("exact95"), r.getAs[Double]("approx95")) < 0.01)
    }
  }
}
