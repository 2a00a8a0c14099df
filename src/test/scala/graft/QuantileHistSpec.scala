package graft

import graft.functions.QuantileHist
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The quantile member of the mergeable-sketch streaming story (HllSpec,
  * CmsSpec, KmvSpec are the others): cell-wise ADD composes across shards
  * and micro-batches, the cumulative readout interpolates the target rank,
  * and the rank guarantee is deterministic.
  */
class QuantileHistSpec extends SparkSuite {

  import spark.implicits._

  private val vals: Seq[(String, Double)] =
    (1 to 500).map(i => ("a", (i % 100).toDouble + 0.5)) ++
      (1 to 300).map(i => ("b", (i % 37).toDouble * 3.0))

  private def cellSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("streaming cell maintenance equals one batch pass") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val cells = QuantileHist.cells(input.toDF().toDF("g", "v"), col("g"), col("v"))
    val q = cells.writeStream.format("memory").queryName("qh_cells")
      .outputMode("complete").start()
    try {
      input.addData(vals.take(17): _*)
      q.processAllAvailable()
      input.addData(vals.drop(17): _*)
      q.processAllAvailable()
      val streamed = cellSet(spark.table("qh_cells"))
      val batch = cellSet(QuantileHist.cells(vals.toDF("g", "v"), col("g"), col("v")))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("shard merge equals cells of the union; estimates unchanged") {
    val (l, r) = vals.splitAt(333)
    val merged = QuantileHist.merge(
      QuantileHist.cells(l.toDF("g", "v"), col("g"), col("v")),
      QuantileHist.cells(r.toDF("g", "v"), col("g"), col("v")))
    val whole = QuantileHist.cells(vals.toDF("g", "v"), col("g"), col("v"))
    assert(cellSet(merged) == cellSet(whole))
    val em = QuantileHist.quantiles(merged, Seq(0.5, 0.9)).collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3))).toMap
    val ew = QuantileHist.quantiles(whole, Seq(0.5, 0.9)).collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3))).toMap
    assert(em == ew, "merged sketch must answer identically to the whole-pass sketch")
  }

  test("rank guarantee: every estimate sits within binWidth of the target-rank order statistic") {
    val w = 2.0 // (512 - 0) / 256
    val cells = QuantileHist.cells(vals.toDF("g", "v"), col("g"), col("v"))
    val est = QuantileHist.quantiles(cells, Seq(0.1, 0.5, 0.9, 0.99)).collect()
    val byG = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    est.foreach { r =>
      val (g, q, n, e) = (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
      val tr = math.max(math.min(math.ceil(q * n).toLong, n), 1L).toInt
      val xTr = byG(g)(tr - 1)
      assert(math.abs(e - xTr) <= w,
        f"g=$g q=$q: est $e%.3f vs x($tr)=$xTr%.3f exceeds bin width $w")
    }
  }
}
