package graft

import java.sql.Timestamp

import graft.streaming.Observability
import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `Dataset.observe` metrics piggybacking on the consuming action — no
  * second scan in batch, per-micro-batch reporting in streaming.
  */
class ObservabilitySpec extends SparkSuite {

  test("batch ingest metrics ride the consuming action and match direct computation") {
    val docs = Tables.load(spark, sfDir, "documents")
    val obs = Observation("ingest_gate")
    val observed = Observability.withIngestMetrics(docs, obs,
      nullCols = Seq("lang"), measure = "n_chars")
    val written = observed.filter(col("n_chars") >= 0).count() // the one action
    val m = obs.get
    assert(m("n_rows") == docs.count())
    assert(m("n_rows") == written)
    assert(m("lang_nulls") == 0L)
    val (mn, mx) = (m("measure_min").asInstanceOf[Long],
      m("measure_max").asInstanceOf[Long])
    val direct = docs.agg(min("n_chars"), max("n_chars")).collect().head
    assert(mn == direct.getLong(0) && mx == direct.getLong(1))
  }

  test("withIngestMetrics surfaces per-micro-batch metrics in streaming progress") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val observed = Observability.withIngestMetrics(
      input.toDF().toDF("ts", "event_type", "value"),
      "batch_gate", Seq("event_type"), "value")
    val q = observed.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    def t(min: Int) = new Timestamp(3600000L + min * 60000L)
    try {
      input.addData((t(1), "view", 1.0), (t(2), null, 4.0), (t(3), "click", 9.0))
      q.processAllAvailable()
      val progress = q.recentProgress
        .filter(p => p.observedMetrics.containsKey("batch_gate"))
      assert(progress.nonEmpty, "no observed metrics in any progress event")
      val m = progress.last.observedMetrics.get("batch_gate")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("event_type_nulls") == 1L)
      assert(m.getAs[Double]("measure_min") == 1.0)
      assert(m.getAs[Double]("measure_max") == 9.0)
    } finally q.stop()
  }
}
