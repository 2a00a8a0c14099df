package graft.tools

import graft.{Queries, Sessions}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only plan inspector: print node-type counts (pre-execution formatted
  * plan AND post-execution adaptive plan) plus executed job/stage counts for
  * named queries, so PlanSpec pins are set from measured shapes, not guesses.
  * Usage: runMain graft.tools.PlanProbe <sfDir> <query> [query ...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names @ _*) = args
    val spark = Sessions.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    // word-anchored so "Exchange" never counts BroadcastExchange /
    // ReusedExchange occurrences (etc.) — pins derived from these numbers
    // must measure the node they name
    def counts(p: String): String =
      Seq("HashAggregate", "SortMergeJoin", "BroadcastHashJoin",
        "InMemoryTableScan", "ReusedExchange", "Union", "Window", "Exchange",
        "Scan parquet", "FullOuter")
        .map(k => s"$k=${s"\\b${k.replace(" ", "\\s")}\\b".r.findAllIn(p).size}")
        .mkString(" ")
    names.foreach { n =>
      val df = Queries.byName(n).run(spark, sfDir)
      println(s"PROBE $n pre : ${counts(df.queryExecution.explainString(FormattedMode))}")
      jobs.set(0); stages.set(0)
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      println(s"PROBE $n post: ${counts(df.queryExecution.executedPlan.toString)}")
      println(s"PROBE $n exec: jobs=${jobs.get} stages=${stages.get}")
      graft.Caches.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
