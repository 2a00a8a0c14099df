package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev profiling: execute one declared query and print the FINAL physical
  * plan tree with each operator's runtime SQL metrics (rows, time, spill…) —
  * the SQL-tab view (guide §7.1) for a headless sandbox.
  * `runMain graft.MetricsDump <query> [sfDir]`. Runs twice, prints the
  * second (warm) execution.
  */
object MetricsDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count()
    Caches.release(spark); spark.catalog.clearCache()
    val df = fn(spark, sfDir)
    val t0 = System.nanoTime()
    df.collect()
    println(f"[metrics] $name warm wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (_, m) =>
        m.value > 0 && (m.name.exists(n => n.contains("time") ||
          n.contains("rows") || n.contains("spill") || n.contains("size")) ||
          Seq("numOutputRows", "buildTime", "collectTime").contains(m.metricType))
      }
      val ms = p.metrics.toSeq.sortBy(_._1).collect {
        case (k, m) if m.value != 0 => s"$k=${m.value}"
      }.mkString(" ")
      val _ = interesting
      println(("  " * depth) + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach { sq => println(("  " * (depth + 1)) + "SUBQUERY:"); walk(sq, depth + 2) }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
