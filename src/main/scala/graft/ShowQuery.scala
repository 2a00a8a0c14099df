package graft

/** Dev utility: print a declared query's result rows by name —
  * `args: queryName [sfDir] [maxRows]`. Companion to [[PlanDump]] (plans)
  * and [[BenchOne]] (timings): the value-readout third of the per-operator
  * feedback loop, packaged so it doesn't need a console session.
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 50
    val spark = Sessions.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.byName(name).run(spark, dir).show(n, false)
    spark.stop()
  }
}
