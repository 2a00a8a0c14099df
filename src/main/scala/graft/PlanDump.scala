package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dev utility: print a declared query's physical plan by name —
  * `args: queryName [sfDir] [simple|formatted]`. The .explain feedback loop
  * the build workflow runs after every operator, packaged so it doesn't
  * need a console session.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Sessions.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Queries.byName(name).run(spark, dir)
    if (args.length > 2 && args(2) == "simple")
      println(df.queryExecution.executedPlan.toString)
    else println(df.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
