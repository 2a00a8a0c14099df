package graft
import org.apache.spark.sql.functions._

object DecProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(0, 50000L, 1, 32)
      .select((col("id") % 3000).as("src"), (col("id") % 7001).as("dst"), lit(1.0).as("cnt"))
    val nodes = spark.range(0, 3000L, 1, 32).select(col("id"))
    val edB = edges.repartition(col("src")).persist(); edB.count()
    val ndB = nodes.repartition(col("id")).persist(); ndB.count()
    def iter(ranks: org.apache.spark.sql.DataFrame) = {
      val contrib = ranks.join(edB, col("id") === col("src"))
        .groupBy(col("dst").as("cid")).agg(sum(col("pr") / col("cnt")).as("contrib"))
      ndB.join(contrib, col("id") === col("cid"), "left")
        .select(col("id"), coalesce(col("contrib"), lit(0.0)).as("pr"))
    }
    val r0 = ndB.select(col("id"), lit(1.0).as("pr"))
    val r2 = iter(iter(r0))
    r2.count()
    val plan = r2.queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println(plan.split("\n").filter(s => s.contains("Exchange") || s.contains("Join") || s.contains("InMemory")).map(_.take(120)).mkString("\n"))
    def time(label: String)(b: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
      println(f"DECPROBE $label best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("persist coPart 2iter") { r2.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
