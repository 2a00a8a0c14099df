package graft
import org.apache.spark.sql.functions._

object DecProbe {
  def main(args: Array[String]): Unit = {
    val bypass = sys.env.getOrElse("BYPASS", "200")
    val spark = Sessions.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", bypass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(b: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
      println(f"DECPROBE bypass=$bypass $label best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def base(n: Int) = spark.range(0, 100000L, 1, n).select(col("id"), (col("id") % 97).as("k"))
    def agg(n: Int) = base(n).groupBy("k").count()
    time("exch_in32 ") { agg(32).write.format("noop").mode("overwrite").save() }
    time("exch_in8  ") { agg(8).write.format("noop").mode("overwrite").save() }
    // a beefier shuffle: 600k lineitem-ish rows
    val big = spark.range(0, 600000L, 1, 32).select(col("id"), (col("id") % 10007).as("k"), rand(5).as("v"))
    time("big_group ") { big.groupBy("k").agg(sum(col("v"))).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
