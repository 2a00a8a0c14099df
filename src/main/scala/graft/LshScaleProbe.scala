package graft

import org.apache.spark.sql.functions._

/** Dev probe behind SURVEY §6's LSH scale measurement: times
  * [[operators.Similarity.lshTopK]] at the oracle-pinned default geometry
  * (4 bands × 4 bits) vs the scale-adjusted one (bits raised by ~log₂ of
  * the corpus growth) on the same directory.
  * `args: sfDir [bands bits [only]]` — `only` skips the default pass
  * (at the 100× corpus the 4×4 build spills ~77 GB and dies; probing the
  * next decade's block must not have to pay that first).
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bands = if (args.length > 1) args(1).toInt else 4
    val bits = if (args.length > 2) args(2).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, dir, "embeddings")
    def time(label: String, bands: Int, bits: Int): Unit = {
      // warm + best-of-2, the Bench convention
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = operators.Similarity.lshTopK(e, 5, bands, bits).count()
        Caches.release(spark); spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[lshprobe] $label bands=$bands bits=$bits " +
        f"rows=${ts.head._2} best=${ts.map(_._1).min}%.2f s")
    }
    if (!args.contains("only")) time("default", 4, 4)
    time("scaled", bands, bits)
    spark.stop()
  }
}
