package graft

import org.apache.spark.sql.functions._

/** Dev probe behind SURVEY §6's LSH scale measurement: times
  * [[operators.Similarity.lshTopK]] at the oracle-pinned default geometry
  * (4 bands × 4 bits) vs the scale-adjusted one (bits raised by ~log₂ of
  * the corpus growth) on the same directory.
  * `args: sfDir [bands bits] [only] [auto] [plan]` — `only` skips the
  * default pass (at the 100× corpus the 4×4 build spills ~77 GB and dies;
  * probing the next decade's block must not have to pay that first);
  * `auto` times [[operators.Similarity.lshTopKAuto]]'s in-plan chooser
  * instead of a fixed (bands, bits) block; `plan` prints the chooser
  * build's formatted physical plan and exits without timing anything.
  */
object LshScaleProbe {
  private val ModeFlags = Set("only", "auto", "plan")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    // numeric operands are bands/bits; word operands are mode flags —
    // anything else (e.g. a typo'd "12x") is an error, not a silent no-op
    val bad = args.drop(1).filterNot(a =>
      a.nonEmpty && (a.forall(_.isDigit) || ModeFlags(a)))
    require(bad.isEmpty,
      s"unrecognized operand(s) ${bad.mkString(",")}: expected integers or ${ModeFlags.mkString("/")}")
    val nums = args.drop(1).filter(_.forall(_.isDigit)).map(_.toInt)
    val bands = nums.headOption.getOrElse(4)
    val bits = nums.drop(1).headOption.getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Reducer width decoupled from core count (SPARK_GRAFT_SHUFFLE): the
    // band self-join + partial TopK aggregate run in the SAME stage, so
    // per-task partial state is bands·n·buffer / partitions and only
    // `cpus` tasks are live at once — at the 2 M decade, 32 partitions
    // hold ~20 M live buffers (~8 GB, the whole probe heap) where 512
    // bound live state at ~1.3 M (~0.5 GB). On a real cluster this is
    // just "partitions scale with data", the Sessions doc's contract; the
    // probe makes the knob explicit so the local rig can honor it.
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus).toInt
    val spark = Sessions.builder(s"local[$cpus]", width)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, dir, "embeddings")
    def timed(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      // warm + best-of-2, the Bench convention
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = build.count()
        Caches.release(spark); spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[lshprobe] $label rows=${ts.head._2} best=${ts.map(_._1).min}%.2f s")
    }
    if (args.contains("plan")) {
      println(operators.Similarity.lshTopKAuto(e, 5).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
      spark.stop(); return
    }
    if (!args.contains("only"))
      timed("default bands=4 bits=4")(operators.Similarity.lshTopK(e, 5, 4, 4))
    if (args.contains("auto"))
      timed("auto (in-plan chooser)")(operators.Similarity.lshTopKAuto(e, 5))
    else
      timed(s"scaled bands=$bands bits=$bits")(
        operators.Similarity.lshTopK(e, 5, bands, bits))
    spark.stop()
  }
}
