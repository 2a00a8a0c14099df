package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog register algebra — the single implementation behind the
  * batch distinct estimate (`text_hll_distinct`), the windowed rolling
  * merge (`events_hll_rolling`), and streaming register maintenance.
  *
  * m = 64 registers from the engine-portable md5-derived 32-bit hash
  * ([[Deterministic.md5Hash32]]): idx = h mod 64; the register keeps the
  * MAX of rho = leading-zero rank of the remaining 26 bits, computed as
  * exact integer bit-length logic (`bin()` string length — identical
  * semantics in Spark and DuckDB, no log2 rounding at powers of two).
  *
  * Merge = cell-wise MAX: associative, commutative, idempotent. That single
  * property is what makes the sketch composable every way a 100 TB pipeline
  * needs — shard partials combine map-side (a plain two-phase aggregate),
  * window merges take the max over member-period register tables, and a
  * STREAMING aggregation over (group, idx) maintains the exact same table
  * with constant 64-cells-per-group state under any micro-batching
  * (HllSpec proves stream ≡ batch under uneven chunking).
  */
object Hll {

  val M = 64
  /** Bias-correction constant for m = 64; interpolate [[alphaLiteral]] into
    * oracle SQL so both engines use the identical IEEE value.
    */
  val Alpha: Double = 0.7213 / (1 + 1.079 / M)
  def alphaLiteral: String = java.lang.Double.toString(Alpha)

  /** (g, idx, mreg) register table for distinct-`key` per `group`. Works
    * unchanged on a STREAMING frame: it is one groupBy aggregation whose
    * state is a constant M cells per group (complete/update output modes).
    */
  def registers(df: DataFrame, group: Column, key: Column): DataFrame = {
    val h = Deterministic.md5Hash32(key)
    df.select(group.as("g"), pmod(h, lit(M)).as("idx"),
        shiftright(h, 6).as("v"))
      .groupBy("g", "idx")
      .agg(max(when(col("v") === 0, lit(27))
        .otherwise(lit(27) - length(bin(col("v"))))).as("mreg"))
  }

  /** (g, used, e) estimate from a (g, idx, mreg) register table: the
    * standard bias-corrected harmonic mean Alpha·m²/Σ2^−Mⱼ with
    * linear-counting fallback below 2.5·m while empty registers remain.
    * Each 2^−Mⱼ is an exact dyadic DECIMAL(38,30), so the harmonic sum is
    * order-independent; every division is double/double.
    */
  def estimate(regs: DataFrame): DataFrame = {
    val dec30 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 30)
    val agg = regs.groupBy("g")
      .agg(count(lit(1)).as("used"),
        (sum(pow(lit(2.0), -col("mreg")).cast(dec30)).cast("double")
          + (lit(M) - count(lit(1)))).as("zsum"))
    val eRaw = lit(Alpha) * lit(M * M) / col("zsum")
    val vz = lit(M) - col("used")
    agg.select(col("g"), col("used"),
      when(eRaw <= 2.5 * M && vz > 0,
        lit(M) * log(lit(M.toDouble) / vz)).otherwise(eRaw).as("e"))
  }
}
