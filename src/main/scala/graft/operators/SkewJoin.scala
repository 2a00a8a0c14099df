package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual salting for skew-heavy equi-joins (SURVEY.md §7.5). AQE's skew-join
  * split handles most cases at runtime; salting is the plan-level tool when a
  * handful of hot keys would still overwhelm single reducers (the classic
  * power-law user_id / null-key case at 100 TB).
  *
  * `fact` rows get a per-row salt in [0, salt); the (small) `dim` side is
  * replicated `salt`× with every salt value, so the join key becomes
  * (key, salt) and one hot key fans out over `salt` reducers. Results are
  * identical to the unsalted join — every fact row still meets its dim row
  * exactly once; only the partitioning changes.
  */
object SkewJoin {

  def salted(fact: DataFrame, dim: DataFrame, key: String,
             salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // any well-spread deterministic per-row value works; the partition-local
    // row id is free (no extra hash pass over data columns)
    val sf = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    sf.join(sd, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
