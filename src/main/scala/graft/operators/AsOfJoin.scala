package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J6): for every left row, attach the greatest
  * right-side timestamp (and a chosen payload) with `rightTs <= leftTs` for
  * the same key — "most recent right event at or before the left event".
  *
  * Spark has no native as-of join. Instead of a per-key cross product, we
  * union-tag both sides and run one window pass:
  *
  *   1. tag right rows side=0, left rows side=1 (right sorts first on ties so
  *      an exactly-equal timestamp counts as "prior or equal");
  *   2. sort by (key, ts, side) inside a single `Window.partitionBy(key)`;
  *   3. `last(rightTs, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
  *      carries the latest right timestamp forward onto each left row.
  *
  * Cost at scale: ONE hash shuffle of |L|+|R| rows on the key plus a
  * per-partition sort — the same shape as a sort-merge join, with no risk of
  * row explosion. Skewed keys behave like any skewed aggregation (AQE salting
  * applies). This is the standard large-scale formulation (a translation of
  * the reference's event-at-or-before lookup; cf. EventBridge->job ordering,
  * /root/reference/health-etl/main.tf:182-193 — control-plane only there).
  */
object AsOfJoin {

  /** @param left      rows to enrich (keeps all its columns)
    * @param right     lookup side
    * @param key       equi-join key column name (present in both)
    * @param leftTs    timestamp column name in `left`
    * @param rightTs   timestamp column name in `right`
    * @param asOfCol   output column name for the matched right timestamp
    * @param forward   false = latest right at-or-before (default);
    *                  true = earliest right at-or-after (the same window
    *                  pass over a reversed sort)
    */
  /** @param toleranceSec when set, a carried match farther than this many
    *                     seconds from the left timestamp is nulled — the
    *                     feature-store staleness bound ("use the latest
    *                     price, but never one older than 30 minutes").
    *                     Applied AFTER the carry, which is equivalent to
    *                     restricting the search window: any in-window right
    *                     row would itself be the carried latest.
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String,
            asOfCol: String = "asof_ts",
            forward: Boolean = false,
            toleranceSec: Option[Long] = None): DataFrame = {
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"),
      col(rightTs).as("__carry"), lit(0).as("__side"))
    val l = left
      .withColumn("__k", col(key)).withColumn("__t", col(leftTs))
      .withColumn("__carry", lit(null).cast(r.schema("__carry").dataType))
      .withColumn("__side", lit(1))
    // ties: right (side 0) sorts first either direction, so an exactly-equal
    // timestamp counts as "at-or-before" / "at-or-after"
    val ord = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy("__k").orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn(asOfCol, last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    toleranceSec.fold(joined.drop("__k", "__t", "__carry", "__side")) { tol =>
      // exact integer-µs gap test, sign per direction
      val gap =
        if (forward) expr(s"unix_micros($asOfCol)") - expr("unix_micros(__t)")
        else expr("unix_micros(__t)") - expr(s"unix_micros($asOfCol)")
      joined.withColumn(asOfCol,
          when(gap <= tol * 1000000L, col(asOfCol)))
        .drop("__k", "__t", "__carry", "__side")
    }
  }

  /** Nearest as-of join: the closest right timestamp in EITHER direction
    * (ties at equal distance resolve backward — the earlier event). Both
    * directional carries ride ONE shuffle: right rows enter the union
    * twice, tagged side 0 (sorts before left rows at equal ts — the
    * at-or-before carry) and side 2 (sorts after — the at-or-after carry).
    * Each carry is a running `last(..., ignoreNulls)` over an
    * UNBOUNDED PRECEDING..CURRENT frame — the forward one over a DESCENDING
    * sort rather than a current..following frame, because Spark executes
    * unbounded-FOLLOWING frames by re-scanning to the partition end per row
    * (O(rows²) on a hot key) while the running-preceding frame is a single
    * forward pass. The two sorts share one exchange of |L|+2|R| rows. The
    * winner is picked by epoch gap arithmetic — plain integer compares, no
    * interval types.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String,
              asOfCol: String = "nearest_ts"): DataFrame = {
    val rBack = right.select(
      col(key).as("__k"), col(rightTs).as("__t"),
      col(rightTs).as("__back"), lit(null).cast(right.schema(rightTs).dataType)
        .as("__fwd"), lit(0).as("__side"))
    val rFwd = right.select(
      col(key).as("__k"), col(rightTs).as("__t"),
      lit(null).cast(right.schema(rightTs).dataType).as("__back"),
      col(rightTs).as("__fwd"), lit(2).as("__side"))
    val l = left
      .withColumn("__k", col(key)).withColumn("__t", col(leftTs))
      .withColumn("__back", lit(null).cast(right.schema(rightTs).dataType))
      .withColumn("__fwd", lit(null).cast(right.schema(rightTs).dataType))
      .withColumn("__side", lit(1))
    // ascending pass: at equal ts the side-0 right row precedes left (side
    // 1) → at-or-before. Descending pass: at equal ts the side-2 right row
    // precedes left (side 2 sorts first under desc) → at-or-after.
    val wb = Window.partitionBy("__k").orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("__k").orderBy(col("__t").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rBack, allowMissingColumns = true)
      .unionByName(rFwd, allowMissingColumns = true)
      .withColumn("__b", last(col("__back"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__fwd"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn(asOfCol,
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(unix_micros(col("__t")) - unix_micros(col("__b")) <=
            unix_micros(col("__f")) - unix_micros(col("__t")), col("__b"))
          .otherwise(col("__f")))
      .drop("__k", "__t", "__back", "__fwd", "__side", "__b", "__f")
  }
}
