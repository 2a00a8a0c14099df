package graft.operators

import graft.{Q, Tables}
import graft.functions.Deterministic._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the event stream (SURVEY.md §2 [EXT]):
  * weekday seasonality, CUSUM changepoint detection, and lag-k
  * autocorrelation — the monitoring primitives that read a pipeline's own
  * volume curve (is throughput periodic, did the distribution shift, and
  * when).
  *
  * Scale shape shared by all three: the raw event stream reduces to the
  * DAILY frame by one two-phase hash aggregate (linear at any scale), and
  * everything downstream — windows included — runs over that day-cardinality
  * frame (years of data = thousands of rows), the same bounded-frame window
  * stance as `text_vocab`'s per-partition ranking. Determinism (SURVEY.md
  * §7.4): day keys are integers, means are exact-integer-sum ÷ count,
  * weekday comes from epoch-day mod 7 (no engine locale), and ordered
  * running sums accumulate in the identical day order on both engines.
  */
object TimeSeries {

  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  /** Weekday seasonal profile: each weekday's mean daily volume against the
    * global mean — the seasonal-index half of a classic decomposition
    * (volume(d) ≈ trend · index(dow)). Weekday = epoch-day mod 7
    * (0 = Thursday, locale-free on every engine). Two aggregates over the
    * daily frame + a broadcast 1-row global mean.
    */
  private val eventsSeasonal = Q(
    "events_seasonal",
    (s, dir) => {
      val d = daily(s, dir).select(col("n"), (unix_date(col("day")) % 7).as("dow"))
      val g = d.agg((sum(col("n")).cast("double") / count(lit(1))).as("gmean"))
      d.groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
          (sum(col("n")).cast("double") / count(lit(1))).as("mean_n"))
        .crossJoin(broadcast(g))
        .select(col("dow"), col("n_days"), round(col("mean_n"), 6).as("mean_n"),
          round(col("mean_n") / col("gmean"), 6).as("seasonal_index"))
        .orderBy("dow")
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
           |               FROM events GROUP BY 1),
           |d AS (SELECT n, datediff('day', DATE '1970-01-01', day) % 7 AS dow
           |      FROM daily),
           |g AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS gmean FROM d)
           |SELECT dow, count(*) AS n_days,
           |  round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_n,
           |  round((CAST(sum(n) AS DOUBLE) / count(*)) / gmean, 6) AS seasonal_index
           |FROM d CROSS JOIN g GROUP BY dow, gmean ORDER BY dow""".stripMargin))

  /** CUSUM changepoint detection on daily volume: the running sum of
    * (n − mean) peaks in magnitude at the most likely level-shift point;
    * report that day with the mean before and after it. The running sum
    * orders by day over the DAILY frame (bounded, see object doc); the
    * split means are one more aggregate against the broadcast 1-row argmax.
    * Determinism: deviations accumulate in day order on both engines
    * (identical FP sequence); the argmax breaks ties on the earlier day.
    */
  private val eventsChangepoint = Q(
    "events_changepoint",
    (s, dir) => {
      val d = daily(s, dir)
      val g = d.agg((sum(col("n")).cast("double") / count(lit(1))).as("gmean"),
        count(lit(1)).as("n_days"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // cusum_k = Σ_{i≤k}(n_i − mean) = prefix_sum(n) − k·mean: the prefix
      // sum stays on exact integers (order/tree-shape independent — a
      // double running sum would expose Spark-sequential vs DuckDB-segment-
      // tree accumulation order), and the float enters once per row
      val cusum = d.crossJoin(broadcast(g))
        .withColumn("cusum",
          sum(col("n")).over(w).cast("double")
            - row_number().over(Window.orderBy("day")) * col("gmean"))
      val peak = cusum
        .orderBy(abs(col("cusum")).desc, col("day")).limit(1)
        .select(col("day").as("change_day"), col("cusum").as("peak_cusum"))
      d.crossJoin(broadcast(peak))
        .agg(
          first(col("change_day"), ignoreNulls = true).as("change_day"),
          round(first(col("peak_cusum"), ignoreNulls = true), 6).as("peak_cusum"),
          round(sum(when(col("day") <= col("change_day"), col("n")))
            .cast("double") /
            count(when(col("day") <= col("change_day"), 1)), 6).as("mean_before"),
          round(sum(when(col("day") > col("change_day"), col("n")))
            .cast("double") /
            count(when(col("day") > col("change_day"), 1)), 6).as("mean_after"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
           |               FROM events GROUP BY 1),
           |g AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS gmean FROM daily),
           |c AS (SELECT day, n,
           |        CAST(sum(n) OVER (ORDER BY day
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           |        - row_number() OVER (ORDER BY day) * gmean AS cusum
           |      FROM daily CROSS JOIN g),
           |peak AS (SELECT day AS change_day, cusum AS peak_cusum FROM c
           |         ORDER BY abs(cusum) DESC, day LIMIT 1)
           |SELECT change_day, round(peak_cusum, 6) AS peak_cusum,
           |  round(CAST(sum(CASE WHEN day <= change_day THEN n END) AS DOUBLE)
           |        / count(CASE WHEN day <= change_day THEN 1 END), 6) AS mean_before,
           |  round(CAST(sum(CASE WHEN day > change_day THEN n END) AS DOUBLE)
           |        / count(CASE WHEN day > change_day THEN 1 END), 6) AS mean_after
           |FROM daily CROSS JOIN peak
           |GROUP BY change_day, peak_cusum""".stripMargin))

  /** Lag-k autocorrelation of daily volume for k = 1..7 — the periodicity
    * probe (a weekly cycle shows as a peak at k = 7). Pairs come from an
    * equi-join of the daily frame against itself on `day + k` (a key join,
    * never a window shift per lag); numerator products sum in fine decimal
    * so the estimate is partition-order-independent. Denominator and mean
    * ride the same broadcast 1-row moments frame.
    */
  private val eventsAutocorr = Q(
    "events_autocorr",
    (s, dir) => {
      val d = daily(s, dir)
      val mean = d.agg((sum(col("n")).cast("double") / count(lit(1))).as("m"))
      val g = d.crossJoin(broadcast(mean))
        .agg(first(col("m")).as("m"),
          dsumFine((col("n") - col("m")) * (col("n") - col("m"))).as("ss"))
      val lags = d.select(col("day"), col("n"),
        explode(sequence(lit(1), lit(7))).as("lag"))
        .select(col("n").as("n0"), col("lag"),
          date_add(col("day"), col("lag")).as("day"))
      val joined = lags.join(d, "day")
      joined.crossJoin(broadcast(g))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          round(dsumFine((col("n0") - col("m")) * (col("n") - col("m"))) /
            first(col("ss")), 6).as("autocorr"))
        .orderBy("lag")
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
           |               FROM events GROUP BY 1),
           |mean AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS m FROM daily),
           |g AS (SELECT m,
           |        CAST(SUM(CAST((n - m) * (n - m) AS DECIMAL(38,20)))
           |          AS DOUBLE) AS ss
           |      FROM daily CROSS JOIN mean GROUP BY m),
           |lags AS (SELECT d0.n AS n0, lag, d0.day + CAST(lag AS INT) AS day
           |         FROM daily d0, unnest(range(1, 8)) AS t(lag)),
           |j AS (SELECT lags.lag, lags.n0, daily.n
           |      FROM lags JOIN daily ON lags.day = daily.day)
           |SELECT CAST(lag AS INT) AS lag, count(*) AS n_pairs,
           |  round(CAST(SUM(CAST((n0 - m) * (n - m) AS DECIMAL(38,20))) AS DOUBLE)
           |        / ss, 6) AS autocorr
           |FROM j CROSS JOIN g GROUP BY lag, ss ORDER BY lag""".stripMargin))

  val queries: Seq[Q] = Seq(eventsSeasonal, eventsChangepoint, eventsAutocorr)
}
