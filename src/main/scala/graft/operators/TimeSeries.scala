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

  /** Kaplan–Meier product-limit estimate of the NEXT-ACTIVITY-GAP survival
    * function — the censoring-aware recurrence analysis beside
    * [[graft.operators.Analytics]]'s cohort retention (which cannot
    * distinguish "gone for good" from "observation window simply ended").
    * Every consecutive pair of a user's active days contributes an OBSERVED
    * gap (the return happened, a "death" at t = gap days); each user's last
    * active day contributes a CENSORED gap to the stream's end (the next
    * return, if any, lies beyond the data). S(t) = P(next return takes
    * more than t days) = Π_{t'≤t} (1 − d_{t'}/n_{t'}), at-risk n_t = gaps
    * (either kind) of length ≥ t.
    *
    * Scale shape: ONE two-phase (user, day) distinct reduces the stream to
    * active-day rows; consecutive gaps come from a lead window PARTITIONED
    * BY USER over that frame (per-user, distributed); everything after runs
    * on the gap-cardinality frame (bounded by the observation span in days
    * — the [[eventsChangepoint]] argument), where the ordered windows for
    * cumulative departures and the log-product are admissible. The running
    * product is exp(Σ ln factor) with the ln terms accumulated as
    * DECIMAL(38,20) in identical t order on both engines; each factor is
    * one double division of exact integer counts; a zero factor (everyone
    * at-risk dies — this corpus's final gap row) short-circuits to
    * survival 0 through the cumzero guard instead of ln(0).
    */
  private val eventsSurvival = Q(
    "events_survival",
    (s, dir) => {
      val d = Tables.load(s, dir, "events")
        .select(col("user_id"), unix_date(to_date(col("ts"))).as("day"))
        .distinct()
      val end = d.agg(max(col("day")).as("endd"))
      val seq = d.withColumn("nxt",
        lead(col("day"), 1).over(Window.partitionBy("user_id").orderBy("day")))
      val obs = seq.filter(col("nxt").isNotNull)
        .select((col("nxt") - col("day")).as("t"), lit(true).as("died"))
        .unionByName(seq.filter(col("nxt").isNull).crossJoin(broadcast(end))
          .select((col("endd") - col("day")).as("t"), lit(false).as("died")))
      val byT = obs.groupBy("t").agg(
        sum(when(col("died"), 1L).otherwise(0L)).as("d"),
        sum(when(col("died"), 0L).otherwise(1L)).as("c"))
      val n = obs.agg(count(lit(1)).as("nn"))
      val wPrev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
      val dec20 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 20)
      byT.crossJoin(broadcast(n))
        .withColumn("at_risk",
          col("nn") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .withColumn("cumzero",
          sum(when(col("d") === col("at_risk"), 1L).otherwise(0L)).over(wCum))
        .withColumn("cumln",
          sum(when(col("d") === col("at_risk"), lit(0.0))
            .otherwise(log(lit(1.0) - col("d").cast("double") / col("at_risk")))
            .cast(dec20)).over(wCum))
        .select(col("t"), col("at_risk"), col("d").as("n_deaths"),
          col("c").as("n_censored"),
          when(col("cumzero") > 0, lit(0.0))
            .otherwise(round(exp(col("cumln").cast("double")), 6)).as("survival"))
        .orderBy("t")
    },
    Some("""WITH d AS (SELECT DISTINCT user_id,
           |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events),
           |e AS (SELECT max(day) AS endd FROM d),
           |seq AS (SELECT user_id, day,
           |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
           |  FROM d),
           |obs AS (
           |  SELECT nxt - day AS t, TRUE AS died FROM seq WHERE nxt IS NOT NULL
           |  UNION ALL
           |  SELECT endd - day AS t, FALSE AS died
           |  FROM seq CROSS JOIN e WHERE nxt IS NULL),
           |byt AS (SELECT t, sum(CASE WHEN died THEN 1 ELSE 0 END) AS d,
           |    sum(CASE WHEN died THEN 0 ELSE 1 END) AS c
           |  FROM obs GROUP BY t),
           |n AS (SELECT count(*) AS nn FROM obs),
           |r AS (SELECT t, d, c, nn - coalesce(sum(d + c) OVER (ORDER BY t
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
           |  FROM byt CROSS JOIN n),
           |s AS (SELECT t, d, c, at_risk,
           |    sum(CASE WHEN d = at_risk THEN 1 ELSE 0 END)
           |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cumzero,
           |    sum(CASE WHEN d = at_risk THEN CAST(0 AS DECIMAL(38,20))
           |        ELSE CAST(ln(1 - CAST(d AS DOUBLE)/at_risk) AS DECIMAL(38,20)) END)
           |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cumln
           |  FROM r)
           |SELECT t, CAST(at_risk AS BIGINT) AS at_risk,
           |  CAST(d AS BIGINT) AS n_deaths, CAST(c AS BIGINT) AS n_censored,
           |  CASE WHEN cumzero > 0 THEN CAST(0 AS DOUBLE)
           |       ELSE round(exp(CAST(cumln AS DOUBLE)), 6) END AS survival
           |FROM s ORDER BY t""".stripMargin))

  /** Rolling 7-day distinct users via MERGED daily HyperLogLog registers,
    * verified day-by-day against the exact rolling count — the query that
    * demonstrates what the sketch is FOR: the exact path must re-touch
    * every (user, day) pair per window, while the sketch path reduces each
    * day once to a constant 64-cell register table and answers any window
    * by cell-wise MAX over the member days' tables (merge = max — the
    * associative property that lets 100 TB shards, days, or streaming
    * micro-batches combine without re-scanning raw data).
    *
    * Both paths use the [[graft.operators.Relational]] unique-rolling
    * bounded-fanout trick — each daily row serves its ≤ 7 target days via a
    * constant explode, no range join. Register algebra, estimate arithmetic
    * and the 2.7σ accuracy band are byte-identical to
    * [[TextAnalysis]]'s `text_hll_distinct` (exact dyadic DECIMAL(38,30)
    * harmonic sums, 17-digit alpha literal, bit-length rho) and genuinely
    * hold on every window of this stream.
    */
  private val eventsHllRolling = Q(
    "events_hll_rolling",
    (s, dir) => {
      import graft.functions.Hll
      val ud = Tables.load(s, dir, "events")
        .select(unix_date(to_date(col("ts"))).as("day"), col("user_id"))
        .distinct()
      val days = ud.select("day").distinct()
      val dr = Hll.registers(ud, col("day"), col("user_id").cast("string"))
      val mr = dr.select(col("g"), col("idx"), col("mreg"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select((col("g") + col("i")).as("g"), col("idx"), col("mreg"))
        .join(days.withColumnRenamed("day", "g"), Seq("g"), "left_semi")
        .groupBy("g", "idx").agg(max(col("mreg")).as("mreg"))
      val fin = Hll.estimate(mr)
      val ex = ud.select(col("day"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select((col("day") + col("i")).as("tday"), col("user_id"))
        .join(days.withColumnRenamed("day", "tday"), Seq("tday"), "left_semi")
        .groupBy("tday").agg(countDistinct(col("user_id")).as("exact_distinct"))
      ex.join(fin, col("tday") === col("g"))
        .select(col("tday").as("day"), col("exact_distinct"),
          round(col("e"), 4).as("hll_est"),
          (abs(col("e") / col("exact_distinct") - 1) <= 0.35).as("within_band"))
        .orderBy("day")
    },
    Some {
      val alpha = 0.7213 / (1 + 1.079 / 64)
      s"""WITH ud AS (SELECT DISTINCT
         |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day, user_id
         |  FROM events),
         |h AS (SELECT day,
         |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM ud),
         |dr AS (SELECT day, h % 64 AS idx,
         |    max(CASE WHEN h // 64 = 0 THEN 27 ELSE 27 - length(bin(h // 64)) END) AS mreg
         |  FROM h GROUP BY day, h % 64),
         |days AS (SELECT DISTINCT day FROM ud),
         |tr AS (SELECT t.day + i AS tday, t.idx, t.mreg
         |       FROM dr t, unnest(range(0, 7)) AS u(i)),
         |mr AS (SELECT tday, idx, max(mreg) AS mreg
         |       FROM tr JOIN days ON tr.tday = days.day GROUP BY tday, idx),
         |agg AS (SELECT tday, count(*) AS used,
         |    CAST(SUM(CAST(power(2, -mreg) AS DECIMAL(38,30))) AS DOUBLE)
         |      + (64 - count(*)) AS zsum
         |  FROM mr GROUP BY tday),
         |er AS (SELECT tday, used, 64 - used AS vz,
         |    CAST(${java.lang.Double.toString(alpha)} AS DOUBLE) * 4096 / zsum AS e_raw
         |  FROM agg),
         |fin AS (SELECT tday, CASE WHEN e_raw <= 160 AND vz > 0
         |    THEN 64 * ln(CAST(64 AS DOUBLE) / vz) ELSE e_raw END AS e FROM er),
         |ex0 AS (SELECT ud.day + i AS tday, ud.user_id
         |        FROM ud, unnest(range(0, 7)) AS u(i)),
         |ex AS (SELECT tday, count(DISTINCT user_id) AS exact_distinct
         |       FROM ex0 JOIN days ON ex0.tday = days.day GROUP BY tday)
         |SELECT ex.tday AS day, ex.exact_distinct, round(fin.e, 4) AS hll_est,
         |  abs(fin.e / ex.exact_distinct - 1) <= 0.35 AS within_band
         |FROM ex JOIN fin ON ex.tday = fin.tday ORDER BY day""".stripMargin
    })

  /** Next-7-day volume FORECAST — the projection rung on top of the
    * descriptive suite: ŷ(d) = (a + b·(d − d₀)) · s(dow(d)), closed-form
    * OLS trend over the daily frame times the weekday seasonal index (the
    * classic multiplicative trend × seasonality decomposition, the
    * [[eventsSeasonal]] index applied forward). Everything reduces to the
    * day-cardinality frame first; the OLS sufficient statistics are EXACT
    * LONGS (x = day offset, y = integer daily counts — no decimal carrier
    * needed), so slope/intercept are single double expressions of exact
    * integers, identical in both engines; the 7 future rows explode from
    * the broadcast 1-row (mind, maxd) frame and join the 7-row seasonal
    * index. Mergeable: the five OLS sums compose across shards like
    * [[graft.operators.Relational]]'s grouped-OLS partials.
    */
  private val eventsForecast = Q(
    "events_forecast",
    (s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .groupBy(unix_date(to_date(col("ts"))).as("day"))
        .agg(count(lit(1)).as("n"))
      val m = daily.agg(min(col("day")).as("mind"), max(col("day")).as("maxd"),
        count(lit(1)).as("md"))
      val st = daily.crossJoin(broadcast(m))
        .agg(sum(col("day") - col("mind")).as("sx"),
          sum((col("day") - col("mind")) * (col("day") - col("mind"))).as("sx2"),
          sum(col("n")).as("sy"),
          sum((col("day") - col("mind")) * col("n")).as("sxy"),
          first(col("md")).as("m"))
      val slope = (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("m") * col("sx2") - col("sx") * col("sx")).cast("double")
      val co = st.select(slope.as("slope"),
        ((col("sy").cast("double") - slope * col("sx")) / col("m")).as("icept"))
      val g = daily.agg((sum(col("n")).cast("double") / count(lit(1))).as("gmean"))
      val si = daily.groupBy((col("day") % 7).as("dow"))
        .agg((sum(col("n")).cast("double") / count(lit(1))).as("mean_n"))
        .crossJoin(broadcast(g))
        .select(col("dow"), (col("mean_n") / col("gmean")).as("idx"))
      val fut = m.select(col("maxd"), col("mind"),
          explode(sequence(lit(1), lit(7))).as("i"))
        .select((col("maxd") + col("i")).as("day"), col("mind"))
      fut.crossJoin(broadcast(co))
        .join(broadcast(si), col("day") % 7 === col("dow"))
        .select(col("day"), (col("day") % 7).cast("int").as("dow"),
          round(col("icept") + col("slope") * (col("day") - col("mind")), 6)
            .as("trend"),
          round(col("idx"), 6).as("seasonal_index"),
          round((col("icept") + col("slope") * (col("day") - col("mind"))) *
            col("idx"), 6).as("forecast"))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
           |    count(*) AS n FROM events GROUP BY 1),
           |m AS (SELECT min(day) AS mind, max(day) AS maxd, count(*) AS md FROM daily),
           |st AS (SELECT CAST(sum(day - mind) AS BIGINT) AS sx,
           |    CAST(sum((day - mind) * (day - mind)) AS BIGINT) AS sx2,
           |    CAST(sum(n) AS BIGINT) AS sy,
           |    CAST(sum((day - mind) * n) AS BIGINT) AS sxy,
           |    CAST(md AS BIGINT) AS m
           |  FROM daily CROSS JOIN m GROUP BY md),
           |co AS (SELECT
           |    (CAST(m * sxy - sx * sy AS DOUBLE)) / (CAST(m * sx2 - sx * sx AS DOUBLE)) AS slope,
           |    (CAST(sy AS DOUBLE) - (CAST(m * sxy - sx * sy AS DOUBLE))
           |       / (CAST(m * sx2 - sx * sx AS DOUBLE)) * sx) / m AS icept
           |  FROM st),
           |g AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS gmean FROM daily),
           |si AS (SELECT day % 7 AS dow, (CAST(sum(n) AS DOUBLE) / count(*)) / g.gmean AS idx
           |       FROM daily CROSS JOIN g GROUP BY day % 7, g.gmean),
           |fut AS (SELECT maxd + i AS day, mind FROM m, unnest(range(1, 8)) AS t(i))
           |SELECT fut.day, CAST(fut.day % 7 AS INT) AS dow,
           |  round(co.icept + co.slope * (fut.day - fut.mind), 6) AS trend,
           |  round(si.idx, 6) AS seasonal_index,
           |  round((co.icept + co.slope * (fut.day - fut.mind)) * si.idx, 6) AS forecast
           |FROM fut CROSS JOIN co JOIN si ON fut.day % 7 = si.dow
           |ORDER BY day""".stripMargin))

  /** DAU / WAU / MAU engagement panel with the DAU/MAU stickiness ratio —
    * the standing product-health readout over the event stream. All three
    * distinct-user counts use the bounded-fanout explode idiom
    * (`events_unique_rolling`): each (user, active-day) row fans out to
    * the ≤ 1/7/28 trailing-window END days it contributes to (a Generate,
    * never a range join or a per-day rescan), then ONE two-phase
    * count-distinct per window size. Window ends are capped at the stream
    * maximum via the broadcast 1-row extent; early days carry partial
    * (shorter-history) windows, the standard dashboard convention.
    * Fan-out is a fixed ×36 of the DISTINCT user-day frame — linear at
    * any scale. Stickiness = dau/mau is one double division of exact
    * longs.
    */
  private val eventsDauWauMau = Q(
    "events_dau_wau_mau",
    (s, dir) => {
      val au = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val mx = au.agg(max(col("d")).as("mxd"))
      def windowed(len: Int, out: String): DataFrame = au
        .select(col("user_id"),
          explode(sequence(col("d"), date_add(col("d"), len - 1))).as("w"))
        .crossJoin(broadcast(mx))
        .filter(col("w") <= col("mxd"))
        .groupBy(col("w").as("d"))
        .agg(countDistinct(col("user_id")).as(out))
      windowed(1, "dau")
        .join(windowed(7, "wau"), "d")
        .join(windowed(28, "mau"), "d")
        .select(col("d"), col("dau"), col("wau"), col("mau"),
          round(col("dau").cast("double") / col("mau").cast("double"), 6)
            .as("stickiness"))
        .orderBy("d")
    },
    Some("""WITH au AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
           |mx AS (SELECT max(d) AS mxd FROM au),
           |dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM au GROUP BY d),
           |wau AS (SELECT d + CAST(off AS INT) AS d, count(DISTINCT user_id) AS wau
           |        FROM au, mx, unnest(range(0, 7)) AS t(off)
           |        WHERE d + CAST(off AS INT) <= mxd GROUP BY 1),
           |mau AS (SELECT d + CAST(off AS INT) AS d, count(DISTINCT user_id) AS mau
           |        FROM au, mx, unnest(range(0, 28)) AS t(off)
           |        WHERE d + CAST(off AS INT) <= mxd GROUP BY 1)
           |SELECT dau.d AS d, dau.dau, wau.wau, mau.mau,
           |  round(CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE), 6) AS stickiness
           |FROM dau JOIN wau ON dau.d = wau.d JOIN mau ON dau.d = mau.d
           |ORDER BY d""".stripMargin))

  /** Time-to-convert distribution through the view → purchase funnel — the
    * latency companion to `events_funnel`'s step counts: per converting
    * user, the gap from FIRST view to FIRST subsequent purchase, reduced
    * to one summary row (count, min/p50/p90/max/mean seconds). Durations
    * are exact integer microsecond diffs; the percentiles interpolate on
    * those exact longs (the agg_percentile_exact convention — bit-identical
    * to quantile_cont) and convert to seconds as one double division at
    * presentation. Two keyed aggregates + one equi-join; the summary is a
    * single global aggregate over the per-user frame.
    */
  private val eventsFunnelTime = Q(
    "events_funnel_time",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val fv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(fv, "user_id")
        .filter(col("ts") >= col("v"))
        .groupBy("user_id").agg(min(col("ts")).as("p"), max(col("v")).as("v"))
      val dur = fp.select((expr("unix_micros(p)") - expr("unix_micros(v)"))
        .as("us"))
      dur.agg(count(lit(1)).as("n_converted"),
          (min(col("us")).cast("double") / 1e6).as("min_s"),
          (percentile(col("us"), lit(0.5)) / 1e6).as("p50_s"),
          (percentile(col("us"), lit(0.9)) / 1e6).as("p90_s"),
          (max(col("us")).cast("double") / 1e6).as("max_s"),
          round(graft.functions.Deterministic.dsumFine(col("us").cast("double"))
            / count(lit(1)) / 1e6, 6).as("mean_s"))
    },
    Some("""WITH fv AS (SELECT user_id, min(ts) AS v FROM events
           |            WHERE event_type = 'view' GROUP BY user_id),
           |fp AS (SELECT e.user_id, min(e.ts) AS p, max(fv.v) AS v
           |       FROM events e JOIN fv ON e.user_id = fv.user_id
           |       WHERE e.event_type = 'purchase' AND e.ts >= fv.v
           |       GROUP BY e.user_id),
           |dur AS (SELECT epoch_us(p) - epoch_us(v) AS us FROM fp)
           |SELECT count(*) AS n_converted,
           |  CAST(min(us) AS DOUBLE) / 1e6 AS min_s,
           |  quantile_cont(us, 0.5) / 1e6 AS p50_s,
           |  quantile_cont(us, 0.9) / 1e6 AS p90_s,
           |  CAST(max(us) AS DOUBLE) / 1e6 AS max_s,
           |  round(CAST(SUM(CAST(CAST(us AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE)
           |    / count(*) / 1e6, 6) AS mean_s
           |FROM dur""".stripMargin))

  /** Brown's double exponential smoothing of daily event volume (α = 1/2,
    * 20-day horizon) — the TREND-AWARE smoother one rung above the plain
    * EWMA (`events_ewma_volume`), whose forecast lags any drifting series
    * by design: smoothing the smoothed series a second time recovers the
    * lag as an explicit trend estimate (level a = 2s₁ − s₂, trend
    * b = s₁ − s₂ for α = 1/2, one-step forecast a + b = 3s₁ − 2s₂ —
    * Brown 1959). Both smoothing passes collapse into ONE closed-form
    * convolution: s₁ carries the EWMA weights 2^−(k+1), and the double-
    * smoothed s₂ = Σ_k x_{d−k}·(k+1)·2^−(k+2) (the self-convolution of the
    * geometric kernel), so one bounded-fanout explode — each daily count
    * feeding its ≤ 20 window-end days — computes both sums in a single
    * two-phase aggregate: linear in days, no recursive state, no second
    * pass for the second smoothing.
    *
    * Determinism: α = 1/2 makes every weight an exact dyadic with common
    * denominator 2²¹, so both sums (and the level/trend/forecast combines,
    * which stay in that dyadic lattice) are EXACT doubles, order-
    * independent and engine-identical with no rounding — the
    * events_ewma_volume argument, holding for per-day counts to ~2³².
    */
  /** Brown double smoothing over a (day, n) daily frame — see
    * [[eventsBrownSmooth]]'s Scaladoc. Returns
    * (d, n, level, trend, forecast_next) per day.
    */
  def brownSmooth(dailyCounts: DataFrame): DataFrame = {
    val d = dailyCounts
    val mx = d.agg(max(col("day")).as("mxd"))
    val k = datediff(col("w"), col("day"))
    val sm = d
      .select(col("n"), col("day"),
        explode(sequence(col("day"), date_add(col("day"), 19))).as("w"))
      .crossJoin(broadcast(mx))
      .filter(col("w") <= col("mxd"))
      .groupBy(col("w").as("d"))
      .agg(sum(col("n") * pow(lit(2.0), -(k + 1))).as("s1"),
        sum(col("n") * (k + 1) * pow(lit(2.0), -(k + 2))).as("s2"))
    sm.join(d.withColumnRenamed("day", "d"), Seq("d"), "left")
      .select(col("d"), coalesce(col("n"), lit(0L)).as("n"),
        (lit(2.0) * col("s1") - col("s2")).as("level"),
        (col("s1") - col("s2")).as("trend"),
        (lit(3.0) * col("s1") - lit(2.0) * col("s2")).as("forecast_next"))
      .orderBy("d")
  }

  private val eventsBrownSmooth = Q(
    "events_brown_smooth",
    (s, dir) => brownSmooth(daily(s, dir)),
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
           |               FROM events GROUP BY 1),
           |mx AS (SELECT max(d) AS mxd FROM daily),
           |sm AS (SELECT d + CAST(off AS INT) AS w,
           |         SUM(n * power(2.0, -(off + 1))) AS s1,
           |         SUM(n * (off + 1) * power(2.0, -(off + 2))) AS s2
           |       FROM daily, mx, unnest(range(0, 20)) AS t(off)
           |       WHERE d + CAST(off AS INT) <= mxd GROUP BY 1)
           |SELECT sm.w AS d, COALESCE(daily.n, 0) AS n,
           |  2.0 * s1 - s2 AS level, s1 - s2 AS trend,
           |  3.0 * s1 - 2.0 * s2 AS forecast_next
           |FROM sm LEFT JOIN daily ON sm.w = daily.d ORDER BY d""".stripMargin))

  /** Local-peak detection on the hourly volume curve — the load-spike
    * readout (capacity planning, incident retro, bot-burst triage): an
    * hour is a peak iff its count STRICTLY exceeds both neighbors (plateau
    * hours deliberately excluded — strict comparison is tie-stable across
    * engines) and its prominence clears 1.5× the global hourly mean,
    * tested in EXACT integers as 2·n·H ≥ 3·total (H = hour count) — no
    * float mean ever compared. Raw events reduce to the hour-cardinality
    * frame by one two-phase aggregate; the lag/lead window and the top-20
    * order run over that bounded frame (the [[daily]] stance, one rung
    * finer).
    */
  private val eventsPeakHours = Q(
    "events_peak_hours",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val hourly = Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy("h")
      val tot = hourly.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_hours"))
      hourly
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("next_n", lead(col("n"), 1).over(w))
        .crossJoin(broadcast(tot))
        .filter(col("prev_n").isNotNull && col("next_n").isNotNull &&
          col("n") > col("prev_n") && col("n") > col("next_n") &&
          col("n").cast(dec) * col("n_hours") * 2 >= col("total").cast(dec) * 3)
        .select(col("h"), col("n"), col("prev_n"), col("next_n"),
          round(col("n").cast("double") * col("n_hours").cast("double") /
            col("total").cast("double"), 6).as("ratio_to_mean"))
        .orderBy(col("n").desc, col("h"))
        .limit(20)
    },
    Some("""WITH hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
           |  FROM events GROUP BY 1),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
           |    count(*) AS n_hours FROM hourly),
           |x AS (SELECT h, n,
           |    lag(n) OVER (ORDER BY h) AS prev_n,
           |    lead(n) OVER (ORDER BY h) AS next_n FROM hourly)
           |SELECT h, n, prev_n, next_n,
           |  round(CAST(n AS DOUBLE) * CAST(n_hours AS DOUBLE)
           |    / CAST(total AS DOUBLE), 6) AS ratio_to_mean
           |FROM x CROSS JOIN tot
           |WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
           |  AND n > prev_n AND n > next_n
           |  AND CAST(n AS DECIMAL(38,0)) * n_hours * 2 >=
           |      CAST(total AS DECIMAL(38,0)) * 3
           |ORDER BY n DESC, h LIMIT 20""".stripMargin))

  /** Two-level Haar wavelet energy decomposition of the daily volume
    * curve — the multi-resolution variability readout between
    * [[eventsSeasonal]] (one fixed period) and [[eventsChangepoint]] (one
    * break): how much of the signal's energy lives at day-to-day scale
    * (level-1 details), at 2-day scale (level-2), and in the residual
    * coarse approximation. Unnormalized integer Haar — a₁ = c₂ₖ + c₂ₖ₊₁,
    * d₁ = c₂ₖ − c₂ₖ₊₁, level 2 likewise on a₁; an unpaired trailing
    * element at either level is dropped (documented truncation, stable on
    * both engines). Every coefficient and energy is an EXACT integer in
    * DECIMAL(38,0); the reported fractions apply the 1/2 and 1/4
    * orthonormalization at presentation time as single mirrored IEEE
    * divides. Day indices come from a row_number over the day-cardinality
    * frame (the [[daily]] bounded-window stance); pairing is one
    * (idx ÷ 2) aggregate per level.
    */
  private val eventsWaveletEnergy = Q(
    "events_wavelet_energy",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val d0 = daily(s, dir)
        .withColumn("i", row_number().over(Window.orderBy("day")) - 1)
        .select(col("i"), col("n").cast(dec).as("c"))
      def level(in: DataFrame): DataFrame = in
        .groupBy((col("i") / 2).cast("long").as("k"))
        .agg(count(lit(1)).as("m"),
          sum(col("c")).as("a"),
          sum(when(col("i") % 2 === 0, col("c")).otherwise(-col("c"))).as("d"))
        .filter(col("m") === 2)
        .select(col("k").as("i"), col("a"), col("d"))
      val l1 = level(d0)
      val l2 = level(l1.select(col("i"), col("a").as("c")))
      val e0 = d0.agg(count(lit(1)).as("n_days"),
        sum(col("c") * col("c")).as("e_total"))
      val e1 = l1.agg(sum(col("d") * col("d")).as("e_d1"))
      val e2 = l2.agg(sum(col("d") * col("d")).as("e_d2"))
      e0.crossJoin(broadcast(e1)).crossJoin(broadcast(e2))
        .select(col("n_days"),
          col("e_total").cast("long").as("e_total"),
          col("e_d1").cast("long").as("e_d1"),
          col("e_d2").cast("long").as("e_d2"),
          round(col("e_d1").cast("double") / 2.0 /
            col("e_total").cast("double"), 6).as("frac_d1"),
          round(col("e_d2").cast("double") / 4.0 /
            col("e_total").cast("double"), 6).as("frac_d2"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
           |  FROM events GROUP BY 1),
           |d0 AS (SELECT row_number() OVER (ORDER BY day) - 1 AS i,
           |    CAST(n AS DECIMAL(38,0)) AS c FROM daily),
           |l1 AS (SELECT k AS i, a, d FROM (
           |    SELECT i // 2 AS k, count(*) AS m, SUM(c) AS a,
           |      SUM(CASE WHEN i % 2 = 0 THEN c ELSE -c END) AS d
           |    FROM d0 GROUP BY 1) WHERE m = 2),
           |l2 AS (SELECT k AS i, a, d FROM (
           |    SELECT i // 2 AS k, count(*) AS m, SUM(a) AS a,
           |      SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END) AS d
           |    FROM l1 GROUP BY 1) WHERE m = 2),
           |e0 AS (SELECT count(*) AS n_days,
           |    CAST(SUM(c * c) AS BIGINT) AS e_total FROM d0),
           |e1 AS (SELECT CAST(SUM(d * d) AS BIGINT) AS e_d1 FROM l1),
           |e2 AS (SELECT CAST(SUM(d * d) AS BIGINT) AS e_d2 FROM l2)
           |SELECT n_days, e_total, e_d1, e_d2,
           |  round(CAST(e_d1 AS DOUBLE) / 2.0 / CAST(e_total AS DOUBLE), 6) AS frac_d1,
           |  round(CAST(e_d2 AS DOUBLE) / 4.0 / CAST(e_total AS DOUBLE), 6) AS frac_d2
           |FROM e0 CROSS JOIN e1 CROSS JOIN e2""".stripMargin))

  /** Power-law (Pareto) tail fit of the per-user activity distribution —
    * the Hill/MLE exponent α̂ = 1 + n_tail / Σ ln(x/x_min) over users with
    * x ≥ x_min events: the heavy-tail diagnostic behind every capacity and
    * abuse decision on this stream (α ≤ 2 means the top users dominate
    * total volume and mean-based provisioning is wrong; a falling α round
    * over round means concentration is increasing). Reported with the
    * top-50-user volume share as the model-free cross-check (a fixed-k
    * head, not a percentile — k stays a global top-k count at any corpus).
    *
    * Scale shape: one two-phase per-user count, one conditional aggregate
    * over the user frame (ln only on the ≥ x_min tail), plus an exact
    * top-share via the global top-k count. Determinism: counts exact; each
    * ln runs on an exact integer ratio and the sum rides [[dsumFine]]
    * (the text-entropy ln convention); α̂ is two IEEE ops, rounded 6 dp.
    */
  private val eventsPowerLaw = Q(
    "events_power_law",
    (s, dir) => {
      val xmin = 5L
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("x"))
      val tail = u.filter(col("x") >= xmin)
        .agg(count(lit(1)).as("n_tail"),
          dsumFine(log(col("x").cast("double") / xmin.toDouble)).as("lsum"))
      val tot = u.agg(count(lit(1)).as("n_users"), sum(col("x")).as("n_events"))
      val k = u.orderBy(col("x").desc, col("user_id"))
        .limit(50)
        .agg(sum(col("x")).as("top_events"))
      tot.crossJoin(broadcast(tail)).crossJoin(broadcast(k))
        .select(col("n_users"), col("n_events"), col("n_tail"),
          round(lit(1.0) + col("n_tail").cast("double") /
            when(col("lsum") =!= 0.0, col("lsum")), 6).as("alpha_hat"),
          round(col("top_events").cast("double") / col("n_events").cast("double"),
            6).as("top50_share"))
    },
    Some("""WITH u AS (SELECT user_id, count(*) AS x FROM events GROUP BY 1),
           |tail AS (SELECT count(*) AS n_tail,
           |    CAST(SUM(CAST(ln(CAST(x AS DOUBLE) / 5.0) AS DECIMAL(38,20))) AS DOUBLE) AS lsum
           |  FROM u WHERE x >= 5),
           |tot AS (SELECT count(*) AS n_users, CAST(SUM(x) AS BIGINT) AS n_events FROM u),
           |k AS (SELECT CAST(SUM(x) AS BIGINT) AS top_events FROM
           |  (SELECT x FROM u ORDER BY x DESC, user_id LIMIT 50))
           |SELECT n_users, n_events, n_tail,
           |  round(1.0 + CAST(n_tail AS DOUBLE) / NULLIF(lsum, 0.0), 6) AS alpha_hat,
           |  round(CAST(top_events AS DOUBLE) / n_events, 6) AS top50_share
           |FROM tot CROSS JOIN tail CROSS JOIN k""".stripMargin))

  /** Per-user behavioral entropy — Shannon entropy of each user's
    * event-type distribution, flagging the distribution extremes: near-zero
    * entropy at high volume is single-action automation (the complement of
    * events_bot_detect's timing regularity — a bot can randomize timing
    * but still do one thing), maximal entropy is uniform scripted sweeps.
    * Reports the 15 lowest-entropy high-volume users.
    *
    * Scale shape: two nested two-phase aggregates — (user, type) counts,
    * then per-user entropy from Σ c·ln c and the user total (the unigram-
    * entropy identity H = ln n − Σc·ln c / n, one pass, no per-user
    * normalize-then-sum). Windows: none. Determinism: ln on exact integer
    * counts, per-user sums via [[dsumFine]], round-6 output, total order.
    */
  private val eventsUserEntropy = Q(
    "events_user_entropy",
    (s, dir) => {
      val ut = Tables.load(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      ut.groupBy("user_id")
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_types"),
          dsumFine(col("c").cast("double") * log(col("c").cast("double")))
            .as("clc"))
        .filter(col("n_events") >= 20)
        .select(col("user_id"), col("n_events"), col("n_types"),
          round(log(col("n_events").cast("double")) -
            col("clc") / col("n_events").cast("double"), 6).as("entropy"))
        .orderBy(col("entropy").asc, col("n_events").desc, col("user_id"))
        .limit(15)
    },
    Some("""WITH ut AS (SELECT user_id, event_type, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
           |    count(*) AS n_types,
           |    CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,20))) AS DOUBLE) AS clc
           |  FROM ut GROUP BY 1)
           |SELECT user_id, n_events, n_types,
           |  round(ln(CAST(n_events AS DOUBLE)) - clc / n_events, 6) AS entropy
           |FROM u WHERE n_events >= 20
           |ORDER BY entropy ASC, n_events DESC, user_id LIMIT 15""".stripMargin))

  /** Mergeable quantile-histogram sketch over per-type event values,
    * checked against exact percentiles — the QUANTILE member of the
    * mergeable-sketch family ([[graft.functions.QuantileHist]]: constant
    * 256 cells per group, shard/day/micro-batch merge = cell-wise add,
    * streaming-maintainable under the CMS exactly-once contract). The
    * monitoring shape: exact percentiles buffer a value→count map per
    * group and need the full pass; the sketch answers p50/p90/p99 from a
    * constant-size frame any shard can pre-aggregate. The declared query
    * reports sketch vs exact with the 2·binWidth acceptance band (rank
    * guarantee exact; value band tight on this dense metric — see the
    * module doc for the precise contract).
    *
    * Scale shape: ONE two-phase (type, bin) count; the cumulative walk is
    * a window over the ≤ 256-row per-group cell frame (bounded by
    * construction); exact percentiles ride the bounded-domain
    * agg_percentile_exact stance. Estimates are closed-form IEEE on exact
    * counts, mirrored literally.
    */
  private val eventsQuantileSketch = Q(
    "events_quantile_sketch",
    (s, dir) => {
      val e = Tables.load(s, dir, "events").select(col("event_type"), col("value"))
      val cells = graft.functions.QuantileHist.cells(
        e, col("event_type"), col("value"))
      val est = graft.functions.QuantileHist.quantiles(cells, Seq(0.5, 0.9, 0.99))
      val exact = e.groupBy(col("event_type").as("g"))
        .agg(percentile(col("value"), lit(0.5)).as("e50"),
          percentile(col("value"), lit(0.9)).as("e90"),
          percentile(col("value"), lit(0.99)).as("e99"))
        .selectExpr("g", "stack(3, 0.5D, e50, 0.9D, e90, 0.99D, e99) as (q, exact)")
      // round-before-compare on BOTH columns: Spark `percentile` and the
      // oracle's quantile_cont interpolate with independently-implemented
      // IEEE expressions, so the raw `exact` (and the band boolean derived
      // from raw doubles) could flip on a last-ulp divergence at a
      // non-dyadic interpolation position; rounding first makes the
      // band arithmetic identical-on-identical-inputs cross-engine
      est.join(exact, Seq("g", "q"))
        .select(col("g").as("event_type"), col("q"), col("n"),
          round(col("est"), 6).as("sketch_est"),
          round(col("exact"), 6).as("exact"),
          (abs(round(col("est"), 6) - round(col("exact"), 6)) <= 4.0)
            .as("within_band"))
        .orderBy("event_type", "q")
    },
    Some("""WITH v AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events),
           |cells AS (SELECT g,
           |    least(greatest(CAST(floor(v / 2.0) AS INT), 0), 255) AS bin,
           |    count(*) AS cnt FROM v GROUP BY 1, 2),
           |cum AS (SELECT g, bin, cnt,
           |    CAST(COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY bin
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
           |  FROM cells),
           |tot AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM cells GROUP BY 1),
           |qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
           |          (CAST(0.99 AS DOUBLE))),
           |est AS (SELECT cum.g, q, n,
           |    2.0 * (CAST(bin AS DOUBLE)
           |      + CAST(greatest(least(ceil(q * n), n), 1) - cb AS DOUBLE) / cnt) AS est
           |  FROM cum JOIN tot ON cum.g = tot.g CROSS JOIN qs
           |  WHERE cb < greatest(least(ceil(q * n), n), 1)
           |    AND cb + cnt >= greatest(least(ceil(q * n), n), 1)),
           |ex AS (SELECT g, CAST(0.5 AS DOUBLE) AS q, quantile_cont(v, 0.5) AS exact
           |       FROM v GROUP BY g
           |  UNION ALL SELECT g, 0.9, quantile_cont(v, 0.9) FROM v GROUP BY g
           |  UNION ALL SELECT g, 0.99, quantile_cont(v, 0.99) FROM v GROUP BY g)
           |SELECT est.g AS event_type, est.q AS q, n, round(est, 6) AS sketch_est,
           |  round(exact, 6) AS exact,
           |  abs(round(est, 6) - round(exact, 6)) <= 4.0 AS within_band
           |FROM est JOIN ex ON est.g = ex.g AND est.q = ex.q
           |ORDER BY event_type, est.q""".stripMargin))

  /** Two-proportion A/B z-test — the experimentation primitive: users
    * split into arms by DETERMINISTIC hash parity (the sample_hash_split
    * stance — stable under reruns, no rand()), conversion = the user
    * produced ≥ 1 purchase event; the pooled two-proportion z-statistic
    * against the |z| > 1.96 two-sided α = 0.05 bar. On a hash split of
    * one population the test should NOT reject — the declared query
    * doubles as the A/A sanity check every experimentation stack runs
    * before trusting its pipeline.
    *
    * Scale shape: one per-user conditional aggregate (linear, two-phase),
    * then a 2-row arm frame reduced to one row of exact counts; z is a
    * handful of IEEE ops, mirrored literally. Degenerate pooled rates
    * (p̂ ∈ {0, 1}) yield NULL z via NULLIF.
    */
  private val eventsAbTest = Q(
    "events_ab_test",
    (s, dir) => {
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
        .withColumn("arm",
          when(pmod(graft.functions.Deterministic.md5Hash32(
            concat(lit("ab:"), col("user_id").cast("string"))), lit(2)) === 0,
            "A").otherwise("B"))
      val arms = u.groupBy("arm").agg(count(lit(1)).as("n"),
        sum(col("conv").cast("long")).as("c"))
      val one = arms.agg(
        sum(when(col("arm") === "A", col("n"))).as("n1"),
        sum(when(col("arm") === "A", col("c"))).as("c1"),
        sum(when(col("arm") === "B", col("n"))).as("n2"),
        sum(when(col("arm") === "B", col("c"))).as("c2"))
      val p1 = col("c1").cast("double") / col("n1").cast("double")
      val p2 = col("c2").cast("double") / col("n2").cast("double")
      val pp = (col("c1") + col("c2")).cast("double") /
        (col("n1") + col("n2")).cast("double")
      val se = sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
      val z = (p1 - p2) / when(se =!= 0.0, se)
      one.select(col("n1"), col("c1"), col("n2"), col("c2"),
        round(p1, 6).as("rate_a"), round(p2, 6).as("rate_b"),
        round(z, 6).as("z_stat"),
        (abs(z) > 1.96).as("reject_05"))
    },
    Some("""WITH u AS (SELECT user_id,
           |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
           |    CASE WHEN CAST('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8)
           |              AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
           |  FROM events GROUP BY user_id),
           |one AS (SELECT
           |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |    CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS c1,
           |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           |    CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS c2
           |  FROM u),
           |t AS (SELECT n1, c1, n2, c2,
           |    CAST(c1 AS DOUBLE) / n1 AS p1, CAST(c2 AS DOUBLE) / n2 AS p2,
           |    CAST(c1 + c2 AS DOUBLE) / (n1 + n2) AS pp
           |  FROM one),
           |z AS (SELECT *,
           |    (p1 - p2) / NULLIF(sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)), 0.0) AS z
           |  FROM t)
           |SELECT n1, c1, n2, c2, round(p1, 6) AS rate_a, round(p2, 6) AS rate_b,
           |  round(z, 6) AS z_stat, abs(z) > 1.96 AS reject_05
           |FROM z""".stripMargin))

  val queries: Seq[Q] = Seq(eventsSeasonal, eventsChangepoint, eventsAutocorr,
    eventsPowerLaw, eventsUserEntropy, eventsQuantileSketch, eventsAbTest,
    eventsSurvival, eventsHllRolling, eventsForecast, eventsDauWauMau,
    eventsFunnelTime, eventsBrownSmooth, eventsPeakHours, eventsWaveletEnergy)
}
