package graft.operators

import graft.{Q, Tables}
import graft.functions.Deterministic._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-wrangling / reliability extensions (SURVEY.md §2 [EXT]): the reshaping,
  * auditing, repair and sampling steps that sit between ingest and analytics in
  * a production pipeline — wide→long melt, distribution-law audit (Benford),
  * robust outlier screening (median/MAD), time-series gap fill with forward
  * carry, and weighted reservoir sampling (Efraimidis–Spirakis A-ES).
  *
  * Scale shapes: every query is scan → two-phase hash aggregate (± a broadcast
  * 1-row scalar frame) or a per-key window; the only windows partition by a
  * high-cardinality key (user_id), never globally. Determinism (SURVEY.md
  * §7.4): money rides exact decimals ([[dsum]]); the MAD pipeline works in
  * CENTS so every interpolated percentile is an exact dyadic rational (bit-
  * identical across engines regardless of interpolation formula); sampling
  * keys derive from [[md5Hash32]], never `rand()`.
  */
object Wrangling {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Wide→long melt (the inverse of `agg_pivot`): a 4-metric-wide per-status
    * aggregate unpivoted to (status, metric, value) rows via the codegen'd
    * `stack` generator — the reshaping step feeding metric-per-row sinks
    * (monitoring stores, long-format exports). The melt itself is a per-row
    * generator over an already-aggregated 3-row frame; at 100 TB the cost is
    * the one upstream two-phase aggregate, the reshape is free.
    */
  private val reshapeUnpivot = Q(
    "reshape_unpivot",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).cast("double").as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .select(col("o_orderstatus"),
        expr("""stack(4,
                |  'max_price',   max_price,
                |  'min_price',   min_price,
                |  'n_orders',    n_orders,
                |  'total_price', total_price) AS (metric, value)""".stripMargin))
      .orderBy("o_orderstatus", "metric"),
    Some("""WITH w AS (SELECT o_orderstatus,
           |    CAST(count(*) AS DOUBLE) AS n_orders,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           |    min(o_totalprice) AS min_price,
           |    max(o_totalprice) AS max_price
           |  FROM orders GROUP BY o_orderstatus)
           |SELECT o_orderstatus, metric, value FROM (
           |  SELECT o_orderstatus, 'max_price'   AS metric, max_price   AS value FROM w
           |  UNION ALL SELECT o_orderstatus, 'min_price',   min_price   FROM w
           |  UNION ALL SELECT o_orderstatus, 'n_orders',    n_orders    FROM w
           |  UNION ALL SELECT o_orderstatus, 'total_price', total_price FROM w)
           |ORDER BY o_orderstatus, metric""".stripMargin))

  /** Benford first-significant-digit audit of order totals — the classic
    * fabricated-data / systematic-error screen: compare each leading digit's
    * observed share against Benford's log10(1 + 1/d) expectation. ONE scan +
    * one 9-group two-phase aggregate + a broadcast 1-row total; the digit is
    * pure string arithmetic on the integral part (prices ≥ 1 here; a `< 1`
    * guard keeps the operator total on arbitrary inputs). log10 is a single
    * mirrored call on integer-valued doubles; shares round at 6.
    */
  private val qualityBenford = Q(
    "quality_benford",
    (s, dir) => {
      val d = t(s, dir, "orders")
        .filter(col("o_totalprice") >= 1)
        .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      val tot = d.agg(sum(col("n_orders")).as("n_total"))
      d.crossJoin(broadcast(tot))
        .select(col("digit"), col("n_orders"),
          round(col("n_orders").cast("double") / col("n_total"), 6).as("share"),
          round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford"),
          round(col("n_orders").cast("double") / col("n_total")
            - log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("delta"))
        .orderBy("digit")
    },
    Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
           |      AS VARCHAR), 1, 1) AS INT) AS digit, count(*) AS n_orders
           |    FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM d)
           |SELECT digit, n_orders,
           |  round(CAST(n_orders AS DOUBLE) / n_total, 6) AS share,
           |  round(log10(1.0 + 1.0 / digit), 6) AS benford,
           |  round(CAST(n_orders AS DOUBLE) / n_total
           |        - log10(1.0 + 1.0 / digit), 6) AS delta
           |FROM d CROSS JOIN tot ORDER BY digit""".stripMargin))

  /** Robust outlier screen per order priority: median + MAD (median absolute
    * deviation), flagging rows with |x − med| > 3.5 · 1.4826 · MAD — the
    * heavy-tail-safe alternative to mean/stddev z-scores (one wild value
    * cannot move the fence). Three passes over the fact, each a two-phase
    * aggregate on the 5-key priority column with the tiny stats frame
    * broadcast back — no window over the raw fact.
    *
    * Determinism: all percentiles run in CENTS (`x·100` is integral), so the
    * linear interpolation at q=0.5 lands on exact dyadic rationals (k or
    * k + 0.5, then deviations again integral ± 0.5, MAD at worst k + 0.25).
    * Exact inputs + exact dyadic outputs mean Spark's and DuckDB's
    * algebraically-equal interpolation formulas round nothing and agree
    * bit-for-bit — the same probe-backed stance as `agg_percentile_exact`,
    * strengthened to survive non-2dp deviations.
    */
  private val qualityMadOutliers = Q(
    "quality_mad_outliers",
    (s, dir) => {
      // round, don't truncate: x·100 of a 2-dp double sits within 1e-9 of
      // the integer on either side, and Spark's long cast truncates while
      // DuckDB's BIGINT cast rounds — explicit round() on both engines
      val cents = round(col("o_totalprice") * 100).cast("long")
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"), cents.as("c"))
      val med = o.groupBy("prio")
        .agg(percentile(col("c"), lit(0.5)).as("med_c"))
      val dev = o.join(broadcast(med), "prio")
        .select(col("prio"), col("c"), abs(col("c") - col("med_c")).as("dev_c"))
      val mad = dev.groupBy("prio")
        .agg(percentile(col("dev_c"), lit(0.5)).as("mad_c"))
      dev.join(broadcast(mad), "prio")
        .groupBy("prio")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("dev_c") > lit(3.5) * lit(1.4826) * col("mad_c"), 1))
            .as("n_outliers"))
        .join(broadcast(med), "prio").join(broadcast(mad), "prio")
        .select(col("prio").as("o_orderpriority"), col("n_rows"), col("n_outliers"),
          round(col("med_c") / 100.0, 6).as("median_price"),
          round(col("mad_c") / 100.0, 6).as("mad_price"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS prio,
           |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
           |med AS (SELECT prio, quantile_cont(c, 0.5) AS med_c FROM o GROUP BY prio),
           |dev AS (SELECT o.prio, c, abs(c - med_c) AS dev_c
           |        FROM o JOIN med ON o.prio = med.prio),
           |mad AS (SELECT prio, quantile_cont(dev_c, 0.5) AS mad_c
           |        FROM dev GROUP BY prio),
           |agg AS (SELECT dev.prio, count(*) AS n_rows,
           |    count(CASE WHEN dev_c > 3.5 * 1.4826 * mad_c THEN 1 END) AS n_outliers
           |  FROM dev JOIN mad ON dev.prio = mad.prio GROUP BY dev.prio)
           |SELECT agg.prio AS o_orderpriority, n_rows, n_outliers,
           |  round(med_c / 100.0, 6) AS median_price,
           |  round(mad_c / 100.0, 6) AS mad_price
           |FROM agg JOIN med ON agg.prio = med.prio
           |         JOIN mad ON agg.prio = mad.prio
           |ORDER BY o_orderpriority""".stripMargin))

  /** Per-user daily activity with GAP FILL: materialize every calendar day in
    * each user's [first, last] active span, zero-fill missing days, and carry
    * the last active day forward — the time-series repair step before any
    * rolling metric (a rolling window over a gappy daily frame silently
    * shrinks its denominator). The spine is `explode(sequence(d0, d1))` —
    * linear in user-days, generated distributed, never a driver loop; the
    * forward carry is `max(day-if-active)` over an ordered per-user window
    * (days ascend, so max ≡ last-non-null — no IGNORE NULLS dependence,
    * which keeps the oracle on plain ANSI window functions).
    */
  private val eventsGapFill = Q(
    "events_gap_fill",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val spine = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("n_events").isNull.as("is_gap"),
          max(when(col("n_events").isNotNull, col("day"))).over(w)
            .as("last_active_day"))
        .orderBy("user_id", "day")
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
           |    count(*) AS n_events FROM events GROUP BY 1, 2),
           |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
           |         FROM daily GROUP BY user_id),
           |spine AS (SELECT user_id, d0 + CAST(off AS INT) AS day
           |  FROM span, unnest(range(0, datediff('day', d0, d1) + 1)) AS t(off))
           |SELECT spine.user_id, spine.day,
           |  COALESCE(daily.n_events, 0) AS n_events,
           |  daily.n_events IS NULL AS is_gap,
           |  max(CASE WHEN daily.n_events IS NOT NULL THEN spine.day END)
           |    OVER (PARTITION BY spine.user_id ORDER BY spine.day
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS last_active_day
           |FROM spine LEFT JOIN daily
           |  ON spine.user_id = daily.user_id AND spine.day = daily.day
           |ORDER BY spine.user_id, spine.day""".stripMargin))

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES): each
    * document draws a DETERMINISTIC uniform u from its md5 key and survives
    * with key ln(u)/weight — the top-k by that key is an exact weighted
    * sample (long documents proportionally favored), reproducible under
    * reruns/reshuffles/engine swaps (never `rand()`). One projection + a
    * global top-k (TakeOrderedAndProject — k rows per partition then k at
    * the driver, the same scale shape as `topk_orders`). The A-ES keys of
    * distinct docs are separated by ~1/n ≫ the cross-engine ln() last-ulp,
    * so the selected set is stable; scores report at round(·,12).
    */
  private val sampleWeighted = Q(
    "sample_weighted",
    (s, dir) => {
      val u = (md5Hash32(concat(lit("aes:"), col("doc_id").cast("string")))
        .cast("double") + 0.5) / lit(4294967296.0)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          (log(u) / col("n_chars")).as("key"))
        .orderBy(col("key").desc, col("doc_id"))
        .limit(200)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("key"), 12).as("aes_key"))
    },
    Some("""SELECT doc_id, source, n_chars, round(key, 12) AS aes_key FROM (
           |  SELECT doc_id, source, n_chars,
           |    ln((CAST(CAST('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 8)
           |        AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0) / n_chars AS key
           |  FROM documents)
           |ORDER BY key DESC, doc_id LIMIT 200""".stripMargin))

  /** Linear interpolation of missing daily values — the numeric twin of
    * [[eventsGapFill]]'s zero-fill: a gap day's value is interpolated
    * between the nearest active days on both sides. The bracketing days
    * come from two per-user ordered windows (`max(day-if-active)` looking
    * back, `min(day-if-active)` looking forward — monotone day makes both
    * plain ANSI aggregates, no IGNORE NULLS); the bracket VALUES arrive by
    * two equi-joins back onto the daily frame on (user, bracket-day) —
    * joins on a key, never a second window over values. The spine bounds
    * gaps to [first, last] active day, so both brackets always exist.
    * Determinism: daily values are exact 2-dp decimal sums; the
    * interpolation is a fixed double expression mirrored in the oracle,
    * reported at round(·,6).
    */
  private val eventsInterpolate = Q(
    "events_interpolate",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("day_value"))
      val spine = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val wBack = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val active = when(col("day_value").isNotNull, col("day"))
      val bracketed = spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), col("day_value"),
          max(active).over(wBack).as("pd"),
          min(active).over(wFwd).as("nd"))
      val pv = daily.select(col("user_id"), col("day").as("pd"),
        col("day_value").as("pv"))
      val nv = daily.select(col("user_id"), col("day").as("nd"),
        col("day_value").as("nv"))
      bracketed.join(pv, Seq("user_id", "pd")).join(nv, Seq("user_id", "nd"))
        .select(col("user_id"), col("day"),
          col("day_value").isNull.as("interpolated"),
          round(when(col("day_value").isNotNull, col("day_value"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (datediff(col("day"), col("pd")).cast("double") /
                datediff(col("nd"), col("pd")))), 6).as("value"))
        .orderBy("user_id", "day")
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
           |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
           |  FROM events GROUP BY 1, 2),
           |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
           |         FROM daily GROUP BY user_id),
           |spine AS (SELECT user_id, d0 + CAST(off AS INT) AS day
           |  FROM span, unnest(range(0, datediff('day', d0, d1) + 1)) AS t(off)),
           |b AS (SELECT spine.user_id, spine.day, daily.day_value,
           |    max(CASE WHEN daily.day_value IS NOT NULL THEN spine.day END)
           |      OVER (PARTITION BY spine.user_id ORDER BY spine.day
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
           |    min(CASE WHEN daily.day_value IS NOT NULL THEN spine.day END)
           |      OVER (PARTITION BY spine.user_id ORDER BY spine.day
           |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           |  FROM spine LEFT JOIN daily
           |    ON spine.user_id = daily.user_id AND spine.day = daily.day)
           |SELECT b.user_id, b.day, b.day_value IS NULL AS interpolated,
           |  round(CASE WHEN b.day_value IS NOT NULL THEN b.day_value
           |    ELSE p.day_value + (n.day_value - p.day_value) *
           |      (CAST(datediff('day', b.pd, b.day) AS DOUBLE) /
           |       datediff('day', b.pd, b.nd)) END, 6) AS value
           |FROM b JOIN daily p ON b.user_id = p.user_id AND b.pd = p.day
           |       JOIN daily n ON b.user_id = n.user_id AND b.nd = n.day
           |ORDER BY b.user_id, b.day""".stripMargin))

  /** Population-stability-index drift monitor: split orders into an early
    * and a late half at the median order date, bin prices on the shared
    * fixed-width grid, and report each bin's PSI term
    * (p−q)·ln(p/q) plus the total — the production monitor for "has the
    * incoming distribution drifted from the reference". Two scans (split
    * predicate + binning are row-side), two 20-key two-phase aggregates, a
    * broadcast full-outer on the bin key, Laplace-smoothed shares so empty
    * bins stay finite. The date threshold derives from an exact integer
    * percentile on epoch days (dyadic — bit-stable, the
    * [[qualityMadOutliers]] stance); shares and PSI report at round(·,6).
    */
  private val qualityPsiDrift = Q(
    "quality_psi_drift",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(unix_date(to_date(col("o_orderdate"))).as("ed"),
          least(floor(col("o_totalprice") / 30000.0), lit(9L)).as("bin"))
      val thr = o.agg(percentile(col("ed"), lit(0.5)).as("med_ed"))
      val halves = o.crossJoin(broadcast(thr))
        .select(col("bin"), (col("ed").cast("double") <= col("med_ed")).as("early"))
      val p = halves.filter(col("early")).groupBy("bin").agg(count(lit(1)).as("np"))
      val q = halves.filter(!col("early")).groupBy("bin").agg(count(lit(1)).as("nq"))
      val tp = p.agg(sum(col("np")).as("tp"))
      val tq = q.agg(sum(col("nq")).as("tq"))
      val ps = (coalesce(col("np"), lit(0L)) + 1).cast("double") / (col("tp") + 10)
      val qs = (coalesce(col("nq"), lit(0L)) + 1).cast("double") / (col("tq") + 10)
      p.join(q, Seq("bin"), "full_outer")
        .crossJoin(broadcast(tp)).crossJoin(broadcast(tq))
        .select(col("bin"),
          coalesce(col("np"), lit(0L)).as("n_early"),
          coalesce(col("nq"), lit(0L)).as("n_late"),
          round(ps, 6).as("p_share"),
          round(qs, 6).as("q_share"),
          round((ps - qs) * log(ps / qs), 6).as("psi_term"))
        .orderBy("bin")
    },
    Some("""WITH o AS (SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ed,
           |    least(CAST(floor(o_totalprice / 30000.0) AS BIGINT), 9) AS bin
           |  FROM orders),
           |thr AS (SELECT quantile_cont(ed, 0.5) AS med_ed FROM o),
           |h AS (SELECT bin, CAST(ed AS DOUBLE) <= med_ed AS early
           |      FROM o CROSS JOIN thr),
           |p AS (SELECT bin, count(*) AS np FROM h WHERE early GROUP BY bin),
           |q AS (SELECT bin, count(*) AS nq FROM h WHERE NOT early GROUP BY bin),
           |tp AS (SELECT CAST(sum(np) AS BIGINT) AS tp FROM p),
           |tq AS (SELECT CAST(sum(nq) AS BIGINT) AS tq FROM q)
           |SELECT COALESCE(p.bin, q.bin) AS bin,
           |  COALESCE(np, 0) AS n_early, COALESCE(nq, 0) AS n_late,
           |  round(CAST(COALESCE(np, 0) + 1 AS DOUBLE) / (tp + 10), 6) AS p_share,
           |  round(CAST(COALESCE(nq, 0) + 1 AS DOUBLE) / (tq + 10), 6) AS q_share,
           |  round((CAST(COALESCE(np, 0) + 1 AS DOUBLE) / (tp + 10)
           |       - CAST(COALESCE(nq, 0) + 1 AS DOUBLE) / (tq + 10))
           |    * ln((CAST(COALESCE(np, 0) + 1 AS DOUBLE) / (tp + 10))
           |       / (CAST(COALESCE(nq, 0) + 1 AS DOUBLE) / (tq + 10))), 6) AS psi_term
           |FROM p FULL OUTER JOIN q ON p.bin = q.bin
           |CROSS JOIN tp CROSS JOIN tq
           |ORDER BY bin""".stripMargin))

  /** Percentile winsorization per order priority: clip prices to the
    * per-group [p01, p99] fences and report mean before/after plus the
    * clipped-row count — the heavy-tail preprocessing step that keeps one
    * typo from dominating a mean feature. Fences come from one 5-key
    * percentile aggregate IN CENTS (exact dyadic — the
    * [[qualityMadOutliers]] stance) broadcast back onto the fact; clipping
    * is row-side; means ride exact cent sums (clipped cents are quarter-
    * integral after dyadic fences — DECIMAL(38,8) holds them exactly).
    */
  private val qualityWinsorize = Q(
    "quality_winsorize",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"),
          // round-not-truncate: see qualityMadOutliers
          round(col("o_totalprice") * 100).cast("long").as("c"))
      val fences = o.groupBy("prio")
        .agg(percentile(col("c"), lit(0.01)).as("lo"),
          percentile(col("c"), lit(0.99)).as("hi"))
      val clipped = o.join(broadcast(fences), "prio")
        .select(col("prio"), col("c"),
          greatest(least(col("c").cast("double"), col("hi")), col("lo")).as("cw"))
      clipped.groupBy("prio")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("cw") =!= col("c").cast("double"), 1)).as("n_clipped"),
          (sum(col("c")).cast("double") / count(lit(1)) / 100.0).as("mean_raw"),
          (sum(col("cw").cast(DecimalType(38, 8))).cast("double") /
            count(lit(1)) / 100.0).as("mean_wins"))
        .select(col("prio").as("o_orderpriority"), col("n_rows"), col("n_clipped"),
          round(col("mean_raw"), 6).as("mean_raw"),
          round(col("mean_wins"), 6).as("mean_wins"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS prio,
           |    CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
           |f AS (SELECT prio, quantile_cont(c, 0.01) AS lo,
           |             quantile_cont(c, 0.99) AS hi FROM o GROUP BY prio),
           |cl AS (SELECT o.prio, c,
           |    greatest(least(CAST(c AS DOUBLE), hi), lo) AS cw
           |  FROM o JOIN f ON o.prio = f.prio)
           |SELECT prio AS o_orderpriority, count(*) AS n_rows,
           |  count(CASE WHEN cw <> CAST(c AS DOUBLE) THEN 1 END) AS n_clipped,
           |  round(CAST(sum(c) AS DOUBLE) / count(*) / 100.0, 6) AS mean_raw,
           |  round(CAST(SUM(CAST(cw AS DECIMAL(38,8))) AS DOUBLE)
           |        / count(*) / 100.0, 6) AS mean_wins
           |FROM cl GROUP BY prio ORDER BY o_orderpriority""".stripMargin))

  /** Item-item collaborative filtering: the top-3 "customers also bought"
    * neighbors per part, scored by co-occurrence cosine
    * cooc(a,b) / √(pop(a)·pop(b)) over order baskets — the recommendation
    * primitive built from the same supported co-purchase pairs as the
    * association rules, but normalized so popular parts don't dominate.
    * Pair generation shuffles on the order key (fanout bounded by basket
    * size), popularity is a two-phase count joined ON THE PART KEY (the
    * pair frame is vocabulary-sized after the support cut), and the top-3
    * ranking windows over the pair frame partitioned by part — never a
    * corpus-wide sort. Determinism: the score is one sqrt + one division
    * on exact integers, ranked at round(·,9) with a neighbor tie-break.
    */
  private val ordersItemCf = Q(
    "orders_item_cf",
    (s, dir) => {
      // popularity + co-occurrence ride the memoized co-purchase substrate
      // shared with the graph family and orders_basket_rules
      val pop = Graph.partSupport(s, dir).withColumnRenamed("s", "pop")
      val pairs = Graph.coPurchaseSupport(s, dir)
        .withColumnRenamed("supp", "cooc")
      // score both directions so every part ranks its own neighbors
      val sym = pairs.select(col("a").as("part"), col("b").as("nbr"), col("cooc"))
        .unionByName(pairs.select(col("b").as("part"), col("a").as("nbr"), col("cooc")))
      val scored = sym
        .join(pop.select(col("p").as("part"), col("pop").as("pa")), "part")
        .join(pop.select(col("p").as("nbr"), col("pop").as("pb")), "nbr")
        .select(col("part"), col("nbr"), col("cooc"),
          (col("cooc").cast("double") /
            sqrt(col("pa").cast("double") * col("pb").cast("double"))).as("score"))
      val w = Window.partitionBy("part")
        .orderBy(round(col("score"), 9).desc, col("nbr"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("part"), col("rn").as("rank_pos"), col("nbr"),
          col("cooc"), round(col("score"), 6).as("score"))
        .orderBy("part", "rank_pos")
    },
    Some("""WITH l AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
           |pop AS (SELECT p, count(*) AS pop FROM l GROUP BY p),
           |pairs AS (SELECT a, b, cooc FROM (
           |    SELECT x.p AS a, y.p AS b, count(*) AS cooc
           |    FROM l x JOIN l y ON x.ok = y.ok AND x.p < y.p
           |    GROUP BY x.p, y.p) WHERE cooc >= 2),
           |sym AS (SELECT a AS part, b AS nbr, cooc FROM pairs
           |        UNION ALL SELECT b, a, cooc FROM pairs),
           |scored AS (SELECT part, nbr, cooc,
           |    CAST(cooc AS DOUBLE) /
           |      sqrt(CAST(pa.pop AS DOUBLE) * CAST(pb.pop AS DOUBLE)) AS score
           |  FROM sym JOIN pop pa ON sym.part = pa.p
           |           JOIN pop pb ON sym.nbr = pb.p)
           |SELECT part, CAST(rn AS INT) AS rank_pos, nbr, cooc,
           |       round(score, 6) AS score
           |FROM (SELECT part, nbr, cooc, score, row_number() OVER (
           |        PARTITION BY part ORDER BY round(score, 9) DESC, nbr) AS rn
           |      FROM scored)
           |WHERE rn <= 3 ORDER BY part, rank_pos""".stripMargin))

  /** k-anonymity / l-diversity privacy audit over quasi-identifiers — the
    * re-identification-risk check a healthcare-domain pipeline (the
    * reference's domain) runs before any data release, complementing
    * [[TextAnalysis]]'s direct-identifier PII redaction: direct identifiers
    * get scrubbed, but a RARE COMBINATION of innocuous attributes
    * (segment × nation here) still singles a record out. Each
    * quasi-identifier equivalence class reports its size k (re-identification
    * resistance) and the diversity l of a sensitive attribute's value set
    * inside it (attribute-disclosure resistance — a class can be large yet
    * reveal the sensitive value if everyone shares it). at_risk flags
    * k < 5 ∨ l < 3 — the classes a release must generalize or suppress.
    *
    * Scale shape: ONE two-phase aggregate over the QI key (count +
    * count(distinct band) — the distinct dedups inside each class's
    * partitions first); the class frame is dimension-sized. The sensitive
    * banding floor(acctbal/1000) is a single IEEE double op on exact 2-dp
    * inputs, identical in both engines.
    */
  private val privacyKAnon = Q(
    "privacy_k_anon",
    (s, dir) => Tables.load(s, dir, "customer")
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .groupBy("segment", "nation")
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("bal_band")).as("l_diversity"))
      .select(col("segment"), col("nation"), col("class_size"),
        col("l_diversity"),
        (col("class_size") < 5 || col("l_diversity") < 3).as("at_risk"))
      .orderBy("segment", "nation"),
    Some("""SELECT c_mktsegment AS segment, c_nationkey AS nation,
           |  count(*) AS class_size,
           |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_diversity,
           |  count(*) < 5 OR
           |    count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 3 AS at_risk
           |FROM customer
           |GROUP BY c_mktsegment, c_nationkey
           |ORDER BY segment, nation""".stripMargin))

  /** ε-differentially-private release of the lang × source composition
    * table — the publish-side complement to [[privacyKAnon]]'s audit: each
    * cell count is released with Laplace(Δf/ε) noise (sensitivity 1 for a
    * counting query, ε = 1), the standard DP mechanism. The noise is
    * DETERMINISTIC-SEEDED the way every random draw in this repo is
    * ([[sampleWeighted]]'s md5 uniforms): u = (md5(cell-key) mod 2²⁰ + ½)/2²⁰
    * ∈ (0,1), noise = −sign(u−½)·ln(1−2|u−½|)/ε by Laplace inverse-CDF — so
    * releases are reproducible across reruns and engines, and the oracle
    * replays the mechanism bit-for-bit. (A production release would swap
    * the seed source per epoch; the mechanism and its plan shape — one
    * two-phase aggregate, noise as a map-side expression on the tiny cell
    * frame — are the declared operator. true_n rides along as the audit
    * column this test harness compares; a real release drops it.)
    */
  private val privacyDpCounts = Q(
    "privacy_dp_counts",
    (s, dir) => {
      val cells = Tables.load(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("true_n"))
      val u = (pmod(md5Hash32(concat(col("lang"), lit(":"), col("source"))),
        lit(1048576)).cast("double") + 0.5) / 1048576.0
      val noise = -signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
      cells.select(col("lang"), col("source"), col("true_n"),
          round((col("true_n").cast("double") + noise), 6).as("released_n"))
        .orderBy("lang", "source")
    },
    Some("""WITH cells AS (SELECT lang, source, count(*) AS true_n
           |  FROM documents GROUP BY lang, source),
           |n AS (SELECT lang, source, true_n,
           |    (CAST(CAST('0x' || substr(md5(lang || ':' || source), 1, 8) AS BIGINT)
           |       % 1048576 AS DOUBLE) + 0.5) / 1048576.0 AS u
           |  FROM cells)
           |SELECT lang, source, CAST(true_n AS BIGINT) AS true_n,
           |  round(CAST(true_n AS DOUBLE) +
           |    -sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS released_n
           |FROM n ORDER BY lang, source""".stripMargin))

  /** χ² independence test of the documents' lang × source contingency —
    * "is the language mix the same across sources?", the statistical
    * upgrade of [[TextAnalysis]]'s descriptive mixture report and the
    * drift detector's ([[qualityPsiDrift]]) categorical sibling. The
    * statistic is computed over the FULL nl × ns grid including
    * zero-observed cells (dropping them biases χ² low), built by crossing
    * the two marginal frames — both dimension-sized, so the grid is a
    * broadcast-cheap nl·ns rows no matter the corpus size; the only
    * corpus-scale work is the ONE two-phase (lang, source) count.
    *
    * Determinism (SURVEY.md §7.4): observed/marginal counts are exact
    * longs; each cell's term is (O·N − r·c)²/(N·r·c) with both numerator
    * root and denominator formed in exact DECIMAL(38,0) (O·N ≲ 10²⁴
    * overflows a long at lake scale) and cast once to double, so the term
    * is three IEEE ops on identically-derived values; the grid sum rides
    * the order-independent fine decimal. Cramér's V adds one IEEE sqrt
    * (correctly rounded per IEEE 754, engine-identical).
    */
  /** χ² independence of two categorical columns — see [[qualityChi2]]'s
    * Scaladoc for the statistic, grid construction and determinism
    * argument. Returns one row: (n_obs, dof, chi2, cramers_v).
    */
  def chi2Independence(df: DataFrame, a: String, b: String): DataFrame = {
    val obs = df.groupBy(a, b).agg(count(lit(1)).as("o"))
    val rows = obs.groupBy(a).agg(sum(col("o")).as("r"))
    val cols = obs.groupBy(b).agg(sum(col("o")).as("c"))
    val meta = df.agg(count(lit(1)).as("n"), countDistinct(col(a)).as("nl"),
      countDistinct(col(b)).as("ns"))
    val grid = rows.crossJoin(cols)
      .join(obs, Seq(a, b), "left")
      .select(col("r"), col("c"), coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(meta))
    val d = (col("o").cast(DecimalType(38, 0)) * col("n") -
      col("r").cast(DecimalType(38, 0)) * col("c")).cast("double")
    val den = (col("n").cast(DecimalType(38, 0)) * col("r") * col("c"))
      .cast("double")
    val stat = grid.agg(dsumFine(d * d / den).as("chi2"))
    stat.crossJoin(broadcast(meta))
      .select(col("n").as("n_obs"),
        ((col("nl") - 1) * (col("ns") - 1)).as("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") /
          (col("n").cast("double") * least(col("nl") - 1, col("ns") - 1))),
          6).as("cramers_v"))
  }

  private val qualityChi2 = Q(
    "quality_chi2",
    (s, dir) => chi2Independence(t(s, dir, "documents"), "lang", "source")
      .withColumnRenamed("n_obs", "n_docs"),
    Some("""WITH obs AS (SELECT lang, source, count(*) AS o
           |  FROM documents GROUP BY 1, 2),
           |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
           |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
           |meta AS (SELECT count(*) AS n, count(DISTINCT lang) AS nl,
           |    count(DISTINCT source) AS ns FROM documents),
           |grid AS (SELECT r.r, c.c, COALESCE(obs.o, 0) AS o
           |  FROM r CROSS JOIN c
           |  LEFT JOIN obs ON obs.lang = r.lang AND obs.source = c.source),
           |terms AS (SELECT
           |    CAST(CAST(o AS DECIMAL(38,0)) * n
           |         - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE) AS d,
           |    CAST(CAST(n AS DECIMAL(38,0)) * r * c AS DOUBLE) AS den
           |  FROM grid CROSS JOIN meta),
           |stat AS (SELECT CAST(SUM(CAST(d * d / den AS DECIMAL(38,20)))
           |    AS DOUBLE) AS chi2 FROM terms)
           |SELECT n AS n_docs, CAST((nl - 1) * (ns - 1) AS BIGINT) AS dof,
           |  round(chi2, 6) AS chi2,
           |  round(sqrt(chi2 / (CAST(n AS DOUBLE) * least(nl - 1, ns - 1))),
           |    6) AS cramers_v
           |FROM stat CROSS JOIN meta""".stripMargin))

  /** Two-sample Kolmogorov–Smirnov test on the order-value distribution of
    * two market segments — "did this cohort's spend distribution shift?",
    * the distribution-level comparison the mean-based checks miss entirely
    * (two segments can share a mean and differ everywhere else). D is the
    * max CDF gap over the pooled distinct-value frame, which requires a
    * prefix sum — computed with the DISTRIBUTED two-level idiom, not a
    * global ordered window: values bucket by a fixed $50k price band,
    * cumulative counts run inside each bucket's partition, and the per-
    * bucket offsets come from a window over the ~11-row bucket-total frame
    * (the only unpartitioned window, over a provably band-count-sized
    * frame). Values are CENTS (exact), so the distinct-value frame is
    * bounded by the price domain, not the row count.
    *
    * Determinism: cumulative counts are exact longs; the gap numerator
    * |c1·n2 − c2·n1| stays in exact DECIMAL(38,0) (c·n ≳ 2⁶³ at lake
    * scale), so max picks deterministically; D and the α=0.05 critical
    * value c(α)·√((n1+n2)/(n1·n2)) are a handful of IEEE ops (÷, √, ×
    * by the 1.358 literal) on exact inputs — the reject boolean compares
    * two engine-identical doubles.
    */
  /** Two-sample KS test — see [[qualityKsTest]]'s Scaladoc. `df` carries an
    * exact-integer `value` column and a boolean `isa` sample flag;
    * `bucketWidth` is the fixed coarse band of the distributed prefix sum.
    * Returns one row: (n1, n2, d_stat, ks_crit_05, reject_05).
    */
  def ksTwoSample(df: DataFrame, bucketWidth: Long): DataFrame = {
    val vals = df.groupBy("value")
      .agg(count(when(col("isa"), 1)).as("d1"),
        count(when(!col("isa"), 1)).as("d2"))
      .withColumn("bkt", (col("value") / bucketWidth).cast("long"))
    val inb = Window.partitionBy("bkt").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = vals
      .withColumn("w1", sum(col("d1")).over(inb))
      .withColumn("w2", sum(col("d2")).over(inb))
    val bw = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = vals.groupBy("bkt")
      .agg(sum(col("d1")).as("t1"), sum(col("d2")).as("t2"))
      .select(col("bkt"),
        coalesce(sum(col("t1")).over(bw), lit(0L)).as("o1"),
        coalesce(sum(col("t2")).over(bw), lit(0L)).as("o2"))
    val meta = vals.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
    val dn = within.join(broadcast(off), "bkt")
      .crossJoin(broadcast(meta))
      .agg(max(abs(
        (col("w1") + col("o1")).cast(DecimalType(38, 0)) * col("n2") -
          (col("w2") + col("o2")).cast(DecimalType(38, 0)) * col("n1")))
        .as("dn"))
    val nn = (col("n1").cast(DecimalType(38, 0)) * col("n2")).cast("double")
    val dStat = col("dn").cast("double") / nn
    val crit = lit(1.358) *
      sqrt((col("n1") + col("n2")).cast("double") / nn)
    dn.crossJoin(broadcast(meta))
      .select(col("n1"), col("n2"),
        round(dStat, 6).as("d_stat"),
        round(crit, 6).as("ks_crit_05"),
        (dStat > crit).as("reject_05"))
  }

  private val qualityKsTest = Q(
    "quality_ks_test",
    (s, dir) => ksTwoSample(
      t(s, dir, "orders")
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(round(col("o_totalprice") * 100).cast("long").as("value"),
          (col("c_mktsegment") === "BUILDING").as("isa")),
      bucketWidth = 5000000L),
    Some("""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           |    c_mktsegment = 'BUILDING' AS isa
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
           |vals AS (SELECT cents, cents // 5000000 AS bkt,
           |    count(CASE WHEN isa THEN 1 END) AS d1,
           |    count(CASE WHEN NOT isa THEN 1 END) AS d2
           |  FROM o GROUP BY 1, 2),
           |w AS (SELECT bkt,
           |    SUM(d1) OVER (PARTITION BY bkt ORDER BY cents
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w1,
           |    SUM(d2) OVER (PARTITION BY bkt ORDER BY cents
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w2
           |  FROM vals),
           |bt AS (SELECT bkt, sum(d1) AS t1, sum(d2) AS t2
           |  FROM vals GROUP BY 1),
           |off AS (SELECT bkt,
           |    COALESCE(SUM(t1) OVER (ORDER BY bkt
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o1,
           |    COALESCE(SUM(t2) OVER (ORDER BY bkt
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o2
           |  FROM bt),
           |meta AS (SELECT CAST(sum(d1) AS BIGINT) AS n1,
           |    CAST(sum(d2) AS BIGINT) AS n2 FROM vals),
           |dn AS (SELECT max(abs(
           |    CAST(w1 + o1 AS DECIMAL(38,0)) * n2 -
           |    CAST(w2 + o2 AS DECIMAL(38,0)) * n1)) AS dn
           |  FROM w JOIN off USING (bkt) CROSS JOIN meta)
           |SELECT n1, n2,
           |  round(CAST(dn AS DOUBLE) /
           |    CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE), 6) AS d_stat,
           |  round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) /
           |    CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE)), 6) AS ks_crit_05,
           |  CAST(dn AS DOUBLE) /
           |    CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE) >
           |    1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) /
           |      CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE)) AS reject_05
           |FROM dn CROSS JOIN meta""".stripMargin))

  /** DOUBLED average rank (2·below + cnt + 1 — doubled so tie-averaged
    * ranks stay exactly integral) of each distinct value, computed with the
    * same distributed two-level prefix-sum idiom as [[ksTwoSample]]: in-
    * bucket cumulative counts partition by a fixed value band, bucket
    * offsets come from the one window over the band-count-sized total
    * frame. Input df must carry a long `valueCol`; output (v, r2).
    */
  private def avgRank2(df: DataFrame, valueCol: String,
                       bucketWidth: Long): DataFrame = {
    val vals = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("bkt", (col("v") / bucketWidth).cast("long"))
    val inb = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = vals
      .withColumn("wb", coalesce(sum(col("cnt")).over(inb), lit(0L)))
    val bw = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val off = vals.groupBy("bkt").agg(sum(col("cnt")).as("t"))
      .select(col("bkt"), coalesce(sum(col("t")).over(bw), lit(0L)).as("ob"))
    within.join(broadcast(off), "bkt")
      .select(col("v"),
        (lit(2L) * (col("wb") + col("ob")) + col("cnt") + lit(1L)).as("r2"))
  }

  /** Pearson AND Spearman correlation of line-item quantity vs extended
    * price — the monotone-association audit (Spearman is the robust one: a
    * nonlinear but monotone pricing curve scores 1.0 where Pearson
    * dilutes). Spearman = Pearson on tie-averaged ranks; ranks come from
    * [[avgRank2]]'s distributed prefix sum (no global sort window — rank of
    * a value is a FUNCTION of the per-value count frame), doubled to stay
    * integral under tie averaging.
    *
    * Determinism + scale: all five moments of both passes are exact —
    * values are integer quantities/cents, doubled ranks ≤ 2n, squares
    * ≤ 4n², sums ≤ 4n³ ~ 10³⁸ at n = 10¹² — carried in DECIMAL(38,0); each
    * correlation is then numerator/(√·√) — four IEEE ops on exactly-derived
    * doubles, mirrored operation-for-operation in the oracle. Linear: two
    * value-keyed aggregations, two rank joins, one global moment reduce.
    */
  /** Pearson + Spearman of an integer-pair frame — see [[qualitySpearman]]
    * for the statistic and determinism argument. `df` carries long `x`,
    * `y`; bucket widths feed [[avgRank2]]'s distributed prefix sums.
    * Returns one row: (n_rows, pearson_r, spearman_rho).
    *
    * `broadcastXRanks`: hint the x-rank frame broadcast-joinable — set it
    * ONLY when x is known low-cardinality (the rank frame is one row per
    * DISTINCT x; quality_spearman's x = quantity has ~50). Default false:
    * for a high-cardinality x the rank frame is order-of-the-input and a
    * forced broadcast would drag it through the driver — the default lets
    * AQE pick the join side from measured sizes.
    */
  def pearsonSpearman(df: DataFrame, bwX: Long, bwY: Long,
                      broadcastXRanks: Boolean = false): DataFrame = {
    val dec = DecimalType(38, 0)
    val rx0 = avgRank2(df, "x", bwX)
      .select(col("v").as("x"), col("r2").as("rx"))
    val rx = if (broadcastXRanks) broadcast(rx0) else rx0
    val ry = avgRank2(df, "y", bwY)
      .select(col("v").as("y"), col("r2").as("ry"))
    val j = df.join(rx, "x").join(ry, "y")
      .select(col("x").cast(dec).as("xd"), col("y").cast(dec).as("yd"),
        col("rx").cast(dec).as("rx"), col("ry").cast(dec).as("ry"))
    val mo = j.agg(count(lit(1)).cast(dec).as("n"),
      sum(col("xd")).as("px"), sum(col("yd")).as("py"),
      sum(col("xd") * col("xd")).as("pxx"),
      sum(col("yd") * col("yd")).as("pyy"),
      sum(col("xd") * col("yd")).as("pxy"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
    // a zero-variance column makes the denominator 0 — the correlation is
    // undefined; report NULL (NULLIF in the oracle), never divide by zero
    // (ANSI mode throws)
    val pden = sqrt((col("n") * col("pxx") - col("px") * col("px")).cast("double")) *
      sqrt((col("n") * col("pyy") - col("py") * col("py")).cast("double"))
    val sden = sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
      sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
    mo.select(col("n").cast("long").as("n_rows"),
      round((col("n") * col("pxy") - col("px") * col("py")).cast("double") /
        when(pden =!= 0.0, pden), 6).as("pearson_r"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        when(sden =!= 0.0, sden), 6).as("spearman_rho"))
  }

  private val qualitySpearman = Q(
    "quality_spearman",
    (s, dir) => pearsonSpearman(
      t(s, dir, "lineitem").select(
        round(col("l_quantity")).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y")),
      bwX = 8L, bwY = 500000L, broadcastXRanks = true),
    Some("""WITH d AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x,
           |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem),
           |vx AS (SELECT x AS v, count(*) AS cnt FROM d GROUP BY 1),
           |rx AS (SELECT v AS x, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    + cnt + 1 AS rx FROM vx),
           |vy AS (SELECT y AS v, count(*) AS cnt FROM d GROUP BY 1),
           |ry AS (SELECT v AS y, 2 * COALESCE(SUM(cnt) OVER (ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    + cnt + 1 AS ry FROM vy),
           |j AS (SELECT CAST(x AS DECIMAL(38,0)) AS xd,
           |    CAST(y AS DECIMAL(38,0)) AS yd,
           |    CAST(rx AS DECIMAL(38,0)) AS rx,
           |    CAST(ry AS DECIMAL(38,0)) AS ry
           |  FROM d JOIN rx USING (x) JOIN ry USING (y)),
           |mo AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
           |    SUM(xd) AS px, SUM(yd) AS py, SUM(xd * xd) AS pxx,
           |    SUM(yd * yd) AS pyy, SUM(xd * yd) AS pxy,
           |    SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * rx) AS sxx,
           |    SUM(ry * ry) AS syy, SUM(rx * ry) AS sxy FROM j)
           |SELECT CAST(n AS BIGINT) AS n_rows,
           |  round(CAST(n * pxy - px * py AS DOUBLE) /
           |    NULLIF(sqrt(CAST(n * pxx - px * px AS DOUBLE)) *
           |     sqrt(CAST(n * pyy - py * py AS DOUBLE)), 0.0), 6) AS pearson_r,
           |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |    NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           |     sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0), 6) AS spearman_rho
           |FROM mo""".stripMargin))

  /** Distinct l-diversity audit over the (nation, market-segment) quasi-
    * identifier with order priority as the sensitive attribute — the
    * release gate [[privacyKAnon]] misses: a group can be k-anonymous and
    * still leak if every member shares one sensitive value (homogeneity
    * attack, Machanavajjhala et al. 2007). Reports each QI group's size k,
    * its sensitive diversity l, and the l ≥ 3 release flag — the 25 most
    * at-risk groups first. One join plus one two-phase aggregate with a
    * distinct count; the QI group frame is bounded by the QI domain, not
    * the row count. All-integer outputs.
    */
  private val privacyLDiversity = Q(
    "privacy_l_diversity",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("k_size"),
          countDistinct(col("o_orderpriority")).as("l_div"))
        .withColumn("safe_l3", col("l_div") >= 3)
        .orderBy(col("l_div"), col("k_size").desc, col("nation"),
          col("segment"))
        .limit(25)
    },
    Some("""SELECT c_nationkey AS nation, c_mktsegment AS segment,
           |  count(*) AS k_size, count(DISTINCT o_orderpriority) AS l_div,
           |  count(DISTINCT o_orderpriority) >= 3 AS safe_l3
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY 1, 2
           |ORDER BY l_div, k_size DESC, nation, segment LIMIT 25""".stripMargin))

  /** One-way ANOVA F of line-item revenue (CENTS, exact) across return-flag
    * groups — the "does the group mean differ more than within-group noise
    * explains?" audit that completes the stat-test family (χ² = two
    * categoricals, KS = two distributions, Spearman/Pearson = two
    * numerics, ANOVA = numeric across k groups). A pipeline runs it before
    * trusting a segmentation: if F ≈ 1 the segments are noise.
    *
    * Scale shape: ONE two-phase aggregate yields each group's exact
    * (n, Σx, Σx²) in DECIMAL(38,0) (Σx² ≲ 10¹²·(10⁷)² = 10²⁶ at lake
    * scale — past long range, within decimal); the k-row group frame then
    * reduces to grand totals and the between/within sums of squares.
    * Determinism: every moment is exact until the final casts; SS terms are
    * single IEEE subtract/divide chains on identically-derived doubles,
    * per-group terms summed via the order-independent [[dsumFine]]; the
    * oracle mirrors the tree. Degenerate inputs (k = 1 or SSW = 0) yield
    * NULL F via the NULLIF convention.
    */
  private val qualityAnova = Q(
    "quality_anova",
    (s, dir) => {
      // row-level cents ride DECIMAL(18,0): the square then fits the
      // (36,0) multiply result and only the SUM widens to (38,0) — a
      // (38,0)×(38,0) multiply would overflow the decimal width itself
      val v = round(col("l_extendedprice") * 100).cast(DecimalType(18, 0))
      val g = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("ng"), sum(v).as("s1"), sum(v * v).as("s2"))
      // the between-group terms s1²/n_g reach ~10¹⁸ even at sf0.01 (and
      // ~10²⁴ at lake scale) — past dsumFine's DECIMAL(38,20) integer
      // headroom, so this one sum rides scale 12 (26 integer digits)
      val gt = g.agg(count(lit(1)).as("k"),
        sum(col("ng")).as("n"), sum(col("s1")).as("t1"), sum(col("s2")).as("t2"),
        sum((col("s1").cast("double") * col("s1").cast("double") /
          col("ng").cast("double")).cast(DecimalType(38, 12)))
          .cast("double").as("bsum"))
      val sst = col("t2").cast("double") -
        col("t1").cast("double") * col("t1").cast("double") / col("n").cast("double")
      val ssb = col("bsum") -
        col("t1").cast("double") * col("t1").cast("double") / col("n").cast("double")
      val ssw = sst - ssb
      val f = (ssb / (col("k") - 1).cast("double")) /
        when(ssw =!= 0.0 && col("n") > col("k"),
          ssw / (col("n") - col("k")).cast("double"))
      gt.select(col("k").as("n_groups"), col("n").as("n_rows"),
        round(sst, 4).as("ss_total"), round(ssb, 4).as("ss_between"),
        round(ssw, 4).as("ss_within"), round(f, 6).as("f_stat"))
    },
    Some("""WITH g AS (SELECT l_returnflag AS grp, count(*) AS ng,
           |    CAST(SUM(CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s1,
           |    CAST(SUM(CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))
           |           * CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s2
           |  FROM lineitem GROUP BY 1),
           |gt AS (SELECT count(*) AS k, CAST(SUM(ng) AS BIGINT) AS n,
           |    CAST(SUM(s1) AS DECIMAL(38,0)) AS t1, CAST(SUM(s2) AS DECIMAL(38,0)) AS t2,
           |    CAST(SUM(CAST(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
           |        / CAST(ng AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS bsum
           |  FROM g),
           |ss AS (SELECT k, n,
           |    CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE) AS sst,
           |    bsum - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(n AS DOUBLE) AS ssb
           |  FROM gt)
           |SELECT k AS n_groups, n AS n_rows, round(sst, 4) AS ss_total,
           |  round(ssb, 4) AS ss_between, round(sst - ssb, 4) AS ss_within,
           |  round((ssb / CAST(k - 1 AS DOUBLE)) /
           |    NULLIF(CASE WHEN n > k THEN (sst - ssb) / CAST(n - k AS DOUBLE)
           |           ELSE 0.0 END, 0.0), 6) AS f_stat
           |FROM ss""".stripMargin))

  /** Kendall τ-b of quantity vs discount — the third monotone-association
    * statistic, completing Pearson (linear) and Spearman (rank-linear):
    * τ counts concordant vs discordant PAIRS, the most robust of the three
    * to outliers and the one with a direct probabilistic reading
    * (P(agree) − P(disagree)). τ-b corrects both tie margins.
    *
    * Scale shape — the pair count without the pair join: both variables
    * are small-DOMAIN integers (quantity 1–50, discount 0–10 cents), so
    * concordance reduces to the JOINT FREQUENCY GRID (≤ 550 cells): C and
    * D are sums of nᵢ·nⱼ over strictly-ordered cell pairs — a self-join of
    * the ≤ 550-row grid (broadcast, bounded by the DOMAIN² not the corpus,
    * the quality_chi2 grid stance), after ONE two-phase count over the
    * fact. Tie terms come from the grid margins. Determinism: cell counts
    * are exact longs; C, D, and the tie sums are exact DECIMAL(38,0)
    * (nᵢ·nⱼ ≲ 10²⁴ at lake scale); τ-b is 5 IEEE ops on exactly-derived
    * doubles, mirrored literally; zero-variance margins yield NULL via
    * NULLIF.
    */
  private val qualityKendallTau = Q(
    "quality_kendall_tau",
    (s, dir) => {
      val dec = DecimalType(38, 0)
      val grid = t(s, dir, "lineitem")
        .select(round(col("l_quantity")).cast("long").as("x"),
          round(col("l_discount") * 100).cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).cast(dec).as("c"))
      val a = grid.select(col("x").as("xa"), col("y").as("ya"), col("c").as("ca"))
      val b = grid.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
      val pairs = a.join(broadcast(b), col("xb") > col("xa"))
        .agg(sum(when(col("yb") > col("ya"), col("ca") * col("cb"))
            .otherwise(lit(0).cast(dec))).as("cc"),
          sum(when(col("yb") < col("ya"), col("ca") * col("cb"))
            .otherwise(lit(0).cast(dec))).as("dd"))
      // DOUBLED pair counts (m = 2·"n choose 2" = t·(t−1)) keep everything
      // in exact decimal PRODUCTS — no decimal division, whose result
      // scale differs between engines; τ-b is algebraically identical:
      // τ = 2(C−D)/√((m0−m1)(m0−m2))
      val xm = grid.groupBy("x").agg(sum(col("c")).as("t"))
        .agg(sum(col("t") * (col("t") - 1)).as("m1"))
      val ym = grid.groupBy("y").agg(sum(col("c")).as("t"))
        .agg(sum(col("t") * (col("t") - 1)).as("m2"))
      val nn = grid.agg(sum(col("c")).as("n"))
        .select(col("n"), (col("n") * (col("n") - 1)).as("m0"))
      pairs.crossJoin(broadcast(xm)).crossJoin(broadcast(ym))
        .crossJoin(broadcast(nn))
        .select(col("n").cast("long").as("n_rows"),
          // DOUBLE readout, NOT long and NOT raw decimal: C/D are Σ nᵢ·nⱼ
          // products that pass 2⁶³ around 10¹⁰ rows (a long cast silently
          // corrupts at lake scale), while a raw DECIMAL readout hashes
          // differently across engines (the r11 regression). float64 is
          // exact below 2⁵³ — every realistic fixture — and hash-stable.
          // The arithmetic stays on exact decimals; only the readout casts.
          col("cc").cast("double").as("concordant"),
          col("dd").cast("double").as("discordant"),
          round(lit(2.0) * (col("cc") - col("dd")).cast("double") /
            when(col("m0") > col("m1") && col("m0") > col("m2"),
              sqrt((col("m0") - col("m1")).cast("double")) *
                sqrt((col("m0") - col("m2")).cast("double"))), 6).as("tau_b"))
    },
    Some("""WITH grid AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x,
           |    CAST(round(l_discount * 100) AS BIGINT) AS y,
           |    CAST(count(*) AS DECIMAL(38,0)) AS c
           |  FROM lineitem GROUP BY 1, 2),
           |pairs AS (SELECT
           |    CAST(SUM(CASE WHEN b.y > a.y THEN a.c * b.c ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS cc,
           |    CAST(SUM(CASE WHEN b.y < a.y THEN a.c * b.c ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS dd
           |  FROM grid a JOIN grid b ON b.x > a.x),
           |xm AS (SELECT CAST(SUM(t * (t - 1)) AS DECIMAL(38,0)) AS m1
           |  FROM (SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS t FROM grid GROUP BY x)),
           |ym AS (SELECT CAST(SUM(t * (t - 1)) AS DECIMAL(38,0)) AS m2
           |  FROM (SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS t FROM grid GROUP BY y)),
           |nn AS (SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS n,
           |    CAST(SUM(c) AS DECIMAL(38,0)) * (CAST(SUM(c) AS DECIMAL(38,0)) - 1) AS m0
           |  FROM grid)
           |SELECT CAST(n AS BIGINT) AS n_rows,
           |  CAST(cc AS DOUBLE) AS concordant,
           |  CAST(dd AS DOUBLE) AS discordant,
           |  round(2.0 * CAST(cc - dd AS DOUBLE) /
           |    NULLIF(CASE WHEN m0 > m1 AND m0 > m2
           |      THEN sqrt(CAST(m0 - m1 AS DOUBLE)) * sqrt(CAST(m0 - m2 AS DOUBLE))
           |      ELSE 0.0 END, 0.0), 6) AS tau_b
           |FROM pairs CROSS JOIN xm CROSS JOIN ym CROSS JOIN nn""".stripMargin))

  /** t-closeness audit — the third rung of the re-identification ladder
    * (k-anonymity = class size, l-diversity = distinct sensitive values,
    * t-closeness = the sensitive DISTRIBUTION itself): a class can be
    * large AND diverse yet still leak ("everyone in this class is in the
    * top balance bands"). t is the Earth Mover's Distance between the
    * class's banded-balance distribution and the global one — for an
    * ordered attribute the closed form Σ|cumQ − cumP| / (m−1) (Li et al.
    * 2007). Reports the 15 farthest classes; at_risk = t > 0.3.
    *
    * Scale shape: one two-phase (class, band) count; the EMD cumulative
    * runs in a window PARTITIONED BY CLASS over the ≤ m-band frame, with
    * the m-row global distribution broadcast — nothing unpartitioned,
    * nothing fact-sized downstream of the first aggregate. ZERO class
    * bands contribute |0 − cumP| spans, handled by crossing the class list
    * with the band domain so cum gaps are exact. Counts exact; cum
    * fractions are integer ratios; one 6-dp round.
    */
  private val privacyTCloseness = Q(
    "privacy_t_closeness",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment").as("segment"),
          col("c_nationkey").as("nation"),
          floor(col("c_acctbal") / 1000).cast("long").as("band"))
      val cls = c.groupBy("segment", "nation", "band")
        .agg(count(lit(1)).as("cnt"))
      val classes = cls.groupBy("segment", "nation").agg(sum(col("cnt")).as("k"))
      val bands = c.groupBy("band").agg(count(lit(1)).as("gcnt"))
      val n = c.agg(count(lit(1)).as("n"))
      val m = bands.agg(count(lit(1)).as("m"))
      // dense class × band grid so zero cells carry their cum gap
      val grid = classes.crossJoin(broadcast(bands.select("band")))
        .join(cls, Seq("segment", "nation", "band"), "left")
        .select(col("segment"), col("nation"), col("band"), col("k"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
      val w = Window.partitionBy("segment", "nation").orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
      val gw = Window.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
      val gcum = bands.select(col("band"),
        sum(col("gcnt")).over(gw).as("gcum"))
      grid
        .withColumn("ccum", sum(col("cnt")).over(w))
        .join(broadcast(gcum), "band")
        .crossJoin(broadcast(n)).crossJoin(broadcast(m))
        .groupBy("segment", "nation", "k", "m")
        .agg(dsumFine(abs(col("ccum").cast("double") / col("k") -
          col("gcum").cast("double") / col("n"))).as("gapsum"))
        .select(col("segment"), col("nation"), col("k").as("class_size"),
          round((col("gapsum") / (col("m") - 1).cast("double")), 6).as("t_dist"),
          ((col("gapsum") / (col("m") - 1).cast("double")) > 0.3).as("at_risk"))
        .orderBy(col("t_dist").desc, col("segment"), col("nation")).limit(15)
    },
    Some("""WITH c AS (SELECT c_mktsegment AS segment, c_nationkey AS nation,
           |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band FROM customer),
           |cls AS (SELECT segment, nation, band, count(*) AS cnt
           |        FROM c GROUP BY 1, 2, 3),
           |classes AS (SELECT segment, nation, CAST(SUM(cnt) AS BIGINT) AS k
           |            FROM cls GROUP BY 1, 2),
           |bands AS (SELECT band, count(*) AS gcnt FROM c GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM c),
           |m AS (SELECT count(*) AS m FROM bands),
           |grid AS (SELECT classes.segment, classes.nation, bands.band, k,
           |    COALESCE(cnt, 0) AS cnt
           |  FROM classes CROSS JOIN bands
           |  LEFT JOIN cls ON cls.segment = classes.segment
           |    AND cls.nation = classes.nation AND cls.band = bands.band),
           |gcum AS (SELECT band, CAST(SUM(gcnt) OVER (ORDER BY band
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum FROM bands),
           |cc AS (SELECT segment, nation, grid.band, k, gcum,
           |    CAST(SUM(cnt) OVER (PARTITION BY segment, nation ORDER BY grid.band
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum
           |  FROM grid JOIN gcum ON grid.band = gcum.band),
           |t AS (SELECT segment, nation, k,
           |    CAST(SUM(CAST(abs(CAST(ccum AS DOUBLE) / k
           |        - CAST(gcum AS DOUBLE) / n.n) AS DECIMAL(38,20))) AS DOUBLE)
           |      / (m.m - 1) AS t_dist
           |  FROM cc CROSS JOIN n CROSS JOIN m GROUP BY segment, nation, k, m.m)
           |SELECT segment, nation, k AS class_size, round(t_dist, 6) AS t_dist,
           |  t_dist > 0.3 AS at_risk
           |FROM t ORDER BY t_dist DESC, segment, nation LIMIT 15""".stripMargin))

  /** Two-feature closed-form OLS — revenue on (quantity, discount) via the
    * centered 2×2 normal equations: the multivariate step past
    * ml_ols_trend's single regressor, answering "holding quantity fixed,
    * what does a discount point do to revenue?" — the partial-effect
    * question a simple trend conflates. Slopes from the scaled covariance
    * system (S11·S22 − S12²), intercept from the means, R² by the
    * explained-share identity (b1·S1y + b2·S2y)/Syy — all from ONE pass.
    *
    * Scale shape: ONE two-phase aggregate of 9 sufficient statistics
    * (mergeable partials — shards compose by addition, the ml_ols_trend /
    * ml_kfold_cv property). Determinism: x's are small exact ints, y is
    * cents; every Σ is exact in DECIMAL(38,0) (cross-moments ≲ 10³² at
    * lake scale); the scaled S-terms and the 2×2 solve are IEEE ops on
    * exactly-derived doubles, identical expression trees both engines
    * (S-products would exceed decimal width — documented, deliberate).
    * A singular system (det = 0: a constant or collinear feature) yields
    * NULL slopes via the NULLIF convention.
    */
  private val mlOlsMulti = Q(
    "ml_ols_multi",
    (s, dir) => {
      val dec = DecimalType(18, 0)
      val d = t(s, dir, "lineitem").select(
        round(col("l_quantity")).cast(dec).as("x1"),
        round(col("l_discount") * 100).cast(dec).as("x2"),
        round(col("l_extendedprice") * 100).cast(dec).as("y"))
      val mo = d.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
        sum(col("x1") * col("x1")).as("s11"), sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"), sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"), sum(col("y") * col("y")).as("syy"))
      def dd(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        c.cast("double")
      val n = dd(col("n"))
      val (cs11, cs22, cs12) = (n * dd(col("s11")) - dd(col("s1")) * dd(col("s1")),
        n * dd(col("s22")) - dd(col("s2")) * dd(col("s2")),
        n * dd(col("s12")) - dd(col("s1")) * dd(col("s2")))
      val cs1y = n * dd(col("s1y")) - dd(col("s1")) * dd(col("sy"))
      val cs2y = n * dd(col("s2y")) - dd(col("s2")) * dd(col("sy"))
      val csyy = n * dd(col("syy")) - dd(col("sy")) * dd(col("sy"))
      val det = cs11 * cs22 - cs12 * cs12
      val b1 = (cs22 * cs1y - cs12 * cs2y) / when(det =!= 0.0, det)
      val b2 = (cs11 * cs2y - cs12 * cs1y) / when(det =!= 0.0, det)
      mo.select(col("n").as("n_rows"),
        round(b1, 6).as("b_quantity"),
        round(b2, 6).as("b_discount"),
        round((dd(col("sy")) - b1 * dd(col("s1")) - b2 * dd(col("s2"))) / n, 6)
          .as("intercept"),
        round((b1 * cs1y + b2 * cs2y) / when(csyy =!= 0.0, csyy), 6).as("r2"))
    },
    Some("""WITH d AS (SELECT CAST(round(l_quantity) AS DECIMAL(18,0)) AS x1,
           |    CAST(round(l_discount * 100) AS DECIMAL(18,0)) AS x2,
           |    CAST(round(l_extendedprice * 100) AS DECIMAL(18,0)) AS y
           |  FROM lineitem),
           |mo AS (SELECT count(*) AS n,
           |    CAST(SUM(x1) AS DECIMAL(38,0)) AS s1, CAST(SUM(x2) AS DECIMAL(38,0)) AS s2,
           |    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
           |    CAST(SUM(x1 * x1) AS DECIMAL(38,0)) AS s11,
           |    CAST(SUM(x2 * x2) AS DECIMAL(38,0)) AS s22,
           |    CAST(SUM(x1 * x2) AS DECIMAL(38,0)) AS s12,
           |    CAST(SUM(x1 * y) AS DECIMAL(38,0)) AS s1y,
           |    CAST(SUM(x2 * y) AS DECIMAL(38,0)) AS s2y,
           |    CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
           |  FROM d),
           |c AS (SELECT n,
           |    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
           |    CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS cs11,
           |    CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cs22,
           |    CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cs12,
           |    CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs1y,
           |    CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs2y,
           |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS csyy
           |  FROM mo),
           |b AS (SELECT n, s1, s2, sy, cs1y, cs2y, csyy,
           |    (cs22 * cs1y - cs12 * cs2y) / NULLIF(cs11 * cs22 - cs12 * cs12, 0.0) AS b1,
           |    (cs11 * cs2y - cs12 * cs1y) / NULLIF(cs11 * cs22 - cs12 * cs12, 0.0) AS b2
           |  FROM c)
           |SELECT n AS n_rows, round(b1, 6) AS b_quantity, round(b2, 6) AS b_discount,
           |  round((sy - b1 * s1 - b2 * s2) / CAST(n AS DOUBLE), 6) AS intercept,
           |  round((b1 * cs1y + b2 * cs2y) / NULLIF(csyy, 0.0), 6) AS r2
           |FROM b""".stripMargin))

  val queries: Seq[Q] = Seq(reshapeUnpivot, qualityBenford, qualityMadOutliers,
    eventsGapFill, sampleWeighted, eventsInterpolate, qualityPsiDrift,
    qualityWinsorize, ordersItemCf, privacyKAnon, privacyDpCounts,
    qualityChi2, qualityKsTest, qualitySpearman, privacyLDiversity,
    qualityAnova, qualityKendallTau, privacyTCloseness, mlOlsMulti)
}
