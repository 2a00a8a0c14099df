package graft.operators

import graft.{Q, Tables}
import graft.functions.Deterministic._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
      val cents = (col("o_totalprice") * 100).cast("long")
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
           |    CAST(o_totalprice * 100 AS BIGINT) AS c FROM orders),
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

  val queries: Seq[Q] = Seq(reshapeUnpivot, qualityBenford, qualityMadOutliers,
    eventsGapFill, sampleWeighted)
}
