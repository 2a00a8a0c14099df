package graft.operators

import graft.{Q, Tables}
import graft.functions.Deterministic._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining canonical decision-support plan shapes (SURVEY.md §2 [EXT]
  * query parity, TPC-H-derived): existence semi-aggregation, global-scalar
  * HAVING, max-over-aggregate selection, exclusion anti-join with distinct
  * counting, correlated per-key average, disjunctive predicate pushdown,
  * and anti-join against a scalar-subquery threshold. Together with the
  * Q1/Q3/Q5/Q6/Q7/Q10/Q13/Q14/Q18 shapes in [[Relational]] this closes the
  * classic ad-hoc-reporting plan space over the star schema.
  *
  * Scale notes: every aggregate is a two-phase hash aggregate; every dim or
  * derived threshold frame is broadcast (part/supplier/nation are dims; the
  * per-part thresholds of q17 are vocabulary-sized, never fact-sized); the
  * only fact-sized shuffles are the group-bys on their natural keys.
  * Determinism (SURVEY.md §7.4): money sums ride exact decimals ([[dsum]]/
  * [[dmul]]) and threshold comparisons are single IEEE ops mirrored
  * structurally in the oracle SQL.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** TPC-H Q4 shape — priority count of orders that HAVE at least one
    * returned line: a left-semi join (EXISTS) feeding a small group-by.
    * The semi join shuffles both sides on the order key once; no
    * duplication of the probe side ever materializes.
    */
  private val q4OrderPriority = Q(
    "q4_order_priority",
    (s, dir) => {
      val returned = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
           |FROM orders
           |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** TPC-H Q11 shape — parts whose revenue (restricted to suppliers of a
    * nation group) exceeds a FRACTION OF THE GLOBAL TOTAL: the per-key
    * aggregate is compared against a broadcast 1-row global scalar, the
    * relational HAVING-over-subquery pattern. The supplier subset is a
    * broadcast semi-join; both the per-part and the global sums come off
    * the same filtered base in exact decimal, so the share threshold is
    * one mirrored IEEE multiply + compare.
    */
  private val q11ImportantParts = Q(
    "q11_important_parts",
    (s, dir) => {
      val nations = Seq("NATION_1", "NATION_2", "NATION_3")
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name").isin(nations: _*))),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("s_suppkey"))
      val base = t(s, dir, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("l_partkey"),
          dmul(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("v"))
      val pv = base.groupBy("l_partkey")
        .agg(sum(col("v")).cast("double").as("part_value"))
      val tot = base.agg(sum(col("v")).cast("double").as("tv"))
      pv.crossJoin(broadcast(tot))
        .filter(col("part_value") > col("tv") * lit(0.001))
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },
    Some("""WITH sup AS (SELECT s_suppkey FROM supplier JOIN nation
           |              ON s_nationkey = n_nationkey
           |             WHERE n_name IN ('NATION_1','NATION_2','NATION_3')),
           |base AS (SELECT l_partkey,
           |    CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2)) AS v
           |  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM sup)),
           |pv AS (SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
           |       FROM base GROUP BY l_partkey),
           |tot AS (SELECT CAST(SUM(v) AS DOUBLE) AS tv FROM base)
           |SELECT l_partkey, part_value FROM pv, tot
           |WHERE part_value > tv * 0.001
           |ORDER BY part_value DESC, l_partkey""".stripMargin))

  /** TPC-H Q15 shape — the supplier(s) achieving MAXIMUM revenue in a
    * quarter: aggregate, reduce to a broadcast 1-row max, and select the
    * argmax rows by equality (exact — both sides are the same decimal-sum
    * double). The classic "top view" without a second scan of the fact.
    */
  private val q15TopSupplier = Q(
    "q15_top_supplier",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dmul(col("l_extendedprice"), lit(1.0) - col("l_discount")))
          .cast("double").as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH rev AS (SELECT l_suppkey,
           |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE)
           |      AS total_revenue
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue
           |FROM rev JOIN supplier ON l_suppkey = s_suppkey
           |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
           |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q16 shape — supplier variety per part attribute bucket with an
    * EXCLUSION list: a broadcast anti-join removes blocklisted suppliers
    * (negative balance — the "complaints" analogue), then count(DISTINCT)
    * per (brand, type, size). The distinct-count is Spark's two-phase
    * partial-distinct aggregate; the blocklist stays a broadcast no matter
    * the fact size.
    */
  private val q16PartsSuppliers = Q(
    "q16_parts_suppliers",
    (s, dir) => {
      val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29)
      val excl = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(sizes: _*))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
           |  count(DISTINCT l_suppkey) AS supplier_cnt
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE p_brand <> 'Brand#1'
           |  AND p_size IN (1,5,9,13,17,21,25,29)
           |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           |GROUP BY p_brand, p_type, p_size
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** TPC-H Q17 shape — revenue lost to small-quantity orders: each line of
    * a brand's parts compares against ITS PART'S average quantity (a
    * correlated aggregate). The thresholds are one group-by over the
    * brand-restricted lines — vocabulary-sized (≤ |part|), so they
    * broadcast back onto the same lines; the fact is scanned once.
    * The 0.2·avg threshold is decimal-sum / count, one multiply — mirrored.
    */
  private val q17SmallQtyRevenue = Q(
    "q17_small_qty_revenue",
    (s, dir) => {
      val pk = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
      val sel = t(s, dir, "lineitem")
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val thr = sel.groupBy("l_partkey")
        .agg((lit(0.2) * (dsum(col("l_quantity")) / count(lit(1))))
          .as("qty_thr"))
        .withColumnRenamed("l_partkey", "t_partkey")
      sel.join(broadcast(thr), col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },
    Some("""WITH sel AS (SELECT l_partkey, l_quantity, l_extendedprice
           |  FROM lineitem
           |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')),
           |thr AS (SELECT l_partkey,
           |    0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS qty_thr
           |  FROM sel GROUP BY l_partkey)
           |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
           |FROM sel JOIN thr USING (l_partkey)
           |WHERE l_quantity < qty_thr""".stripMargin))

  /** TPC-H Q19 shape — disjunctive (OR-of-ANDs) predicate spanning both
    * join sides: the part-side conjuncts (brand, size) evaluate on the
    * broadcast dim, the line-side conjuncts (quantity) on the fact, and
    * Catalyst pushes the common `p_size >= 1` / quantity range bounds
    * below the join while the residual OR rides on top. One scan, one
    * broadcast join, one exact-decimal sum.
    */
  private val q19DisjunctivePushdown = Q(
    "q19_disjunctive_pushdown",
    (s, dir) => {
      val branch = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#2", 1, 5, 1, 11) ||
          branch("Brand#4", 1, 10, 10, 20) ||
          branch("Brand#5", 1, 15, 20, 30))
        .agg(sum(dmul(col("l_extendedprice"), lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE)
           |  AS revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
           |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  /** TPC-H Q22 shape — above-average-balance customers with NO recent
    * urgent order: a scalar-subquery threshold (broadcast 1-row average of
    * positive balances) plus an anti-join against the filtered fact,
    * grouped by segment. The anti-join shuffles on the customer key; the
    * threshold is [[davg]]-deterministic (exact decimal sum / count, one
    * divide). The anti side is date+priority-filtered so the result is
    * non-degenerate at every scale (the unfiltered "never ordered" variant
    * empties out as orders-per-customer grows with SF).
    */
  private val q22SalesOpportunity = Q(
    "q22_sales_opportunity",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val avgPos = c.filter(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("ab"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgPos))
        .filter(col("c_acctbal") > col("ab"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("segment")
    },
    Some("""SELECT c_mktsegment AS segment, count(*) AS numcust,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
           |FROM customer
           |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           |                   FROM customer WHERE c_acctbal > 0)
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey
           |                    AND o_orderpriority = '1-URGENT'
           |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
           |GROUP BY c_mktsegment ORDER BY segment""".stripMargin))

  /** TPC-H Q2 shape — argmin selection against a CORRELATED MIN subquery:
    * per-(part, supplier) unit cost (the partsupp analogue, derived by
    * aggregating the fact since this schema carries no partsupp table),
    * restricted to suppliers of one region, keeping only the offers that
    * achieve their part's minimum. The per-part min frame is part-sized
    * (vocabulary, not fact) and joins back on the part key — a plain
    * shuffle equi-join that AQE may broadcast when small; the region
    * supplier list is always a broadcast. Equality on the min is exact:
    * both sides are the same decimal-sum-derived double.
    */
  private val q2MinCostSupplier = Q(
    "q2_min_cost_supplier",
    (s, dir) => {
      val regSup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val pk = t(s, dir, "part")
        .filter(col("p_type") === "LARGE").select(col("p_partkey"))
      val offers = t(s, dir, "lineitem")
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(regSup.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg((dsum(col("l_extendedprice")) / dsum(col("l_quantity")))
          .as("unit_cost"))
      val mn = offers.groupBy(col("l_partkey").as("m_partkey"))
        .agg(min(col("unit_cost")).as("mn"))
      offers
        .join(mn, col("l_partkey") === col("m_partkey") &&
          col("unit_cost") === col("mn"))
        .join(broadcast(regSup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("l_partkey"), col("unit_cost"))
        .orderBy(col("s_acctbal").desc, col("s_name"), col("l_partkey"))
        .limit(100)
    },
    Some("""WITH regsup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
           |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
           |offers AS (SELECT l_partkey, l_suppkey,
           |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           |      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit_cost
           |  FROM lineitem
           |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'LARGE')
           |    AND l_suppkey IN (SELECT s_suppkey FROM regsup)
           |  GROUP BY l_partkey, l_suppkey)
           |SELECT s_acctbal, s_name, n_name, l_partkey, unit_cost
           |FROM offers JOIN regsup ON l_suppkey = s_suppkey
           |WHERE unit_cost = (SELECT min(unit_cost) FROM offers o2
           |                   WHERE o2.l_partkey = offers.l_partkey)
           |ORDER BY s_acctbal DESC, s_name, l_partkey LIMIT 100""".stripMargin))

  /** TPC-H Q8 shape — national market share: one nation's fraction of a
    * region's import revenue per year, i.e. a conditional-sum / total-sum
    * ratio over a 6-way star join (fact → orders → customer →
    * customer-nation → region on one arm; → part, → supplier →
    * supplier-nation on the others). Every dimension arm is a broadcast;
    * the fact shuffles once for the orders equi-join and once for the
    * year group-by. Both sums ride the same exact decimal; the share is
    * one mirrored IEEE divide.
    */
  private val q8MarketShare = Q(
    "q8_market_share",
    (s, dir) => {
      val n = t(s, dir, "nation")
      val custRegion = t(s, dir, "customer")
        .join(broadcast(n
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supNation = t(s, dir, "supplier")
        .join(broadcast(n.select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate")).as("o_year"), col("supp_nation"),
          dmul(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("v"))
        .groupBy("o_year")
        .agg((sum(when(col("supp_nation") === "NATION_2", col("v"))
          .otherwise(lit(0).cast("decimal(16,4)"))).cast("double") /
          sum(col("v")).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
           |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2))
           |      ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
           |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE)
           |  AS mkt_share
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n2 ON s_nationkey = n2.n_nationkey
           |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
           |  AND o_custkey IN (SELECT c_custkey FROM customer
           |                    JOIN nation ON c_nationkey = n_nationkey
           |                    JOIN region ON n_regionkey = r_regionkey
           |                    WHERE r_name = 'AMERICA')
           |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY 1 ORDER BY o_year""".stripMargin))

  /** TPC-H Q9 shape — product-line profit by (supplier nation, year):
    * revenue minus cost across a part-name CONTAINS filter. The schema has
    * no partsupp supply cost, so cost is derived as half the part's retail
    * price per unit — same plan shape (fact × part × supplier × nation,
    * all dims broadcast, group on derived keys). Revenue and cost are
    * summed as exact decimals SEPARATELY and subtracted once, so the
    * double result is order-independent on both engines.
    */
  private val q9ProductProfit = Q(
    "q9_product_profit",
    (s, dir) => {
      val qtyCost = col("l_quantity").cast("decimal(12,2)") *
        col("p_retailprice").cast("decimal(12,2)") * lit(0.5).cast("decimal(2,1)")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).as("o_year"))
        .agg((sum(dmul(col("l_extendedprice"), lit(1.0) - col("l_discount"))) -
          sum(qtyCost)).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2)))
           |     - SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1)))
           |    AS DOUBLE) AS sum_profit
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE p_name LIKE '%widget%'
           |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin))

  /** TPC-H Q12 shape — late-shipment counts bucketed by order priority:
    * fact⋈orders equi-join, a date-arithmetic lateness predicate
    * (`l_shipdate > o_orderdate + 60 days` stands in for the missing
    * receipt/commit dates), and two conditional counts per line-status
    * group (the ship-mode analogue). One shuffle for the join, one for
    * the 2-key group-by.
    */
  private val q12LateShipments = Q(
    "q12_late_shipments",
    (s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
           |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
           |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
           |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  /** TPC-H Q20 shape — suppliers holding EXCESS SHARE of a part's volume:
    * nested aggregate thresholds feeding a semi-join chain. Per-(part,
    * supplier) shipped quantity is compared against the part's total and
    * supplier fan-out (`avail·n_supp > 1.5·total`, the share-of-demand
    * analogue of Q20's half-of-lineitem-qty test, non-degenerate at every
    * SF); qualifying pairs reduce to a distinct supplier list that
    * semi-joins the nation-filtered supplier dim. All aggregates are
    * two-phase on the natural keys; the qualifying-supplier list is
    * supplier-sized, broadcast into the final semi-join.
    */
  private val q20ExcessShare = Q(
    "q20_excess_share",
    (s, dir) => {
      val lines = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "SMALL")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val perPair = lines.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("avail"))
      val perPart = perPair.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum(col("avail").cast("decimal(18,2)")).cast("double").as("total"),
          count(lit(1)).as("n_supp"))
      val qualifying = perPair
        .join(perPart, col("l_partkey") === col("t_partkey"))
        .filter(col("avail") * col("n_supp") > col("total") * lit(1.5))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    },
    Some("""WITH lines AS (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
           |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
           |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
           |pair AS (SELECT l_partkey, l_suppkey,
           |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS avail
           |  FROM lines GROUP BY 1, 2),
           |part_tot AS (SELECT l_partkey,
           |    CAST(SUM(CAST(avail AS DECIMAL(18,2))) AS DOUBLE) AS total,
           |    count(*) AS n_supp
           |  FROM pair GROUP BY 1)
           |SELECT s_name, s_acctbal FROM supplier
           |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
           |  AND s_suppkey IN (SELECT DISTINCT p.l_suppkey FROM pair p
           |                    JOIN part_tot t ON p.l_partkey = t.l_partkey
           |                    WHERE p.avail * t.n_supp > t.total * 1.5)
           |ORDER BY s_name""".stripMargin))

  /** TPC-H Q21 shape — the supplier who kept the order waiting: in each
    * finished multi-supplier order, find the UNIQUE supplier whose line
    * shipped last (exists another supplier's line; not exists another
    * supplier's line at the max ship date). The correlated EXISTS /
    * NOT-EXISTS pair is computed without self-join storms: one group-by
    * derives each order's max ship date, a join-back + second group-by
    * counts total and at-max suppliers, and the blocking lines are
    * selected by equality on the max. Three fact shuffles total, all on
    * the order key, so AQE coalesces them onto one exchange layout.
    */
  private val q21WaitingSupplier = Q(
    "q21_waiting_supplier",
    (s, dir) => {
      val f = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val mx = f.groupBy(col("l_orderkey").as("m_orderkey"))
        .agg(max(col("l_shipdate")).as("mx"))
      val fm = f.join(mx, col("l_orderkey") === col("m_orderkey"))
      val st = fm.groupBy(col("l_orderkey").as("s_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("ns"),
          countDistinct(when(col("l_shipdate") === col("mx"), col("l_suppkey")))
            .as("nm"))
      val blockers = fm.filter(col("l_shipdate") === col("mx"))
        .join(st, col("l_orderkey") === col("s_orderkey"))
        .filter(col("ns") > 1 && col("nm") === 1)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      blockers
        .join(broadcast(t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"), "left_semi")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },
    Some("""WITH f AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
           |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')),
           |mx AS (SELECT l_orderkey, max(l_shipdate) AS m FROM f GROUP BY 1),
           |st AS (SELECT f.l_orderkey, count(DISTINCT f.l_suppkey) AS ns,
           |    count(DISTINCT CASE WHEN f.l_shipdate = m THEN f.l_suppkey END) AS nm
           |  FROM f JOIN mx USING (l_orderkey) GROUP BY 1),
           |blk AS (SELECT DISTINCT f.l_orderkey, f.l_suppkey
           |  FROM f JOIN mx ON f.l_orderkey = mx.l_orderkey AND f.l_shipdate = mx.m
           |  JOIN st ON f.l_orderkey = st.l_orderkey
           |  WHERE st.ns > 1 AND st.nm = 1)
           |SELECT s_name, count(*) AS numwait
           |FROM blk JOIN supplier ON l_suppkey = s_suppkey
           |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
           |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin))

  /** Bot / automation detection over the event stream — the abuse-filtering
    * rung of a curation pipeline (scraped, scripted, or replayed traffic
    * poisons both analytics and training corpora): per-user volume rate
    * (events per active day) and inter-event REGULARITY (squared
    * coefficient of variation of the gap sequence — human activity is
    * bursty, CV² ≈ 1+; a timer fires on a metronome, CV² ≈ 0). is_bot
    * flags rate > 40/day OR (≥ 20 gaps AND CV² < 0.01).
    *
    * Determinism + scale: gaps are SECOND-granularity epoch diffs (exact
    * integer `epoch_us // 1e6` in both engines) between events sorted by
    * that second key — the gap MULTISET is invariant to tie order, so no
    * hidden dependence on sub-second ordering. The only window is the
    * per-user lag (high-cardinality partition key); CV² reduces to exact
    * moments m·Σg² − (Σg)² carried in DECIMAL(38,0) (Spark) / HUGEINT
    * (oracle) — a long would overflow m·Σg² for a user with ~10³ gaps
    * over a multi-year span — and the bot test compares 100·(m·Σg² −
    * (Σg)²) < (Σg)² exactly in integers (the algebraic form of
    * CV² < 0.01, no floor-division approximation). Floats appear only in
    * the rounded report columns.
    */
  private val eventsBotDetect = Q(
    "events_bot_detect",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("sec"),
          to_date(col("ts")).as("day"))
      val base = ev.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("day")).as("active_days"))
      val sq = ev.withColumn("prv",
        lag(col("sec"), 1).over(Window.partitionBy("user_id").orderBy("sec")))
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val g = sq.filter(col("prv").isNotNull)
        .select(col("user_id"), (col("sec") - col("prv")).cast(dec).as("gp"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("m"), sum(col("gp")).as("sg"),
          sum(col("gp") * col("gp")).as("sg2"))
      val mom = col("m").cast(dec) * col("sg2") - col("sg") * col("sg")
      base.join(g, Seq("user_id"), "left")
        .select(col("user_id"), col("n_events"), col("active_days"),
          round(col("n_events").cast("double") / col("active_days"), 6)
            .as("events_per_day"),
          when(coalesce(col("m"), lit(0L)) > 0,
            round(col("sg").cast("double") / col("m"), 6))
            .otherwise(lit(0.0)).as("mean_gap_s"),
          when(coalesce(col("m"), lit(0L)) > 0 && col("sg") > 0,
            round(mom.cast("double") /
              (col("sg") * col("sg")).cast("double"), 6))
            .otherwise(lit(0.0)).as("cv2"),
          (col("n_events") > lit(40) * col("active_days") ||
            (coalesce(col("m"), lit(0L)) >= 20 && col("sg") > 0 &&
              mom * lit(100) < col("sg") * col("sg"))).as("is_bot"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec,
           |    CAST(ts AS DATE) AS day FROM events),
           |base AS (SELECT user_id, count(*) AS n_events,
           |    count(DISTINCT day) AS active_days FROM ev GROUP BY user_id),
           |sq AS (SELECT user_id, sec,
           |    lag(sec) OVER (PARTITION BY user_id ORDER BY sec) AS prv FROM ev),
           |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS m,
           |    sum(CAST(sec - prv AS HUGEINT)) AS sg,
           |    sum(CAST(sec - prv AS HUGEINT) * CAST(sec - prv AS HUGEINT)) AS sg2
           |  FROM sq WHERE prv IS NOT NULL GROUP BY user_id)
           |SELECT b.user_id, CAST(b.n_events AS BIGINT) AS n_events,
           |  CAST(b.active_days AS BIGINT) AS active_days,
           |  round(CAST(b.n_events AS DOUBLE) / b.active_days, 6) AS events_per_day,
           |  CASE WHEN COALESCE(g.m, 0) > 0
           |       THEN round(CAST(g.sg AS DOUBLE) / g.m, 6)
           |       ELSE CAST(0 AS DOUBLE) END AS mean_gap_s,
           |  CASE WHEN COALESCE(g.m, 0) > 0 AND g.sg > 0
           |       THEN round(CAST(g.m * g.sg2 - g.sg * g.sg AS DOUBLE)
           |            / CAST(g.sg * g.sg AS DOUBLE), 6)
           |       ELSE CAST(0 AS DOUBLE) END AS cv2,
           |  (b.n_events > 40 * b.active_days) OR
           |    (COALESCE(g.m, 0) >= 20 AND g.sg > 0 AND
           |     100 * (g.m * g.sg2 - g.sg * g.sg) < g.sg * g.sg) AS is_bot
           |FROM base b LEFT JOIN g USING (user_id)
           |ORDER BY user_id""".stripMargin))

  /** Cohort lifetime-value triangle — customers grouped by FIRST-order
    * year, revenue tracked per order-age year, with the cumulative
    * per-customer LTV each cohort has accrued by each age (the
    * acquisition-economics readout; the events-side cohort retention
    * counts users, this one follows the money). Shapes: first-order year
    * is one per-customer aggregate joined back onto orders (key join, no
    * window over the fact); the triangle is a two-phase decimal-exact
    * aggregate on (cohort, age); the cumulative LTV window runs over that
    * TINY triangle frame partitioned by cohort (the ABC-Pareto stance:
    * ordered windows only over aggregates). cum_rev stays DECIMAL through
    * the window sum — exact — and divides by the cohort size once per
    * output row.
    */
  private val ordersCohortLtv = Q(
    "orders_cohort_ltv",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
            .as("rev"))
      val first = o.groupBy("o_custkey").agg(min(col("yr")).as("cohort"))
      val tri = o.join(first, "o_custkey")
        .groupBy(col("cohort"), (col("yr") - col("cohort")).as("age"))
        .agg(countDistinct(col("o_custkey")).as("n_active"),
          sum(col("rev")).as("revenue"))
      val size = first.groupBy("cohort")
        .agg(countDistinct(col("o_custkey")).as("n_cohort"))
      val w = Window.partitionBy("cohort").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tri.join(broadcast(size), "cohort")
        .withColumn("cum_rev", sum(col("revenue")).over(w))
        .select(col("cohort").cast("long").as("cohort"),
          col("age").cast("long").as("age"), col("n_active"), col("n_cohort"),
          col("revenue").cast("double").as("revenue"),
          round(col("cum_rev").cast("double") / col("n_cohort").cast("double"), 6)
            .as("ltv_per_customer"))
        .orderBy("cohort", "age")
    },
    Some("""WITH o AS (SELECT o_custkey, year(o_orderdate) AS yr,
           |    CAST(o_totalprice AS DECIMAL(18,2)) AS rev FROM orders),
           |f AS (SELECT o_custkey, min(yr) AS cohort FROM o GROUP BY o_custkey),
           |tri AS (SELECT cohort, yr - cohort AS age,
           |    count(DISTINCT o.o_custkey) AS n_active, SUM(rev) AS revenue
           |  FROM o JOIN f ON o.o_custkey = f.o_custkey GROUP BY 1, 2),
           |sz AS (SELECT cohort, count(DISTINCT o_custkey) AS n_cohort
           |       FROM f GROUP BY cohort),
           |c AS (SELECT tri.cohort, age, n_active, n_cohort,
           |    CAST(revenue AS DOUBLE) AS revenue,
           |    SUM(revenue) OVER (PARTITION BY tri.cohort ORDER BY age
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
           |  FROM tri JOIN sz ON tri.cohort = sz.cohort)
           |SELECT CAST(cohort AS BIGINT) AS cohort, CAST(age AS BIGINT) AS age,
           |  CAST(n_active AS BIGINT) AS n_active,
           |  CAST(n_cohort AS BIGINT) AS n_cohort, revenue,
           |  round(CAST(cum_rev AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
           |    AS ltv_per_customer
           |FROM c ORDER BY cohort, age""".stripMargin))

  /** Gini coefficient of customer-spend concentration per market segment —
    * the whale-dependence / inequality readout behind the ABC classes
    * (`orders_abc_pareto` answers "which customers form the top 80 %?";
    * Gini answers "HOW concentrated is the whole curve?" in one number,
    * comparable across segments). Uses the sorted-rank identity
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx), folded over DISTINCT spend
    * values so no per-customer rank is ever materialized: a value v with
    * count c and C predecessors contributes Σi·xᵢ = v·(c·C + c(c+1)/2).
    * The predecessor counts C need a prefix sum — the same DISTRIBUTED
    * two-level shape as `quality_ks_test`: cumulative window inside fixed
    * $100k spend bands (partitioned by segment × band), band offsets from
    * a window over the tiny per-segment band frame. Everything stays on
    * the distinct-cents frame, bounded by the price domain, not the
    * customer count.
    *
    * Determinism: spend is exact cents ([[dsum]] per customer first), all
    * rank algebra is exact DECIMAL(38,0) (Σ i·x reaches n²·x ≳ 2⁶³ at
    * lake scale), and G is ONE double division of two exact decimals.
    */
  private val ordersGini = Q(
    "orders_gini",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val spend = t(s, dir, "orders")
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("segment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("segment"), col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val vals = spend.groupBy("segment", "cents")
        .agg(count(lit(1)).as("c"))
        .withColumn("bkt", (col("cents") / 10000000L).cast("long"))
      val inb = Window.partitionBy("segment", "bkt").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      val within = vals.withColumn("wc",
        coalesce(sum(col("c")).over(inb), lit(0L)))
      val bw = Window.partitionBy("segment").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = vals.groupBy("segment", "bkt").agg(sum(col("c")).as("t"))
        .select(col("segment"), col("bkt"),
          coalesce(sum(col("t")).over(bw), lit(0L)).as("o"))
      val contrib = within.join(broadcast(off), Seq("segment", "bkt"))
        .select(col("segment"), col("cents"), col("c"),
          (col("wc") + col("o")).as("cc"))
        .select(col("segment"),
          // c(c+1) is even, so the shift is the exact triangular number —
          // a decimal "/ 2" would drag in fractional scale both engines
          // would then have to agree on
          (col("cents").cast(dec) *
            (col("c").cast(dec) * col("cc") +
              shiftright(col("c") * (col("c") + 1), 1))).as("ix"),
          col("c"), (col("cents").cast(dec) * col("c")).as("vx"))
      contrib.groupBy("segment")
        .agg(sum(col("ix")).as("six"), sum(col("c")).as("n"),
          sum(col("vx")).as("sx"))
        .select(col("segment"), col("n").as("n_customers"),
          (col("sx").cast("double") / 100.0).as("total_spend"),
          round(((lit(2).cast(dec) * col("six") -
            (col("n").cast(dec) + 1) * col("sx")).cast("double")) /
            ((col("n").cast(dec) * col("sx")).cast("double")), 6).as("gini"))
        .select(col("segment"), col("n_customers"),
          round(col("total_spend"), 2).as("total_spend"), col("gini"))
        .orderBy("segment")
    },
    Some("""WITH spend AS (SELECT c_mktsegment AS segment, o_custkey,
           |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  GROUP BY 1, 2),
           |vals AS (SELECT segment, cents, cents // 10000000 AS bkt,
           |    count(*) AS c
           |  FROM spend GROUP BY 1, 2, 3),
           |w AS (SELECT segment, bkt, cents, c,
           |    COALESCE(SUM(c) OVER (PARTITION BY segment, bkt ORDER BY cents
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS wc
           |  FROM vals),
           |bt AS (SELECT segment, bkt, sum(c) AS t FROM vals GROUP BY 1, 2),
           |off AS (SELECT segment, bkt,
           |    COALESCE(SUM(t) OVER (PARTITION BY segment ORDER BY bkt
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
           |  FROM bt),
           |contrib AS (SELECT w.segment, cents, c, wc + o AS cc
           |  FROM w JOIN off ON w.segment = off.segment AND w.bkt = off.bkt),
           |agg AS (SELECT segment,
           |    SUM(CAST(cents AS DECIMAL(38,0)) *
           |        (CAST(c AS DECIMAL(38,0)) * cc +
           |         (c * (c + 1)) // 2)) AS six,
           |    CAST(SUM(c) AS BIGINT) AS n,
           |    SUM(CAST(cents AS DECIMAL(38,0)) * c) AS sx
           |  FROM contrib GROUP BY segment)
           |SELECT segment, n AS n_customers,
           |  round(CAST(sx AS DOUBLE) / 100.0, 2) AS total_spend,
           |  round(CAST(CAST(2 AS DECIMAL(38,0)) * six
           |        - (CAST(n AS DECIMAL(38,0)) + 1) * sx AS DOUBLE) /
           |      CAST(CAST(n AS DECIMAL(38,0)) * sx AS DOUBLE), 6) AS gini
           |FROM agg ORDER BY segment""".stripMargin))

  /** Per-brand demand-curve regression — OLS of per-part total quantity
    * sold on the part's retail price (cents), one slope/intercept per
    * brand: the price-sensitivity readout of classic merchandising
    * analytics (a negative slope ≈ elastic demand; near-zero ≈ price-
    * insensitive assortment). Two two-phase aggregates (part totals, then
    * brand moments) — the regression itself never sees line items.
    *
    * Determinism: x (cents) and y (quantity) are exact longs, all five
    * moments ride DECIMAL(38,0) (x² ~ 10¹⁴ per part, summed over any
    * realistic brand size stays ≪ 10³⁸), slope = num/den is ONE IEEE
    * divide (NULLIF-guarded for a degenerate single-price brand), and the
    * intercept reuses the slope double with expression-order mirrored in
    * the oracle.
    */
  private val ordersPriceElasticity = Q(
    "orders_price_elasticity",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val li = t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
      val mo = p.join(li, col("p_partkey") === col("l_partkey"))
        .select(col("p_brand"), col("cents").cast(dec).as("x"),
          col("qty").cast(dec).as("y"))
        .groupBy("p_brand")
        .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
      val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        when(den =!= 0.0, den)
      mo.select(col("p_brand").as("brand"), col("n").cast("long").as("n_parts"),
          round(slope, 9).as("slope"),
          round((col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n").cast("double"), 6).as("intercept"))
        .orderBy("brand")
    },
    Some("""WITH li AS (SELECT l_partkey,
           |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
           |  FROM lineitem GROUP BY 1),
           |p AS (SELECT p_partkey, p_brand,
           |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents FROM part),
           |mo AS (SELECT p_brand,
           |    CAST(count(*) AS DECIMAL(38,0)) AS n,
           |    SUM(CAST(cents AS DECIMAL(38,0))) AS sx,
           |    SUM(CAST(qty AS DECIMAL(38,0))) AS sy,
           |    SUM(CAST(cents AS DECIMAL(38,0)) * qty) AS sxy,
           |    SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS sxx
           |  FROM p JOIN li ON p_partkey = l_partkey GROUP BY p_brand)
           |SELECT p_brand AS brand, CAST(n AS BIGINT) AS n_parts,
           |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |    NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0), 9) AS slope,
           |  round((CAST(sy AS DOUBLE) -
           |    (CAST(n * sxy - sx * sy AS DOUBLE) /
           |     NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0))
           |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
           |FROM mo ORDER BY brand""".stripMargin))

  /** Inter-purchase interval profile — per-customer days between
    * consecutive orders, rolled up to the repeat-behavior summary
    * (repeat-customer share, mean/median/p90 gap) that calibrates churn
    * windows and cohort retention horizons: "a customer is churned after X
    * days" should come from THIS distribution, not a default.
    *
    * Scale shape: the lag runs in a window PARTITIONED by o_custkey — each
    * customer's short order history sorts locally, nothing global; the
    * rollup is one aggregate over the gap stream plus exact interpolated
    * percentiles on the bounded day-valued domain (the
    * agg_percentile_exact stance). Determinism: gaps are exact integer
    * days; percentile interpolation on integers is dyadic-exact across
    * engines; the mean divides two exact longs.
    */
  private val ordersInterpurchase = Q(
    "orders_interpurchase",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val gaps = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"))
        .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
      val custs = gaps.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      val cs = custs.agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("repeat_customers"))
      val gs = gaps.filter(col("gap").isNotNull)
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap").cast("long")).as("gap_sum"),
          percentile(col("gap"), lit(0.5)).as("p50"),
          percentile(col("gap"), lit(0.9)).as("p90"),
          max(col("gap")).cast("long").as("max_gap"))
      cs.crossJoin(gs)
        .select(col("n_customers"), col("repeat_customers"),
          round(col("repeat_customers").cast("double") /
            col("n_customers").cast("double"), 6).as("repeat_share"),
          col("n_gaps"),
          round(col("gap_sum").cast("double") / col("n_gaps").cast("double"), 6)
            .as("mean_gap_days"),
          // rounded: percentile interpolation at non-dyadic positions is
          // independently-implemented IEEE on each engine (the
          // events_quantile_sketch round-before-compare convention)
          round(col("p50"), 6).as("median_gap_days"),
          round(col("p90"), 6).as("p90_gap_days"),
          col("max_gap").as("max_gap_days"))
    },
    Some("""WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d
           |  FROM orders),
           |g AS (SELECT o_custkey,
           |    d - lag(d, 1) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap
           |  FROM o),
           |custs AS (SELECT o_custkey, count(*) AS n_orders FROM o GROUP BY 1),
           |cs AS (SELECT count(*) AS n_customers,
           |    CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS repeat_customers FROM custs),
           |gs AS (SELECT count(*) AS n_gaps,
           |    CAST(SUM(CAST(gap AS BIGINT)) AS BIGINT) AS gap_sum,
           |    quantile_cont(gap, 0.5) AS p50, quantile_cont(gap, 0.9) AS p90,
           |    CAST(MAX(gap) AS BIGINT) AS max_gap
           |  FROM g WHERE gap IS NOT NULL)
           |SELECT n_customers, repeat_customers,
           |  round(CAST(repeat_customers AS DOUBLE) / n_customers, 6) AS repeat_share,
           |  n_gaps, round(CAST(gap_sum AS DOUBLE) / n_gaps, 6) AS mean_gap_days,
           |  round(p50, 6) AS median_gap_days, round(p90, 6) AS p90_gap_days,
           |  max_gap AS max_gap_days
           |FROM cs CROSS JOIN gs""".stripMargin))

  /** Calendar-month revenue seasonality — the monthly index (revenue vs
    * the mean month) on the ORDER stream: events_seasonal profiles weekday
    * volume on events; demand planning wants the month-of-year revenue
    * curve, money-exact. Index > 1 months are the capacity/inventory
    * peaks; the spread (max/min index) is the one-number seasonality
    * strength.
    *
    * Scale shape: one two-phase aggregate to the ≤ 12-row month frame +
    * a broadcast 1-row mean. Determinism: revenue rides exact decimals
    * ([[dsum]]); month = month(date) (locale-free); the index is one IEEE
    * divide, rounded 6 dp.
    */
  private val ordersMonthlySeasonality = Q(
    "orders_monthly_seasonality",
    (s, dir) => {
      val m = t(s, dir, "orders")
        .groupBy(month(to_date(col("o_orderdate"))).as("month"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      // the 12-row mean still rides the order-independent decimal sum —
      // 12 doubles summed in arbitrary order can differ in the last ulp
      val avg = m.agg((dsumFine(col("revenue")) / count(lit(1))).as("mean_rev"))
      m.crossJoin(broadcast(avg))
        .select(col("month"), col("n_orders"), col("revenue"),
          round(col("revenue") / col("mean_rev"), 6).as("seasonal_index"))
        .orderBy("month")
    },
    Some("""WITH m AS (SELECT month(CAST(o_orderdate AS DATE)) AS month,
           |    count(*) AS n_orders,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |  FROM orders GROUP BY 1),
           |a AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(38,20))) AS DOUBLE)
           |       / count(*) AS mean_rev FROM m)
           |SELECT month, n_orders, revenue,
           |  round(revenue / mean_rev, 6) AS seasonal_index
           |FROM m CROSS JOIN a ORDER BY month""".stripMargin))

  /** Basket-size distribution — lines per order histogramed with revenue
    * per size: the order-shape profile behind picking/packing capacity and
    * the denominator sanity check for every per-order rate the basket
    * family publishes (a drifting basket-size mix silently moves support
    * counts and attach rates before any individual metric alarms).
    *
    * Scale shape: one two-phase count per order (the fact's natural key —
    * no extra shuffle beyond it), then a second tiny aggregate over the
    * bounded size domain. Money rides [[dsum]]; shares are one divide.
    */
  private val ordersBasketSize = Q(
    "orders_basket_size",
    (s, dir) => {
      val per = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("rev"))
      val h = per.groupBy("n_lines")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("rev").cast(
            org.apache.spark.sql.types.DecimalType(38, 20))).cast("double")
            .as("revenue"))
      val tot = h.agg(sum(col("n_orders")).as("t"))
      h.crossJoin(broadcast(tot))
        .select(col("n_lines"), col("n_orders"),
          round(col("revenue"), 2).as("revenue"),
          round(col("n_orders").cast("double") / col("t").cast("double"), 6)
            .as("order_share"))
        .orderBy("n_lines")
    },
    Some("""WITH per AS (SELECT l_orderkey, count(*) AS n_lines,
           |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
           |  FROM lineitem GROUP BY 1),
           |h AS (SELECT n_lines, count(*) AS n_orders,
           |    CAST(SUM(CAST(rev AS DECIMAL(38,20))) AS DOUBLE) AS revenue
           |  FROM per GROUP BY 1),
           |tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS t FROM h)
           |SELECT n_lines, n_orders, round(revenue, 2) AS revenue,
           |  round(CAST(n_orders AS DOUBLE) / t, 6) AS order_share
           |FROM h CROSS JOIN tot ORDER BY n_lines""".stripMargin))

  val queries: Seq[Q] = Seq(
    ordersInterpurchase, ordersMonthlySeasonality, ordersBasketSize,
    ordersPriceElasticity,
    q2MinCostSupplier, q4OrderPriority, q8MarketShare, q11ImportantParts,
    q12LateShipments, q15TopSupplier, q16PartsSuppliers, q17SmallQtyRevenue,
    q19DisjunctivePushdown, q20ExcessShare, q21WaitingSupplier,
    q22SalesOpportunity, q9ProductProfit, eventsBotDetect, ordersCohortLtv,
    ordersGini)


}
